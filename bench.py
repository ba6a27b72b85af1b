"""Headline benchmark: completed 2048-point clouds per second.

Measures the flagship inference path — PointNet encoders on a 1024-pt
existing cloud + noise, hypernetwork, batched target-network decode to 2048
points — jitted end-to-end on the default backend (the real TPU chip under
the driver). Prints ONE JSON line.

Baseline: the driver's north star is >=10,000 completed clouds/sec on a
v5e-8 (BASELINE.md); per chip that is 1,250 clouds/sec, which is what
``vs_baseline`` is normalised against when a single device is visible.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def run_bench(batch: int = 256, iters: int = 30, warmup: int = 5) -> dict:
    from __graft_entry__ import FLAGSHIP_CONFIG
    from hyperpocket_tpu.models import FullModel

    # measure at the training-quality numerics (fp32 accumulation)
    jax.config.update("jax_default_matmul_precision", "highest")

    model = FullModel.from_config(FLAGSHIP_CONFIG)
    params = model.init(jax.random.key(0))

    n_devices = len(jax.devices())

    @jax.jit
    def complete(params, existing, noise, key, epoch):
        return model.apply(
            params, existing, None, key, epoch,
            num_output_points=2048, training=False, noise=noise,
        )

    existing = jax.random.normal(jax.random.key(1), (batch, 1024, 3), jnp.float32) * 0.3
    noise = jax.random.normal(jax.random.key(2), (batch, model.get_noise_size()), jnp.float32) * 0.1
    epoch = jnp.asarray(100.0)

    for i in range(warmup):
        out = complete(params, existing, noise, jax.random.key(i), epoch)
    jax.block_until_ready(out)

    # best of 3 windows: the device link can have latency episodes, and the
    # metric is steady-state per-chip capability
    best_dt = float("inf")
    for window in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            out = complete(params, existing, noise, jax.random.key(100 + i), epoch)
        jax.block_until_ready(out)
        best_dt = min(best_dt, time.perf_counter() - t0)

    clouds_per_sec = batch * iters / best_dt
    baseline_per_chip = 10_000.0 / 8.0
    baseline = baseline_per_chip * n_devices
    return {
        "metric": "completion_throughput",
        "value": round(clouds_per_sec, 1),
        "unit": "clouds/sec",
        "vs_baseline": round(clouds_per_sec / baseline, 3),
    }


if __name__ == "__main__":
    print(json.dumps(run_bench()))
