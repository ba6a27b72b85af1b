"""Interleaved A/B: bf16 serving with per-call param cast vs pre-cast params.

``FullModel.apply`` casts the fp32 master tree to compute_dtype at use —
every inference dispatch re-reads the full fp32 params (the (2048, 19011)
head alone is 156 MB) and materialises bf16 copies.
``FullModel.serving_params`` casts once; the at-use cast is then a no-op.
This measures what that param traffic actually costs per batch.

Also times the mom_bf16 train step (optimizer.moment_dtype="bfloat16")
against the fp32-moment step — the step decomposition measured ~0.57 ms.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python util_scripts/serving_params_ab.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from __graft_entry__ import FLAGSHIP_CONFIG  # noqa: E402
from hyperpocket_tpu.models import FullModel  # noqa: E402
from hyperpocket_tpu.train.optim import make_optimizer  # noqa: E402
from hyperpocket_tpu.train.trainer import make_train_step  # noqa: E402
from hyperpocket_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

B, B_TRAIN = 256, 64
WINDOWS, ITERS, TRAIN_ITERS = 4, 60, 30


def timed(dispatch, iters) -> float:
    times = []
    for _ in range(WINDOWS):
        out = dispatch(0)
        np.asarray(jax.device_get(jnp.sum(out) if out.ndim else out))
        t0 = time.monotonic()
        for i in range(iters):
            out = dispatch(i)
        np.asarray(jax.device_get(jnp.sum(out) if out.ndim else out))
        times.append((time.monotonic() - t0) / iters)
    return float(np.median(times))


def main():
    enable_compile_cache()
    jax.config.update("jax_default_matmul_precision", "highest")
    model16 = FullModel.from_config({**FLAGSHIP_CONFIG, "compute_dtype": "bfloat16"})
    params = model16.init(jax.random.key(0))
    sp = model16.serving_params(params)

    @jax.jit
    def complete(p, existing, noise, key, epoch):
        return model16.apply(p, existing, None, key, epoch,
                             num_output_points=2048, training=False, noise=noise)

    rng = np.random.default_rng(0)
    existing = jnp.asarray(rng.standard_normal((B, 1024, 3)), jnp.float32) * 0.3
    noise = jnp.asarray(rng.standard_normal((B, model16.get_noise_size())), jnp.float32) * 0.1
    epoch = jnp.asarray(100.0)

    variants = {
        "cast_per_call": lambda i: complete(params, existing, noise,
                                            jax.random.key(100 + i, impl="rbg"), epoch),
        "precast": lambda i: complete(sp, existing, noise,
                                      jax.random.key(100 + i, impl="rbg"), epoch),
    }

    # train-step mom_bf16 A/B
    t_ex = jnp.asarray(rng.standard_normal((B_TRAIN, 1024, 3)), jnp.float32)
    t_mi = jnp.asarray(rng.standard_normal((B_TRAIN, 1024, 3)), jnp.float32)
    t_gt = jnp.asarray(rng.standard_normal((B_TRAIN, 2048, 3)), jnp.float32)

    def train_variant(moment_dtype):
        tx = make_optimizer({"type": "Adam", "hyperparams": {"lr": 1e-4}},
                            moment_dtype=moment_dtype)
        step = make_train_step(model16, tx, 0.05, "rbg")
        st = {"p": jax.tree_util.tree_map(jnp.copy, params), "s": tx.init(params)}

        def d(i):
            st["p"], st["s"], loss, *_ = step(st["p"], st["s"], t_ex, t_mi, t_gt,
                                              np.uint32(i), epoch, num_points=2048)
            return loss

        return d

    variants["train_mom32"] = train_variant(None)
    variants["train_mom16"] = train_variant("bfloat16")

    for name in list(variants):
        np.asarray(jax.device_get(jnp.sum(variants[name](0))))
        print(f"warm {name}", flush=True)

    results = {}
    for name, d in variants.items():
        iters = ITERS if name.startswith(("cast", "precast")) else TRAIN_ITERS
        results[name] = timed(d, iters)
    print(f"\n=== serving/moments A/B (B={B} infer, B={B_TRAIN} train, ms) ===")
    for name, dt in results.items():
        print(f"{name:14s} {dt * 1e3:8.3f} ms")
    sp_gain = results["cast_per_call"] / results["precast"]
    print(f"precast speedup {sp_gain:.3f}x | "
          f"infer clouds/s {B / results['precast']:.0f} vs {B / results['cast_per_call']:.0f}")
    print(f"mom16 step delta {1e3 * (results['train_mom32'] - results['train_mom16']):.3f} ms")


if __name__ == "__main__":
    main()
