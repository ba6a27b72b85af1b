"""Micro A/B: fused pallas head-Adam kernel vs the pure-XLA equivalent.

Isolates WHERE the fused-train-step regression (util_scripts/train_step_ab.py:
fused_head 8.98 ms vs full 7.56 ms at B=64) comes from: the kernel itself or
the surrounding step graph. Times, interleaved in one process (CLAUDE.md):

  kernel      — head_adam_update (pallas, donated ping-pong buffers)
  xla_update  — jitted dW GEMM + Adam moment/param update, same dtypes,
                donated; what optax+AD effectively runs for this leaf
  kernel_t<k> — tile_n sweep

Usage: PYTHONPATH=/root/.axon_site:/root/repo python util_scripts/head_adam_micro.py
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from hyperpocket_tpu.ops.pallas_head_adam import adam_scalars, head_adam_update  # noqa: E402
from hyperpocket_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

K, N, B = 2048, 19011, 64
WINDOWS, ITERS = 4, 30


@partial(jax.jit, donate_argnums=(2, 3, 4))
def xla_update(h, dout, p, m, v, sc):
    lr, b1, b2, eps, bc1, bc2 = (sc[i] for i in range(6))
    dw = jax.lax.dot_general(
        h.astype(jnp.bfloat16).T, dout.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )
    m2 = b1 * m.astype(jnp.float32) + (1.0 - b1) * dw
    v2 = b2 * v.astype(jnp.float32) + (1.0 - b2) * dw * dw
    u = (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
    return p - lr * u, m2.astype(m.dtype), v2.astype(v.dtype)


def timed(dispatch) -> float:
    times = []
    for _ in range(WINDOWS):
        out = dispatch()
        np.asarray(jax.device_get(out))
        t0 = time.monotonic()
        for _ in range(ITERS):
            out = dispatch()
        np.asarray(jax.device_get(out))
        times.append((time.monotonic() - t0) / ITERS)
    return float(np.median(times))


def main():
    enable_compile_cache()
    jax.config.update("jax_default_matmul_precision", "highest")
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((B, K)), jnp.bfloat16)
    dout = jnp.asarray(rng.standard_normal((B, N)) * 0.1, jnp.bfloat16)
    sc = adam_scalars(1e-4, 0.9, 0.999, 1e-8, 10)

    def fresh():
        return (
            jnp.asarray(rng.standard_normal((K, N)), jnp.float32),
            jnp.zeros((K, N), jnp.bfloat16),
            jnp.zeros((K, N), jnp.bfloat16),
        )

    variants = {}

    st_x = {"b": fresh()}

    def run_xla():
        p, m, v = xla_update(h, dout, *st_x["b"], sc)
        st_x["b"] = (p, m, v)
        return p[0, :8]

    variants["xla_update"] = run_xla

    for tn in (256, 512, 1024):
        st = {"b": fresh()}

        def run_kernel(st=st, tn=tn):
            p, m, v = head_adam_update(h, dout, *st["b"], sc, tile_n=tn)
            st["b"] = (p, m, v)
            return p[0, :8]

        variants[f"kernel_t{tn}"] = run_kernel

    for name in list(variants):
        try:
            np.asarray(jax.device_get(variants[name]()))
            print(f"warm {name}", flush=True)
        except Exception as e:  # noqa: BLE001 — tile variants may VMEM-OOM
            print(f"warm {name} FAILED: {str(e)[:200]}", flush=True)
            del variants[name]

    results = {name: timed(d) for name, d in variants.items()}
    print("\n=== head-Adam update micro (K=2048, N=19011, B=64, ms) ===")
    for name, dt in results.items():
        print(f"{name:12s} {dt * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
