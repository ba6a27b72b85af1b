"""Probe: does XLA's s8xs8->s32 dot hit the v5e int8 MXU rate (~2x bf16)?

Decides whether an int8 quantized serving mode is worth building. Interleaves
bf16 and int8 GEMMs of the model's dominant inference shapes IN ONE PROCESS
(cross-process chip timings swing 2-4x — CLAUDE.md), ending every timing
window with a forced host fetch of a checksum (block_until_ready returns
early over the axon tunnel).

Shapes probed:
  trunk-big   (262144, 512) x (512, 512)   — encoder conv4/5 at B=256 N=1024
  trunk-mid   (262144, 256) x (256, 512)   — encoder conv 256->512
  heads       (256, 2048)  x (2048, 19011) — fused hypernet heads at B=256

Run:  PYTHONPATH=/root/.axon_site:/root/repo python util_scripts/int8_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from hyperpocket_tpu.utils.chip_lock import chip_lock


def timed(fn, args, iters, windows=3):
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.device_get(jnp.sum(out[..., -1].astype(jnp.float32))))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def probe_shape(name, m, k, n, iters):
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (m, k), jnp.float32)
    w = jax.random.normal(kw, (k, n), jnp.float32)
    x16, w16 = x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
    x8 = jnp.clip(jnp.round(x * 30), -127, 127).astype(jnp.int8)
    w8 = jnp.clip(jnp.round(w * 30), -127, 127).astype(jnp.int8)

    f16 = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ()))))
    f8 = jax.jit(lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
    # int8 GEMM + fp32 rescale epilogue (the real serving op)
    scale = jnp.float32(1.0 / (30.0 * 30.0))
    f8r = jax.jit(lambda a, b: (jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32) * scale
    ).astype(jnp.bfloat16))

    for f, args in ((f16, (x16, w16)), (f8, (x8, w8)), (f8r, (x8, w8))):
        f(*args)  # compile
    flops = 2.0 * m * k * n
    r = {}
    # interleave variants across windows
    for label, f, args in (("bf16", f16, (x16, w16)),
                           ("int8", f8, (x8, w8)),
                           ("int8+rescale", f8r, (x8, w8))):
        dt = timed(f, args, iters)
        r[label] = dt
        print(f"{name:10s} {label:13s} {dt * 1e3:8.3f} ms  "
              f"{flops / dt / 1e12:7.1f} TFLOP/s", flush=True)
    print(f"{name:10s} int8 speedup vs bf16: {r['bf16'] / r['int8+rescale']:.2f}x",
          flush=True)


def main():
    with chip_lock():
        print(f"backend={jax.default_backend()} devices={jax.device_count()}",
              flush=True)
        probe_shape("trunk-big", 262144, 512, 512, iters=30)
        probe_shape("trunk-mid", 262144, 256, 512, iters=30)
        probe_shape("heads", 256, 2048, 19011, iters=30)


if __name__ == "__main__":
    main()
