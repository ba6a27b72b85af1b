"""Micro A/B round 2: WHY is the fused head-Adam kernel slow?

head_adam_micro.py measured kernel 3.9-4.1 ms vs 2.85 ms for the jitted XLA
GEMM+Adam chain (K=2048, N=19011, B=64) — the kernel itself is the step-level
regression. Hypotheses tested here, interleaved in one process:

  kernel        — as landed (aliased p/m/v, donated)
  kernel_noali  — same kernel without input_output_aliases (does the in-place
                  HBM aliasing serialize the grid pipeline's DMA overlap?)
  kernel_arb    — aliased + dimension_semantics=("arbitrary",)
  xla_update    — the XLA baseline again

Usage: PYTHONPATH=/root/.axon_site:/root/repo python util_scripts/head_adam_micro2.py
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hyperpocket_tpu.ops.pallas_head_adam import (  # noqa: E402
    _head_adam_kernel,
    adam_scalars,
    head_adam_update,
)
from hyperpocket_tpu.ops.pallas_nn import _VMEM_HEADROOM, _vmem_params  # noqa: E402
from hyperpocket_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

K, N, B = 2048, 19011, 64
WINDOWS, ITERS = 4, 30
TN = 1024


def make_variant(alias: bool, arbitrary: bool):
    @partial(jax.jit, donate_argnums=(2, 3, 4) if alias else ())
    def upd(h, dout, p, m, v, sc):
        ht = jnp.transpose(h)
        grid = (pl.cdiv(N, TN),)
        md = jnp.dtype(m.dtype).itemsize
        working = K * TN * (2 * (8 + 4 * md) + 16) + _VMEM_HEADROOM
        params = _vmem_params(working)
        if arbitrary:
            cp = params.get("compiler_params")
            kw = {"vmem_limit_bytes": cp.vmem_limit_bytes} if cp else {}
            params = {"compiler_params": pltpu.CompilerParams(
                dimension_semantics=("arbitrary",), **kw)}
        return pl.pallas_call(
            _head_adam_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((K, B), lambda j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((B, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((K, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((K, N), p.dtype),
                jax.ShapeDtypeStruct((K, N), m.dtype),
                jax.ShapeDtypeStruct((K, N), v.dtype),
            ],
            **({"input_output_aliases": {3: 0, 4: 1, 5: 2}} if alias else {}),
            **params,
        )(sc, ht, dout, p, m, v)

    return upd


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

    for name, (alias, arb) in {
        "kernel_alias": (True, False),
        "kernel_noali": (False, False),
        "kernel_arb": (True, True),
    }.items():
        upd = make_variant(alias, arb)
        st = {"b": fresh()}

        def run(st=st, upd=upd):
            p, m, v = upd(h, dout, *st["b"], sc)
            st["b"] = (p, m, v)
            return p[0, :8]

        variants[name] = run

    for name in list(variants):
        try:
            np.asarray(jax.device_get(variants[name]()))
            print(f"warm {name}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"warm {name} FAILED: {str(e)[:200]}", flush=True)
            del variants[name]

    results = {name: timed(d) for name, d in variants.items()}
    print(f"\n=== head-Adam WHY micro (K={K}, N={N}, B={B}, TN={TN}, ms) ===")
    for name, dt in results.items():
        print(f"{name:14s} {dt * 1e3:7.3f} ms")


if __name__ == "__main__":
    main()
