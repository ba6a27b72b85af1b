"""Interleaved A/B: grouped trunk kernel row budget at inference shapes.

_GROUP_ROW_BUDGET=4096 was chosen under the default 16 MB scoped-VMEM limit;
the kernel now requests a raised vmem_limit_bytes (v5e compiled 120 MB
scratch in the round-3 probe), so bigger whole-cloud groups — larger MXU row
blocks, fewer grid steps — are worth sweeping. Times trunk_pooled at
B=256 N=1024 bf16 (the headline inference shape) across budgets, one
process, interleaved windows, forced device fetches.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python util_scripts/trunk_group_sweep.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from hyperpocket_tpu.models.encoder import init_encoder  # noqa: E402
from hyperpocket_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402
import hyperpocket_tpu.ops.pallas_encoder as pe  # noqa: E402

B, N = 256, 1024
WARMUP = 3
ITERS = 200
WINDOWS = 4
BUDGETS = (4096, 8192, 16384)


def timed(dispatch) -> float:
    times = []
    for _ in range(WINDOWS):
        out = dispatch()
        np.asarray(jax.device_get(jnp.sum(out.astype(jnp.float32))))
        t0 = time.monotonic()
        for _ in range(ITERS):
            out = dispatch()
        np.asarray(jax.device_get(jnp.sum(out.astype(jnp.float32))))
        times.append((time.monotonic() - t0) / ITERS)
    return float(np.median(times))


def main():
    enable_compile_cache()
    params = init_encoder(jax.random.key(0), 128)
    conv = [{k: v.astype(jnp.bfloat16) for k, v in layer.items()}
            for layer in params["conv"]]
    x = (jax.random.normal(jax.random.key(1), (B, N, 3), jnp.float32) * 0.3
         ).astype(jnp.bfloat16)

    fns = {}
    for budget in BUDGETS:
        pe._GROUP_ROW_BUDGET = budget
        g = pe._pick_group(B, N)
        # distinct jit wrapper per budget so each traces its own group size
        fn = jax.jit(lambda c, xx, _b=budget: _with_budget(_b, c, xx))
        out = fn(conv, x)
        np.asarray(jax.device_get(jnp.sum(out.astype(jnp.float32))))
        print(f"budget {budget} -> group {g} warm", flush=True)
        fns[budget] = fn
    pe._GROUP_ROW_BUDGET = 4096

    results = {b: timed(lambda fn=fn: fn(conv, x)) for b, fn in fns.items()}
    base = results[4096]
    print(f"\n=== grouped trunk sweep (B={B} N={N} bf16, ms/call) ===")
    for b, dt in results.items():
        print(f"rows {b:6d}  {dt * 1e3:7.3f} ms  ({dt / base * 100:5.1f}% of 4096)")


def _with_budget(budget, conv, x):
    # call the UNJITTED body: the public trunk_pooled is jitted and its cache
    # key ignores the module global, so a second budget would silently reuse
    # the first budget's trace. Each outer jit here traces its own group.
    old = pe._GROUP_ROW_BUDGET
    pe._GROUP_ROW_BUDGET = budget
    try:
        return pe.trunk_pooled.__wrapped__(conv, x, tile_r=None, interpret=False)
    finally:
        pe._GROUP_ROW_BUDGET = old


if __name__ == "__main__":
    main()
