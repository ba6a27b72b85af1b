"""Fused hypernet-head Adam update: dW GEMM + moment update + param update
in ONE kernel pass over the head matrix.

MEASURED NEGATIVE RESULT (round 3, real v5e; kept with tests as engineering
record — NOT dispatched by the Trainer's default path). Step-level
(util_scripts/train_step_ab.py, interleaved in one process): fused step
8.98 ms vs 7.56 plain at B=64 bf16. Kernel-level
(util_scripts/head_adam_micro{,2}.py): 3.89-4.07 ms across tile_n
{256,512,1024}, with/without input_output_aliases, with/without
dimension_semantics=("arbitrary",) — vs 2.55-2.85 ms for the jitted XLA
dW-GEMM + Adam chain on identical dtypes. Root cause: XLA never pays the
traffic this kernel was built to avoid — it fuses the Adam elementwise
chain into the GEMM's consumer (dW is not round-tripped to HBM) and
overlaps the update with the rest of the backward, while a separate
pallas_call moves the same ~624 MB at only ~160 GB/s effective (big fp32
(2048, tile_n) windows double-buffered in and out) and serializes against
the step. tile_n=2048 VMEM-OOMs (129 MB scoped).

Original motivation (kept for context): the flagship head W is
(2048, 19011) — 39M params, 93% of the model — and the hypothesis was that
AD materialises the fp32 dW (write+read 312 MB) and the optax chain re-reads
g/m/v/p (~1.4 GB/step). The step decomposition (head-training cost = full -
frozen_head = 1.57 ms ≈ the fused-XLA traffic floor) shows XLA was already
at the floor. This kernel computes each dW tile on the MXU from the trunk
activations ``h`` (B, 2048) and the head-output cotangent ``dout`` (B, N)
and immediately applies the Adam update to that tile.

Semantics: identical to ``optax.scale_by_adam`` + ``scale_by_learning_rate``
+ ``apply_updates`` (torch.optim.Adam's update, eps outside the sqrt, bias
correction via 1-b^t), with dW computed in the SAME bf16-in/fp32-accumulate
precision as the compute-dtype AD path would use. The head's frozen-epoch
count/bias-correction factors are computed by the caller and passed as
scalars, so one compiled kernel serves every step.

Edge handling: N=19011 is odd, so the last lane tile is partial — Pallas
pads out-of-range reads and clips out-of-range writes, and every value in
the padded region is derived elementwise from padded inputs, so no valid
element is contaminated (verified against the optax oracle in
tests/test_pallas_head_adam.py, including odd widths).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hyperpocket_tpu.ops.pallas_nn import _VMEM_HEADROOM, _vmem_params


def _head_adam_kernel(sc_ref, ht_ref, dout_ref, p_ref, m_ref, v_ref,
                      p_out, m_out, v_out):
    """One (K, TN) tile: dW = h^T @ dout tile -> Adam -> p/m/v tiles.

    ``ht`` is pre-transposed to (K, B) by the caller: contracting over the
    sublane axis of BOTH operands ((B,K)x(B,TN)) makes Mosaic reject the
    matmul ("Bad lhs type"); the plain (K,B)x(B,TN) form lowers cleanly.
    """
    lr = sc_ref[0]
    b1 = sc_ref[1]
    b2 = sc_ref[2]
    eps = sc_ref[3]
    bc1 = sc_ref[4]
    bc2 = sc_ref[5]
    ht = ht_ref[...]  # (K, B) compute dtype
    dout = dout_ref[...].astype(ht.dtype)  # (B, TN)
    # explicit DEFAULT precision: the session-global matmul_precision=highest
    # would request fp32 multi-pass on bf16 inputs, which Mosaic rejects
    # ("Bad lhs type") — same workaround as ops/pallas_encoder.py
    dw = jax.lax.dot_general(
        ht, dout, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )  # (K, TN) fp32 accumulation
    m = b1 * m_ref[...].astype(jnp.float32) + (1.0 - b1) * dw
    v = b2 * v_ref[...].astype(jnp.float32) + (1.0 - b2) * dw * dw
    u = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
    p_out[...] = p_ref[...] - lr * u
    m_out[...] = m.astype(m_out.dtype)
    v_out[...] = v.astype(v_out.dtype)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"),
                   donate_argnums=(2, 3, 4))
def head_adam_update(h: jax.Array, dout: jax.Array, p: jax.Array, m: jax.Array,
                     v: jax.Array, scalars: jax.Array, *, tile_n: int = 512,
                     interpret: bool = False):
    """Apply one fused Adam step to the head weight matrix.

    h       (B, K)  trunk activations (compute dtype, e.g. bf16)
    dout    (B, N)  cotangent of the head output (AD's g_delta)
    p       (K, N)  fp32 master weights        (donated, updated)
    m, v    (K, N)  Adam moments, any float dtype (donated, updated)
    scalars (6,)    fp32 [lr, b1, b2, eps, 1-b1^t, 1-b2^t]

    Returns (p', m', v').
    """
    k, n = p.shape
    assert h.shape[1] == k and dout.shape[1] == n and h.shape[0] == dout.shape[0]
    ht = jnp.transpose(h)  # (K, B): see kernel docstring
    grid = (pl.cdiv(n, tile_n),)
    # Per (K, TN) tile element: p/m/v block windows in AND out (the pipeline
    # double-buffers them even with input_output_aliases) plus the fp32
    # dw/m/v/u temporaries. Mosaic's scoped-stack report measured 32.1 MB at
    # tile_n=512 with bf16 moments; this model requests 58 MB there —
    # deliberately generous (v5e has 128 MB/core; see pallas_nn budget notes).
    md = jnp.dtype(m.dtype).itemsize
    working = k * tile_n * (2 * (8 + 4 * md) + 16) + _VMEM_HEADROOM
    params = _vmem_params(working)
    return pl.pallas_call(
        _head_adam_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars, whole array
            pl.BlockSpec((k, h.shape[0]), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dout.shape[0], tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tile_n), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, n), p.dtype),
            jax.ShapeDtypeStruct((k, n), m.dtype),
            jax.ShapeDtypeStruct((k, n), v.dtype),
        ],
        input_output_aliases={3: 0, 4: 1, 5: 2},
        interpret=interpret,
        **params,
    )(scalars, ht, dout, p, m, v)


def adam_scalars(lr: float, b1: float, b2: float, eps: float, count) -> jax.Array:
    """[lr, b1, b2, eps, 1-b1^t, 1-b2^t] for ``head_adam_update`` (count is
    the POST-increment step number, as in optax.scale_by_adam)."""
    t = jnp.asarray(count, jnp.float32)
    return jnp.stack([
        jnp.asarray(lr, jnp.float32),
        jnp.asarray(b1, jnp.float32),
        jnp.asarray(b2, jnp.float32),
        jnp.asarray(eps, jnp.float32),
        1.0 - jnp.asarray(b1, jnp.float32) ** t,
        1.0 - jnp.asarray(b2, jnp.float32) ** t,
    ])
