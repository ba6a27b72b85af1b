"""Pallas TPU kernel: fused PointNet trunk + max-pool (inference path).

The encoder trunk (models/encoder.py:42-51; reference model/encoder.py:5-53)
is five pointwise Dense layers 3->64->128->256->512->512 followed by a
global max over points. Run layer-by-layer under XLA, every intermediate
activation round-trips HBM: at B=256, N=1024 the (B*N, 512) activations are
~64 MB bf16 per layer — the inference path is memory-bound (~31% MFU
measured). This kernel streams row (point) tiles through ALL five layers in
VMEM — the full weight set is only ~0.9 MB bf16 — and accumulates the
per-cloud max on the fly, so HBM sees just the (B, N, 3) input, the weights
once, and the (B, 512) pooled output.

Numerics match the XLA path layer-for-layer: matmuls accumulate fp32 on the
MXU (preferred_element_type) and each layer's output is cast back to the
compute dtype before the next layer, exactly like a chain of XLA bf16 dots.

Inference-only by design: ``trunk_pooled`` is wired into the model's
``training=False`` path (the headline completion metric); the training
forward keeps the XLA trunk so autodiff sees a plain differentiable graph
(a backward for this kernel would need saved activations or a recompute
pass, which cancels the win at training time).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hyperpocket_tpu.ops.pallas_nn import _VMEM_HEADROOM, _vmem_params

def _trunk_pool_kernel(x_ref, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5,
                       out_ref, pooled, *, n_layers_relu: int = 4):
    """x_ref (1, TILE_R, 3) -> running max into pooled (1, 512) -> out (1, 512)."""
    j = pl.program_id(1)
    nt = pl.num_programs(1)
    x = x_ref[0]  # (TILE_R, 3)
    dtype = x.dtype
    # layer 1 as VPU broadcasts: a K=3 contraction wastes the MXU and this
    # Mosaic's bf16 lhs tiling rejects it outright ("Bad lhs type")
    acc = jnp.zeros((x.shape[0], w1.shape[1]), jnp.float32) + b1[...].astype(jnp.float32)
    for c in range(3):
        acc += x[:, c : c + 1].astype(jnp.float32) * w1[c : c + 1, :].astype(jnp.float32)
    h = jnp.maximum(acc, 0.0).astype(dtype)
    for i, (w, b) in enumerate(((w2, b2), (w3, b3), (w4, b4), (w5, b5))):
        # bf16 MXU pass with fp32 accumulation. precision must be DEFAULT:
        # the session-global matmul_precision=highest would request fp32
        # multi-pass contraction on bf16 operands, which Mosaic rejects
        # ("Bad lhs type"); bf16-out dots are rejected too ("acc to be
        # 32-bit"). Output is rounded to bf16 per layer like the XLA chain.
        h = jax.lax.dot(h, w[...], precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
        h = (h + b[...].astype(jnp.float32))
        if i < n_layers_relu - 1:
            h = jnp.maximum(h, 0.0)
        h = h.astype(dtype)

    tile_max = jnp.max(h.astype(jnp.float32), axis=0, keepdims=True)  # (1, 512)

    @pl.when(j == 0)
    def _():
        pooled[...] = tile_max

    @pl.when(j > 0)
    def _():
        pooled[...] = jnp.maximum(pooled[...], tile_max)

    @pl.when(j == nt - 1)
    def _():
        out_ref[0, 0, :] = pooled[0, :].astype(out_ref.dtype)


def _trunk_pool_kernel_grouped(x_ref, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5,
                               out_ref, *, g: int, n: int):
    """x_ref (G, N, 3): G whole clouds per grid step -> out (G, 1, 512).

    The grouped form runs the five layers over all G*N rows as ONE matmul
    chain (bigger MXU row blocks, 1/G the grid steps) and pools per cloud
    with a single in-register reshape — measured ~6% faster than the
    row-tiled kernel at B=256 N=1024 (1.95 vs 2.06 ms) and needs no
    cross-step running-max scratch.
    """
    x = x_ref[...].reshape(g * n, 3)
    dtype = x.dtype
    acc = jnp.zeros((g * n, w1.shape[1]), jnp.float32) + b1[...].astype(jnp.float32)
    for c in range(3):
        acc += x[:, c : c + 1].astype(jnp.float32) * w1[c : c + 1, :].astype(jnp.float32)
    h = jnp.maximum(acc, 0.0).astype(dtype)
    for i, (w, b) in enumerate(((w2, b2), (w3, b3), (w4, b4), (w5, b5))):
        h = jax.lax.dot(h, w[...], precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
        h = h + b[...].astype(jnp.float32)
        if i < 3:
            h = jnp.maximum(h, 0.0)
        h = h.astype(dtype)
    pooled = jnp.max(h.reshape(g, n, 512).astype(jnp.float32), axis=1)
    out_ref[...] = pooled[:, None, :].astype(out_ref.dtype)


def _trunk_pool_argmax_kernel_grouped(x_ref, w1, b1, w2, b2, w3, b3, w4, b4,
                                      w5, b5, out_ref, idx_ref, *, g: int, n: int):
    """Grouped trunk kernel that also emits the pool's FIRST argmax.

    Same five-layer chain as ``_trunk_pool_kernel_grouped``; per cloud the
    kernel reduces max AND min-index-where-equal (first occurrence, matching
    torch's max backward routing — models/encoder.py tie note). The training
    path's sparse backward consumes the indices; the fused forward keeps the
    (G*N, C) activations out of HBM entirely.
    """
    x = x_ref[...].reshape(g * n, 3)
    dtype = x.dtype
    acc = jnp.zeros((g * n, w1.shape[1]), jnp.float32) + b1[...].astype(jnp.float32)
    for c in range(3):
        acc += x[:, c : c + 1].astype(jnp.float32) * w1[c : c + 1, :].astype(jnp.float32)
    h = jnp.maximum(acc, 0.0).astype(dtype)
    for i, (w, b) in enumerate(((w2, b2), (w3, b3), (w4, b4), (w5, b5))):
        h = jax.lax.dot(h, w[...], precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
        h = h + b[...].astype(jnp.float32)
        if i < 3:
            h = jnp.maximum(h, 0.0)
        h = h.astype(dtype)
    hf = h.astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 512), 0)
    for ci in range(g):
        hc = hf[ci * n : (ci + 1) * n, :]  # (n, 512), static slice
        m = jnp.max(hc, axis=0, keepdims=True)  # (1, 512)
        idx = jnp.min(jnp.where(hc == m, rows, n), axis=0, keepdims=True)
        out_ref[ci, 0, :] = m[0].astype(out_ref.dtype)
        idx_ref[ci, 0, :] = idx[0]


def _trunk_pool_argmax_kernel(x_ref, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5,
                              out_ref, idx_ref, pooled, amax_s, *, tile_r: int):
    """Row-tiled trunk kernel with running max AND running first-argmax.

    Cross-tile merge keeps the EARLIER tile's index on exact ties (strict >
    update), so the global index is the first argmax — same routing as the
    grouped kernel and torch.
    """
    j = pl.program_id(1)
    nt = pl.num_programs(1)
    x = x_ref[0]  # (TILE_R, 3)
    dtype = x.dtype
    acc = jnp.zeros((x.shape[0], w1.shape[1]), jnp.float32) + b1[...].astype(jnp.float32)
    for c in range(3):
        acc += x[:, c : c + 1].astype(jnp.float32) * w1[c : c + 1, :].astype(jnp.float32)
    h = jnp.maximum(acc, 0.0).astype(dtype)
    for i, (w, b) in enumerate(((w2, b2), (w3, b3), (w4, b4), (w5, b5))):
        h = jax.lax.dot(h, w[...], precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
        h = (h + b[...].astype(jnp.float32))
        if i < 3:
            h = jnp.maximum(h, 0.0)
        h = h.astype(dtype)

    hf = h.astype(jnp.float32)
    tile_max = jnp.max(hf, axis=0, keepdims=True)  # (1, 512)
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_r, 512), 0) + j * tile_r
    tile_idx = jnp.min(jnp.where(hf == tile_max, rows, nt * tile_r),
                       axis=0, keepdims=True)  # (1, 512)

    @pl.when(j == 0)
    def _():
        pooled[...] = tile_max
        amax_s[...] = tile_idx

    @pl.when(j > 0)
    def _():
        take = tile_max > pooled[...]
        amax_s[...] = jnp.where(take, tile_idx, amax_s[...])
        pooled[...] = jnp.maximum(pooled[...], tile_max)

    @pl.when(j == nt - 1)
    def _():
        out_ref[0, 0, :] = pooled[0, :].astype(out_ref.dtype)
        idx_ref[0, 0, :] = amax_s[0, :]


# largest whole-cloud row block the grouped kernel holds in VMEM: the fp32
# accumulator at width 512 is 2 KB/row, so 4096 rows ~ 8 MB + bf16 copies
# and weights stays inside the ~16 MB scoped limit (g4 at N=1024 measured
# fine; tighter shapes fall back to the row-tiled kernel).
_GROUP_ROW_BUDGET = 4096


def _pick_group(b: int, n: int) -> int:
    g = max(1, min(_GROUP_ROW_BUDGET // n, b))
    while g > 1 and b % g:
        g -= 1
    return g


@functools.partial(jax.jit, static_argnames=("tile_r", "interpret"))
def trunk_pooled(conv_params: list, x: jax.Array, *, tile_r: int | None = None,
                 interpret: bool = False) -> jax.Array:
    """Fused trunk + max-pool: x (B, N, 3) -> pooled features (B, 512).

    ``conv_params``: the encoder's five conv layer dicts ({"w", "b"}).
    Equivalent to ``max over points of the 5-layer pointwise stack`` —
    models/encoder.py:42-50 up to (excluding) the fc layer.

    Dispatch: with ``tile_r=None`` (the default), whole clouds whose rows
    fit the VMEM budget run through the grouped kernel (G clouds per grid
    step, no running-max scratch) and anything larger streams 512-row
    tiles. Passing an explicit ``tile_r`` always selects the row-tiled
    kernel with that tile — the tuning knob stays live.
    """
    b, n, _ = x.shape
    if n % 8:
        raise ValueError(f"N={n} must be a multiple of 8 for the fused trunk kernel")
    dtype = x.dtype
    flat = []
    for layer in conv_params:
        flat.append(layer["w"].astype(dtype))
        flat.append(layer["b"].astype(dtype))
    flat2d = [a if a.ndim == 2 else a[None, :] for a in flat]

    g = _pick_group(b, n)
    if tile_r is None and g * n <= _GROUP_ROW_BUDGET:
        rep = lambda i: (0, 0)
        w_specs = []
        for arr in flat:
            blk = arr.shape if arr.ndim == 2 else (1, arr.shape[0])
            w_specs.append(pl.BlockSpec(blk, rep, memory_space=pltpu.VMEM))
        kernel = functools.partial(_trunk_pool_kernel_grouped, g=g, n=n)
        # worst-case live set per grid step: the (g*n)-row activations of
        # every layer width (Mosaic keeps the unrolled chain's intermediates
        # on the scoped stack — measured 16.9 MB at g*n=4096, just past the
        # 16 MB default, with exact operand layouts shifting it ~1 MB), plus
        # input rows and weights. Estimated at fp32 width-sum for margin.
        working_set = g * n * (3 + 64 + 128 + 256 + 512 + 512) * 4 + _VMEM_HEADROOM
        out = pl.pallas_call(
            kernel,
            grid=(b // g,),
            in_specs=[
                pl.BlockSpec((g, n, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                *w_specs,
            ],
            out_specs=pl.BlockSpec((g, 1, 512), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 1, 512), dtype),
            interpret=interpret,
            **_vmem_params(working_set),
        )(x, *flat2d)
        return out[:, 0, :]

    tile_r = min(tile_r or 512, n)
    while n % tile_r:
        tile_r //= 2
    if tile_r < 8:
        raise ValueError(f"N={n} must be a multiple of 8 for the fused trunk kernel")

    kernel = _trunk_pool_kernel
    rep = lambda i, j: (0, 0)  # weights replicated across the grid
    w_specs = []
    for arr in flat:
        blk = arr.shape if arr.ndim == 2 else (1, arr.shape[0])
        w_specs.append(pl.BlockSpec(blk, rep, memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        kernel,
        grid=(b, n // tile_r),
        in_specs=[
            pl.BlockSpec((1, tile_r, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((1, 1, 512), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, 512), dtype),
        scratch_shapes=[pltpu.VMEM((1, 512), jnp.float32)],
        interpret=interpret,
    )(x, *flat2d)
    return out[:, 0, :]


@functools.partial(jax.jit, static_argnames=("tile_r", "interpret"))
def trunk_pooled_argmax(conv_params: list, x: jax.Array, *, tile_r: int | None = None,
                        interpret: bool = False) -> tuple[jax.Array, jax.Array]:
    """Fused trunk + max-pool + FIRST-argmax: x (B, N, 3) -> ((B, 512), (B, 512) i32).

    The training-forward variant of ``trunk_pooled``: the sparse-backward VJP
    (models/encoder.py::_conv_pooled_sparse) needs the pool's argmax to route
    cotangents, and with it the fused forward keeps every (B, N, C)
    activation out of HBM — the flash-style fwd half of the trunk pair.
    Index ties resolve to the first (lowest) point index, like torch.
    """
    b, n, _ = x.shape
    if n % 8:
        raise ValueError(f"N={n} must be a multiple of 8 for the fused trunk kernel")
    dtype = x.dtype
    flat = []
    for layer in conv_params:
        flat.append(layer["w"].astype(dtype))
        flat.append(layer["b"].astype(dtype))
    flat2d = [a if a.ndim == 2 else a[None, :] for a in flat]

    g = _pick_group(b, n)
    if tile_r is None and g * n <= _GROUP_ROW_BUDGET:
        rep = lambda i: (0, 0)
        w_specs = []
        for arr in flat:
            blk = arr.shape if arr.ndim == 2 else (1, arr.shape[0])
            w_specs.append(pl.BlockSpec(blk, rep, memory_space=pltpu.VMEM))
        kernel = functools.partial(_trunk_pool_argmax_kernel_grouped, g=g, n=n)
        # grouped-kernel live set plus the fp32 copy, the iota and the
        # where-select planes of the argmax reduce (3 extra 512-wide fp32/i32
        # planes over the g*n rows).
        working_set = (g * n * (3 + 64 + 128 + 256 + 512 + 512) * 4
                       + 3 * g * n * 512 * 4 + _VMEM_HEADROOM)
        out, idx = pl.pallas_call(
            kernel,
            grid=(b // g,),
            in_specs=[
                pl.BlockSpec((g, n, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                *w_specs,
            ],
            out_specs=[
                pl.BlockSpec((g, 1, 512), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((g, 1, 512), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b, 1, 512), dtype),
                jax.ShapeDtypeStruct((b, 1, 512), jnp.int32),
            ],
            interpret=interpret,
            **_vmem_params(working_set),
        )(x, *flat2d)
        return out[:, 0, :], idx[:, 0, :]

    tile_r = min(tile_r or 512, n)
    while n % tile_r:
        tile_r //= 2
    if tile_r < 8:
        raise ValueError(f"N={n} must be a multiple of 8 for the fused trunk kernel")

    kernel = functools.partial(_trunk_pool_argmax_kernel, tile_r=tile_r)
    rep = lambda i, j: (0, 0)
    w_specs = []
    for arr in flat:
        blk = arr.shape if arr.ndim == 2 else (1, arr.shape[0])
        w_specs.append(pl.BlockSpec(blk, rep, memory_space=pltpu.VMEM))

    out, idx = pl.pallas_call(
        kernel,
        grid=(b, n // tile_r),
        in_specs=[
            pl.BlockSpec((1, tile_r, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 512), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 512), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, 512), dtype),
            jax.ShapeDtypeStruct((b, 1, 512), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((1, 512), jnp.float32),
                        pltpu.VMEM((1, 512), jnp.int32)],
        interpret=interpret,
    )(x, *flat2d)
    return out[:, 0, :], idx[:, 0, :]


def trunk_pooled_matches_shapes(n: int) -> bool:
    return n % 8 == 0
