"""Pallas kernel: fused per-sample target-network decode. NEGATIVE RESULT.

STATUS: correct (tests/test_pallas_decoder.py) but NOT the production path —
the vmap'd XLA chain (models/target_network.py) stays the default in both
training and inference. Kept as a documented negative result so the next
round does not re-derive it.

The hypothesis: the decode (reference model/target_network.py:31-45 driven
by the per-sample loop at model/full_model.py:70-74) is a chain of tiny
matmuls with per-sample weights — channels 3 -> [32, 64, 128, 64] -> 3 at
the flagship config — whose (B, N, C) intermediates round-trip HBM under
XLA (~300 MB/step at B=256, N=2048 bf16), so a kernel holding the whole
chain in VMEM should win.

Measured on v5e (B=256, N=2048, bf16): XLA 0.66-0.76 ms; this kernel
1.05-1.54 ms across tile_p {512, 1024, 2048} x group {1, 4} (group=8
VMEM-OOMs: the unrolled per-sample bodies keep every iteration's fp32
activations live). Per-MXU-pass accounting says why: both run the same
~64-80 (128x128xK<=128) passes per sample, but XLA's batched GEMM streams
samples through the MXU back-to-back while the kernel's per-sample chains
are dependency-serialised — the kernel sustains ~33% of peak pass rate vs
XLA's ~66%, and the decode is pass-bound, not HBM-bound, at these shapes.
Lessons encoded here:

* input layer (3 -> C1) as VPU broadcasts (an MXU pass would pad K=3 to 128)
  — this part IS faster and is reused by ops/pallas_encoder.py;
* output layer (Ck -> 3) as three VPU lane-reductions LOST to a padded MXU
  dot (1.44 -> 1.17 ms total): cross-lane reduces are serial shuffle chains;
* weight slicing from the hypernet's flat vector must happen on the XLA
  side — Mosaic cannot reshape a lane vector into a matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def split_flat_weights(flat_weights: jax.Array, layer_out_channels: list[int],
                       use_bias: bool):
    """(B, W) flat vectors -> per-layer ((B, in, out) weights, (B, 1, out) biases).

    Slicing order matches target_network_forward (reference
    target_network.py:40-45): row-major (out, in) weight block, then bias.
    Returned weights are pre-transposed to (in, out) so the kernel's dots are
    plain row-major matmuls.
    """
    ch = [3] + list(layer_out_channels) + [3]
    ws, bs = [], []
    offset = 0
    b = flat_weights.shape[0]
    for i in range(1, len(ch)):
        in_ch, out_ch = ch[i - 1], ch[i]
        w = flat_weights[:, offset : offset + out_ch * in_ch]
        offset += out_ch * in_ch
        ws.append(jnp.transpose(w.reshape(b, out_ch, in_ch), (0, 2, 1)))
        if use_bias:
            bs.append(flat_weights[:, offset : offset + out_ch].reshape(b, 1, out_ch))
            offset += out_ch
        else:
            bs.append(jnp.zeros((b, 1, out_ch), flat_weights.dtype))
    if offset != flat_weights.shape[1]:
        raise ValueError(
            f"flat weight vector not fully consumed: used {offset} of {flat_weights.shape[1]}"
        )
    return ws, bs


def _decode_kernel(pts_ref, *refs, n_layers: int, group: int):
    """pts (G, TILE_P, 3) + per-layer w (G, in, out) / b (G, 1, out) -> out (G, TILE_P, 3).

    ``group`` samples are decoded per grid step: one sample per step leaves
    the kernel DMA-latency-bound (256 steps x 11 tiny buffers measured SLOWER
    than the XLA chain, 1.17 vs 0.66 ms at B=256); grouping amortises the
    per-step transfers while each sample's chain still runs whole in VMEM.
    """
    out_ref = refs[-1]
    w_refs = refs[0:n_layers]
    b_refs = refs[n_layers : 2 * n_layers]
    for g in range(group):
        x = pts_ref[g]  # (TILE_P, 3)
        dtype = x.dtype

        # input layer on the VPU: K=3 would waste an MXU pass
        w0 = w_refs[0][g]  # (3, C1)
        acc = jnp.zeros((x.shape[0], w0.shape[1]), jnp.float32) + b_refs[0][g].astype(jnp.float32)
        for c in range(3):
            acc += x[:, c : c + 1].astype(jnp.float32) * w0[c : c + 1, :].astype(jnp.float32)
        if n_layers > 1:
            acc = jnp.maximum(acc, 0.0)
        h = acc.astype(dtype)

        # hidden layers on the MXU (fp32 accumulation, per-layer rounding like XLA)
        for li in range(1, n_layers - 1):
            h = jax.lax.dot(h, w_refs[li][g], precision=jax.lax.Precision.DEFAULT,
                            preferred_element_type=jnp.float32)
            h = jnp.maximum(h + b_refs[li][g].astype(jnp.float32), 0.0).astype(dtype)

        # output layer (Ck -> 3): an MXU dot with padded output lanes still
        # beats three VPU cross-lane reductions (measured 1.44 vs 0.69 ms
        # total with the reduction form — lane reduces are shuffle chains)
        if n_layers > 1:
            out = jax.lax.dot(h, w_refs[-1][g], precision=jax.lax.Precision.DEFAULT,
                              preferred_element_type=jnp.float32)
            out = out + b_refs[-1][g].astype(jnp.float32)
        else:
            out = acc
        out_ref[g] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("layer_out_channels", "use_bias",
                                             "tile_p", "group", "interpret"))
def decode_batch(flat_weights: jax.Array, points: jax.Array,
                 layer_out_channels: tuple[int, ...], use_bias: bool = True, *,
                 tile_p: int = 2048, group: int = 8,
                 interpret: bool = False) -> jax.Array:
    """Fused decode: (B, W) flat weights x (B, N, 3) points -> (B, N, 3).

    Drop-in equal to ``batched_target_network_forward`` (same per-layer
    rounding in bf16; fp32 differs only by dot reassociation).
    """
    b, n, _ = points.shape
    tile_p = min(tile_p, n)
    while n % tile_p:
        tile_p //= 2
    if tile_p < 8:
        raise ValueError(f"N={n} must be a multiple of 8 for the fused decode kernel")
    group = min(group, b)
    while b % group:
        group //= 2
    dtype = points.dtype
    ws, bs = split_flat_weights(flat_weights.astype(dtype), list(layer_out_channels), use_bias)
    n_layers = len(ws)

    sample = lambda i, j: (i, 0, 0)
    w_specs = [
        pl.BlockSpec((group,) + w.shape[1:], sample, memory_space=pltpu.VMEM) for w in ws
    ] + [
        pl.BlockSpec((group, 1, bb.shape[2]), sample, memory_space=pltpu.VMEM) for bb in bs
    ]

    out = pl.pallas_call(
        functools.partial(_decode_kernel, n_layers=n_layers, group=group),
        grid=(b // group, n // tile_p),
        in_specs=[
            pl.BlockSpec((group, tile_p, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((group, tile_p, 3), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, 3), dtype),
        interpret=interpret,
    )(points, *ws, *bs)
    return out


def decode_shapes_ok(n: int) -> bool:
    return n % 8 == 0
