"""Pallas TPU kernel: streaming exact nearest-neighbour distance.

The TPU-native replacement for the reference CUDA kernel
``utils/pytorch_structural_losses/nndistance.cu:8-133``. Design
(flash-attention-style streaming, SURVEY.md §5 "long-context"):

* one direction per launch (queries -> keys), called twice like the CUDA
  launcher (nndistance.cu:131-133);
* grid (B, N/TILE_N, M/TILE_M): each step holds a (TILE_M, 3) key slab and a
  (3, TILE_N) query slab in VMEM and materialises only a (TILE_M, TILE_N)
  distance tile — the B x N x M matrix never exists in HBM; key tiles merge
  through a lane-oriented running-min scratch (production M=2048 fits one
  tile, so the merge is two vector selects);
* the distance tile is built on the VPU as sum_c (k_c - q_c)^2 with
  broadcasting — no MXU pass is wasted padding a K=3 contraction to 128;
* min/argmin reduce over the sublane axis, so results land lane-oriented
  (1, TILE_N) and stream straight to the output rows.

Gradients reuse the pure-JAX VJP (gather + scatter of (B, N, 3)), which is
tiny next to the forward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------------------
# VMEM working-set budget model. Every tile-size decision and
# ``vmem_limit_bytes`` request flows through these constants — they are
# v5e-PROBED heuristics, not queried hardware limits:
# * Mosaic's scoped-vmem default stack is 16 MB on current generations;
# * physical VMEM is 128 MB/core on v4/v5e/v5p (a 120 MB scratch compiled
#   and ran on v5e — probe in git history); _VMEM_REQUEST_CAP keeps margin;
# * _VMEM_HEADROOM covers temporaries the per-kernel estimates miss.
# A shape whose true Mosaic allocation still exceeds an estimate fails at
# compile time; ``_retry_smaller_tiles`` catches that in the dispatch
# wrappers and retries with halved query tiles before surfacing.
_VMEM_SCOPED_DEFAULT = 16 * 1024 * 1024
_VMEM_HEADROOM = 8 * 1024 * 1024
_VMEM_REQUEST_CAP = 100 * 1024 * 1024
_VMEM_FUSED_BUDGET = 24 * 1024 * 1024      # fused dist+idx kernel planning
_VMEM_FUSED_GRAD_BUDGET = 8 * 1024 * 1024  # fused loss+grad kernel planning


def _vmem_params(working_set: int) -> dict:
    """compiler_params kwargs raising the scoped-VMEM limit when needed."""
    if working_set > _VMEM_SCOPED_DEFAULT:
        return {
            "compiler_params": pltpu.CompilerParams(
                vmem_limit_bytes=min(working_set, _VMEM_REQUEST_CAP)
            )
        }
    return {}


def _is_vmem_error(exc: BaseException) -> bool:
    """True only for VMEM *capacity* failures, which the dispatch wrappers
    may legitimately absorb (halved-tile retry / two-launch fallback).

    Mosaic's message reads "Scoped allocation with size NN.NM and limit
    16.00M exceeded scoped vmem limit by ..." (observed v5e). A bare
    'vmem' substring also matched layout/lowering bugs whose text mentions a
    VMEM operand, silently rerouting real kernel regressions to the slow
    fallback — those must stay loud."""
    text = str(exc).lower()
    return "vmem" in text and ("exceed" in text or "out of" in text or "oom" in text)


def _retry_smaller_tiles(call, tile_n: int, min_tile: int = 128):
    """call(tile_n) with halved-tile retries on Mosaic VMEM compile errors."""
    while True:
        try:
            return call(tile_n)
        except Exception as exc:  # Mosaic raises backend-specific types
            if tile_n > min_tile and _is_vmem_error(exc):
                tile_n //= 2
                continue
            raise


def _nn_one_direction_kernel(q_ref, k_ref, dist_ref, idx_ref, run_min, run_idx,
                             *, tile_m: int):
    """q_ref (1, 3, TN), k_ref (1, TM, 3) -> dist/idx (1, 1, TN).

    Grid (B, N/TN, M/TM), key-tile axis innermost: each step reduces one
    (TM, TN) distance tile over sublanes and merges into the lane-oriented
    running minimum scratch; the final key tile writes the output block.
    With M/TM == 1 this degenerates to the original single-block kernel.
    """
    l = pl.program_id(2)
    nl = pl.num_programs(2)
    tm = k_ref.shape[1]
    tn = q_ref.shape[2]
    keys = k_ref[0]  # (TM, 3)
    d = jnp.zeros((tm, tn), jnp.float32)
    for c in range(3):
        diff = keys[:, c : c + 1] - q_ref[0, c : c + 1, :]  # (TM,1)-(1,TN) -> (TM,TN)
        d += diff * diff
    tile_min = jnp.min(d, axis=0, keepdims=True)  # (1, TN) sublane reduce
    tile_idx = jnp.argmin(d, axis=0).astype(jnp.int32)[None, :] + l * tile_m

    @pl.when(l == 0)
    def _():
        run_min[...] = tile_min
        run_idx[...] = tile_idx

    @pl.when(l > 0)
    def _():
        better = tile_min < run_min[...]
        run_min[...] = jnp.where(better, tile_min, run_min[...])
        run_idx[...] = jnp.where(better, tile_idx, run_idx[...])

    @pl.when(l == nl - 1)
    def _():
        dist_ref[0, 0, :] = run_min[0, :]
        idx_ref[0, 0, :] = run_idx[0, :]


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m", "interpret"))
def _nn_one_direction(q: jax.Array, k: jax.Array, *, tile_n: int = 2048,
                      tile_m: int = 2048, interpret: bool = False):
    """q (B, N, 3), k (B, M, 3) -> (dist (B, N), idx (B, N)).

    ``tile_m`` bounds the key slab held in VMEM: M=2048 production clouds fit
    one block (zero scratch-merge overhead in the common case beyond two
    vector selects), while larger clouds stream key tiles — the kernel API
    tiles the point axis, which is also what a ring pass over ICI would shard
    (SURVEY §5 long-context analogue).

    ``tile_n`` defaults to a whole 2048-pt cloud: the (TILE_M, TILE_N)
    distance tile at 2048x2048 is 16 MB, past the default scoped-VMEM stack,
    so the call raises ``vmem_limit_bytes`` when the working set needs it
    (v5e takes 120 MB — probed). One grid step per cloud pair measured
    2.28 vs 2.48 ms (B=64 square) over the old 512-query tiles.
    """
    b, n, _ = q.shape
    m = k.shape[1]
    tile_n = min(tile_n, n)
    while n % tile_n:
        tile_n //= 2
    if tile_n < 128 and tile_n != n:
        raise ValueError(f"N={n} must be a multiple of 128 for the pallas kernel")
    tile_m = min(tile_m, m)
    while m % tile_m:
        tile_m //= 2
    if tile_m < 8 and tile_m != m:
        raise ValueError(f"M={m} must be a multiple of 8 for the pallas kernel")
    qt = jnp.transpose(q, (0, 2, 1))  # (B, 3, N): queries lane-oriented
    grid = (b, n // tile_n, m // tile_m)
    kernel = functools.partial(_nn_one_direction_kernel, tile_m=tile_m)
    # ~3 live (TILE_M, TILE_N) fp32 temps (d + diff + select)
    params = _vmem_params(3 * tile_m * tile_n * 4 + _VMEM_HEADROOM)
    dist, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3, tile_n), lambda i, j, l: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, 3), lambda i, j, l: (i, l, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_n), lambda i, j, l: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_n), lambda i, j, l: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, tile_n), jnp.float32),  # running min
            pltpu.VMEM((1, tile_n), jnp.int32),    # running argmin
        ],
        interpret=interpret,
        **params,
    )(qt, k)
    return dist[:, 0, :], idx[:, 0, :]


def _nn_min_fused_kernel(q_ref, k_ref, dist1_ref, dist2_ref, kmin, *,
                         tile_n: int):
    """Both-direction NN DISTANCES only — no argmin bookkeeping.

    The loss value, the val epochs, and the metric pipelines (MMD inner op,
    chamfer_per_cloud, directed Hausdorff) never read the indices; dropping
    them removes the int select chains and the (M, 128) index planes that
    made the fused single-pass kernel lose to two launches. Measured (v5e,
    B=64, within one process): N=M=2048 1.53 ms vs 2.15 for two full
    launches (1.41x — and unlike the full fused kernel, the min-only single
    pass wins at SQUARE shapes too); N=2048/M=1024 1.22 vs 1.49 (1.22x,
    fused-full 1.55).
    """
    m = k_ref.shape[1]
    j = pl.program_id(1)
    nt = pl.num_programs(1)
    keys = k_ref[0]  # (M, 3)
    d = jnp.zeros((m, tile_n), jnp.float32)
    for c in range(3):
        diff = keys[:, c : c + 1] - q_ref[0, c : c + 1, :]
        d += diff * diff
    dist1_ref[0, 0, :] = jnp.min(d, axis=0)
    for c4 in range(tile_n // 128):
        dc = d[:, c4 * 128 : (c4 + 1) * 128]
        tile_min = dc if c4 == 0 else jnp.minimum(tile_min, dc)

    @pl.when(j == 0)
    def _():
        kmin[...] = tile_min

    @pl.when(j > 0)
    def _():
        kmin[...] = jnp.minimum(kmin[...], tile_min)

    @pl.when(j == nt - 1)
    def _():
        dist2_ref[0, :, :] = jnp.min(kmin[...], axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def _nn_min_fused(q: jax.Array, k: jax.Array, *, tile_n: int = 1024,
                  interpret: bool = False):
    """(dist1 (B, N), dist2 (B, M)) — min distances both directions."""
    b, n, _ = q.shape
    m = k.shape[1]
    tile_n = _fused_tile_n(n, m, tile_n)
    if tile_n is None:
        raise ValueError(
            f"shapes N={n} M={m} unsupported by the fused min kernel"
        )
    qt = jnp.transpose(q, (0, 2, 1))
    kernel = functools.partial(_nn_min_fused_kernel, tile_n=tile_n)
    params = _vmem_params(m * (tile_n * 8 + 512) + _VMEM_HEADROOM)
    dist1, dist2 = pl.pallas_call(
        kernel,
        grid=(b, n // tile_n),
        in_specs=[
            pl.BlockSpec((1, 3, tile_n), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 3), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_n), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, m, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((m, 128), jnp.float32),  # key-min planes
        ],
        interpret=interpret,
        **params,
    )(qt, k)
    return dist1[:, 0, :], dist2[:, :, 0]


def _nn_min_forward(a: jax.Array, b: jax.Array):
    """Streaming min-only distances (both directions); shapes pre-checked."""
    interpret = _use_interpret()
    n, m = a.shape[1], b.shape[1]
    tn = _fused_tile_n(n, m) if m % 128 == 0 else None
    if tn is not None and (tn >= 256 or interpret):
        try:
            return _retry_smaller_tiles(
                lambda t: _nn_min_fused(a, b, tile_n=t, interpret=interpret),
                tn, min_tile=256 if not interpret else 128,
            )
        except Exception as exc:
            if not _is_vmem_error(exc):
                raise  # fall through to the two-launch path on VMEM misses
    d1, _, d2, _ = _nn_forward_pallas(a, b)
    return d1, d2


def nn_min_dists(a: jax.Array, b: jax.Array):
    """(dist1 (B, N), dist2 (B, M)): NN squared distances WITHOUT indices.

    The fast path for every consumer that discards the argmins (loss
    values, val epochs, MMD/TMD/UHD inner ops). Dispatch: the fused
    min-only single pass when shapes allow, else the two-launch kernels
    (indices computed then dropped), else the XLA matrix form off-TPU or
    on unaligned shapes.
    """
    if _use_streaming(a.shape[1], b.shape[1]):
        return _nn_min_forward(a, b)
    from hyperpocket_tpu.ops.chamfer import nn_distance

    d1, _, d2, _ = nn_distance(a, b)
    return d1, d2


def _nn_fused_planes_kernel(q_ref, k_ref, dist1_ref, idx1_ref, dist2_ref,
                            idx2_ref, kmin, kidx, *, tile_n: int):
    """Fused both-direction NN with (M, 128)-plane key bookkeeping.

    History: round 1's fused kernel lost to two single-direction launches
    (6.2 ms vs 3.7 at B=64 N=M=2048) because direction 2 did a
    lane-direction min/argmin per tile and updated an (M, 1) running minimum
    — 1 of 128 lanes doing work. Here the key-direction state is an (M, 128)
    PLANE: lane L holds the best distance among query positions congruent to
    L mod 128, so each tile's update is TN/128 full-width elementwise
    min/selects, and the only cross-lane reduction happens ONCE after the
    last tile. (A FULL-WIDTH (M, TILE_N) running state — no 128-slicing at
    all — was also tried and is a NEGATIVE result: 3.2-4.1 ms at square
    N=M=2048 across TILE_N in {128, 256, 512} vs 3.0 for this kernel; the
    per-tile select work is identical, so the wider running state only adds
    VMEM/layout pressure — 8 MB of min+idx scratch at TILE_N=512.)
    Measured (v5e, B=64): N=M=2048 3.0 ms vs 2.7-3.1 for two
    launches (parity — the remaining cost is the per-128-lane slicing of the
    512-wide tile); N=2048 M=1024 1.87 ms vs 2.42 (1.3x — the win grows as
    the key cloud shrinks relative to the query cloud, because the single
    pass recomputes distances once instead of twice). Two launches stay the
    default at square shapes. Tile argmin ties resolve to the lowest query
    index (min over candidate indices), matching numpy/CUDA first-occurrence
    semantics.
    """
    m = k_ref.shape[1]
    j = pl.program_id(1)
    nt = pl.num_programs(1)
    keys = k_ref[0]  # (M, 3)
    d = jnp.zeros((m, tile_n), jnp.float32)
    for c in range(3):
        diff = keys[:, c : c + 1] - q_ref[0, c : c + 1, :]
        d += diff * diff
    # direction 1: per-query minima for this tile (sublane reduce, cheap)
    dist1_ref[0, 0, :] = jnp.min(d, axis=0)
    idx1_ref[0, 0, :] = jnp.argmin(d, axis=0).astype(jnp.int32)
    # direction 2: fold the TN lanes into the 128-wide running planes
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 1)
    for c4 in range(tile_n // 128):
        dc = d[:, c4 * 128 : (c4 + 1) * 128]  # (M, 128)
        qidx = lane + (j * tile_n + c4 * 128)
        if c4 == 0:
            tile_min, tile_idx = dc, qidx
        else:
            better = dc < tile_min
            tile_idx = jnp.where(better, qidx, tile_idx)
            tile_min = jnp.where(better, dc, tile_min)

    @pl.when(j == 0)
    def _():
        kmin[...] = tile_min
        kidx[...] = tile_idx

    @pl.when(j > 0)
    def _():
        better = tile_min < kmin[...]
        kidx[...] = jnp.where(better, tile_idx, kidx[...])
        kmin[...] = jnp.where(better, tile_min, kmin[...])

    @pl.when(j == nt - 1)
    def _():
        # single cross-lane reduce at the end; ties -> lowest query index
        best = jnp.min(kmin[...], axis=1, keepdims=True)  # (M, 1)
        cand = jnp.where(kmin[...] == best, kidx[...], jnp.int32(2**31 - 1))
        dist2_ref[0, :, :] = best
        idx2_ref[0, :, :] = jnp.min(cand, axis=1, keepdims=True)


def _fused_tile_n(n: int, m: int, tile_n: int = 1024) -> int | None:
    """Largest legal query tile for the fused kernel, or None if unsupported.

    Constraints: the kernel folds lanes in exact 128-wide chunks, so tile_n
    MUST be a multiple of 128 that divides N (anything else silently drops
    the remainder queries from direction 2); and the (M, TILE_N) distance
    tile + one temporary + the (M, 128) f32+i32 planes must fit the VMEM
    working-set budget (the wrapper raises ``vmem_limit_bytes`` past the
    16 MB scoped default when needed — tile 1024 measured 2.69 vs 2.89 ms
    for 512 at B=64 square).
    """
    if n % 128 or m % 8:
        return None
    tn = min(tile_n, n)
    tn -= tn % 128
    while tn >= 128:
        if n % tn == 0 and m * (tn * 8 + 1024) <= _VMEM_FUSED_BUDGET:
            return tn
        tn -= 128
    return None


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def _nn_fused_planes(q: jax.Array, k: jax.Array, *, tile_n: int = 1024,
                     interpret: bool = False):
    """(dist1 (B,N), idx1, dist2 (B,M), idx2) in one launch, plane layout."""
    b, n, _ = q.shape
    m = k.shape[1]
    tile_n = _fused_tile_n(n, m, tile_n)
    if tile_n is None:
        raise ValueError(
            f"shapes N={n} M={m} unsupported by the fused kernel "
            "(need N % 128 == 0, a 128-multiple tile dividing N, and the "
            "key planes + distance tile within VMEM) — use _nn_one_direction"
        )
    qt = jnp.transpose(q, (0, 2, 1))
    kernel = functools.partial(_nn_fused_planes_kernel, tile_n=tile_n)
    params = _vmem_params(m * (tile_n * 8 + 1024) + _VMEM_HEADROOM)
    dist1, idx1, dist2, idx2 = pl.pallas_call(
        kernel,
        grid=(b, n // tile_n),
        in_specs=[
            pl.BlockSpec((1, 3, tile_n), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 3), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile_n), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_n), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n), jnp.int32),
            jax.ShapeDtypeStruct((b, m, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, m, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((m, 128), jnp.float32),  # key-min planes
            pltpu.VMEM((m, 128), jnp.int32),    # key-argmin planes
        ],
        interpret=interpret,
        **params,
    )(qt, k)
    return dist1[:, 0, :], idx1[:, 0, :], dist2[:, :, 0], idx2[:, :, 0]


def _chamfer_loss_grad_kernel(q_ref, k_ref, loss_ref, ga_ref, gb_ref, kmin,
                              kidx, ga_acc, gb_acc, anm_acc, loss_acc, *,
                              tile_n: int):
    """One pass per sample: Chamfer loss AND both gradients. NEGATIVE RESULT.

    Correct (tests) but NOT dispatched: measured 9.2 ms at B=64 N=M=2048
    fp32 vs 4.7 ms for the existing value_and_grad path (streaming forward +
    gather/one-hot-scatter VJP). The idea — the loss is a scalar sum of
    minima, so compute the gradient fields inside the forward and make the
    backward a scalar scaling — founders on arithmetic reality: the four
    one-hot gather/scatter contractions each sweep the full (M, N) volume on
    the MXU, and fp32 exactness (the <=1e-5 parity budget) forces
    6-pass-HIGHEST, ~1024x6 MXU passes per sample — more than the whole
    distance pass it was meant to amortise. Meanwhile the "expensive"
    backward it replaces is already near the VPU floor: the forward's
    distance sweep dominates and the XLA gather + chunked one-hot scatter
    backward adds only ~60%. Kept with tests as documentation; lessons:

    * one-hot contractions needing fp32 exactness do NOT belong on the MXU
      (6x pass multiplier); sublane-oriented VPU reductions or the existing
      XLA path are the right tools;
    * the (M, 128) plane trick composes fine with extra per-tile work —
      phases here reuse it unchanged (and ties resolve first-occurrence,
      matching nndistance.cu:135-154, via iota==argmin one-hot rows).

    q_ref (1, 3, N) lane-oriented gts, k_ref (1, M, 3) preds ->
    loss_ref (1, 8, 128) (per-sample loss at [0,0,0]), ga_ref (1, 3, N),
    gb_ref (1, M, 3).
    """
    m = k_ref.shape[1]
    n = q_ref.shape[2]
    nt = n // tile_n
    keys = k_ref[0]  # (M, 3)
    f32 = jnp.float32
    loss_acc[0, 0] = 0.0
    gb_acc[...] = jnp.zeros((m, 4), f32)
    # k augmented with a ones column for fused sum+count contractions
    k_aug = jnp.concatenate([keys, jnp.ones((m, 1), f32)], axis=1)  # (M, 4)

    def phase1(j, _):
        sl = pl.ds(j * tile_n, tile_n)
        q_tile = q_ref[0, :, sl]  # (3, TN)
        d = jnp.zeros((m, tile_n), f32)
        for c in range(3):
            diff = keys[:, c : c + 1] - q_tile[c : c + 1, :]
            d += diff * diff
        # direction 1: loss + one-hot(argmin) gather/scatter
        dmin = jnp.min(d, axis=0)  # (TN,)
        loss_acc[0, 0] += jnp.sum(dmin)
        idx1 = jnp.argmin(d, axis=0).astype(jnp.int32)  # (TN,)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (m, tile_n), 0)
        onehot1 = (row_iota == idx1[None, :]).astype(f32)  # (M, TN)
        # b_nn as (3, TN): contract M on the MXU (exact: one-hot x fp32)
        bnn = jax.lax.dot_general(
            keys, onehot1, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST, preferred_element_type=f32,
        )  # (3, TN)
        ga_acc[:, sl] = 2.0 * (q_tile - bnn)
        # scatter of [q, 1] rows into gb_acc: (M, TN) x (4, TN)^T -> (M, 4)
        q_aug = jnp.concatenate(
            [q_tile, jnp.ones((1, tile_n), f32)], axis=0
        )  # (4, TN)
        gb_acc[...] += jax.lax.dot_general(
            onehot1, q_aug, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST, preferred_element_type=f32,
        )
        # direction 2: fold lanes into the (M, 128) running planes
        lane = jax.lax.broadcasted_iota(jnp.int32, (m, 128), 1)
        for c4 in range(tile_n // 128):
            dc = d[:, c4 * 128 : (c4 + 1) * 128]
            qidx = lane + (j * tile_n + c4 * 128)
            if c4 == 0:
                tile_min, tile_idx = dc, qidx
            else:
                better = dc < tile_min
                tile_idx = jnp.where(better, qidx, tile_idx)
                tile_min = jnp.where(better, dc, tile_min)

        @pl.when(j == 0)
        def _():
            kmin[...] = tile_min
            kidx[...] = tile_idx

        @pl.when(j > 0)
        def _():
            better = tile_min < kmin[...]
            kidx[...] = jnp.where(better, tile_idx, kidx[...])
            kmin[...] = jnp.where(better, tile_min, kmin[...])

        return 0

    jax.lax.fori_loop(0, nt, phase1, 0, unroll=False)

    # direction-2 finalise: ties -> lowest query index (first occurrence)
    best = jnp.min(kmin[...], axis=1, keepdims=True)  # (M, 1)
    cand = jnp.where(kmin[...] == best, kidx[...], jnp.int32(2**31 - 1))
    idx2 = jnp.min(cand, axis=1, keepdims=True)  # (M, 1)
    loss_acc[0, 0] += jnp.sum(best)
    anm_acc[...] = jnp.zeros((m, 4), f32)

    def phase2(j, _):
        sl = pl.ds(j * tile_n, tile_n)
        q_tile = q_ref[0, :, sl]
        lane = jax.lax.broadcasted_iota(jnp.int32, (m, tile_n), 1)
        onehot2 = ((lane + j * tile_n) == idx2).astype(f32)  # (M, TN)
        q_aug = jnp.concatenate([q_tile, jnp.ones((1, tile_n), f32)], axis=0)
        # gather a[idx2] rows (and a count that is 1 by construction)
        anm_acc[...] += jax.lax.dot_general(
            onehot2, q_aug, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST, preferred_element_type=f32,
        )
        # scatter of [b, 1] columns into ga: (M, 4)^T x (M, TN) -> (4, TN)
        sb = jax.lax.dot_general(
            k_aug, onehot2, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST, preferred_element_type=f32,
        )
        ga_acc[:, sl] += 2.0 * (sb[3:4, :] * q_tile - sb[0:3, :])
        return 0

    jax.lax.fori_loop(0, nt, phase2, 0, unroll=False)

    ga_ref[0, :, :] = ga_acc[...]
    gb_ref[0, :, :] = (
        2.0 * (gb_acc[:, 3:4] * keys - gb_acc[:, 0:3])
        + 2.0 * (keys - anm_acc[:, 0:3])
    )
    loss_ref[0, :, :] = jnp.full((8, 128), loss_acc[0, 0], f32)


def _loss_tile_n(n: int, m: int, tile_n: int = 256) -> int | None:
    """Largest legal query tile for the loss+grad kernel, or None.

    Tighter than _fused_tile_n: this kernel holds the distance tile, a
    one-hot tile, the per-coordinate diff temporaries AND the (M, 128)
    planes concurrently — tile_n=256 at M=2048 compile-fails with an 18.5 MB
    scoped-vmem stack (16 MB limit), so the budget charges ~16 fp32 words
    per (M, tile_n) element and keeps headroom for the temps.
    """
    if n % 128 or m % 8:
        return None
    tn = min(tile_n, n)
    tn -= tn % 128
    while tn >= 128:
        if n % tn == 0 and m * (tn * 16 + 1024) <= _VMEM_FUSED_GRAD_BUDGET:
            return tn
        tn -= 128
    return None


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def _chamfer_loss_grad(q: jax.Array, k: jax.Array, *, tile_n: int = 256,
                       interpret: bool = False):
    """Per-sample loss (B,) + gradients ga (B, N, 3), gb (B, M, 3)."""
    b, n, _ = q.shape
    m = k.shape[1]
    tile_n = _loss_tile_n(n, m, tile_n)
    if tile_n is None:
        raise ValueError(f"shapes N={n} M={m} unsupported by the fused loss kernel")
    qt = jnp.transpose(q, (0, 2, 1)).astype(jnp.float32)
    kernel = functools.partial(_chamfer_loss_grad_kernel, tile_n=tile_n)
    loss, gat, gb = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 3, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m, 3), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, 3, n), jnp.float32),
            jax.ShapeDtypeStruct((b, m, 3), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((m, 128), jnp.float32),  # direction-2 min planes
            pltpu.VMEM((m, 128), jnp.int32),    # direction-2 argmin planes
            pltpu.VMEM((3, n), jnp.float32),    # ga accumulator
            pltpu.VMEM((m, 4), jnp.float32),    # gb dir-1 scatter (sums + count)
            pltpu.VMEM((m, 4), jnp.float32),    # a[idx2] gather rows
            pltpu.SMEM((1, 1), jnp.float32),    # loss accumulator
        ],
        interpret=interpret,
    )(qt, k.astype(jnp.float32))
    return loss[:, 0, 0], jnp.transpose(gat, (0, 2, 1)), gb


@jax.custom_vjp
def chamfer_loss_fused(gts: jax.Array, preds: jax.Array) -> jax.Array:
    """chamfer_loss with the fused loss+gradient forward under autodiff.

    NOT the production path (see _chamfer_loss_grad_kernel: 2x slower than
    chamfer_loss_streaming's value_and_grad at production shapes). Identical
    value to ``chamfer_loss_streaming``; under ``grad`` the fwd rule
    computes loss and both gradient fields in one kernel and the backward
    is the upstream scalar scaling the saved residuals.
    """
    return chamfer_loss_streaming(gts, preds)


def _clf_fwd(gts, preds):
    interpret = _use_interpret()
    loss, ga, gb = _chamfer_loss_grad(gts, preds, interpret=interpret)
    return jnp.sum(loss), (ga, gb)


def _clf_bwd(res, g):
    ga, gb = res
    return g * ga, g * gb


chamfer_loss_fused.defvjp(_clf_fwd, _clf_bwd)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _nn_forward_pallas(a: jax.Array, b: jax.Array):
    interpret = _use_interpret()
    n, m = a.shape[1], b.shape[1]
    fused_tn = _fused_tile_n(n, m) if n != m and m % 128 == 0 else None
    if fused_tn is not None and fused_tn >= 256:
        # asymmetric clouds: the fused single-pass kernel wins (1.87 ms vs
        # 2.42 at N=2048 M=1024, B=64) because it computes each distance
        # tile once for both directions; at square shapes two launches are
        # at parity or slightly ahead, so they stay the default there.
        # _fused_tile_n also rejects key clouds whose (M, 128) planes would
        # not fit VMEM, and shapes that only fit a 128-wide query tile
        # (a measured loser — grid overhead) stream through two launches.
        try:
            return _retry_smaller_tiles(
                lambda tn: _nn_fused_planes(a, b, tile_n=tn, interpret=interpret),
                fused_tn, min_tile=256,
            )
        except Exception as exc:
            if not _is_vmem_error(exc):
                raise
            # budget estimate undershot the real allocation: two launches
            # have a smaller working set and their own halved-tile retries
    one = lambda q, k: _retry_smaller_tiles(
        lambda tn: _nn_one_direction(q, k, tile_n=tn, interpret=interpret), 2048
    )
    dist1, idx1 = one(a, b)
    dist2, idx2 = one(b, a)
    return dist1, idx1, dist2, idx2


@jax.custom_vjp
def nn_distance_pallas(a: jax.Array, b: jax.Array):
    """Drop-in replacement for ``ops.chamfer.nn_distance`` backed by Pallas."""
    return _nn_forward_pallas(a, b)


def _fwd(a, b):
    out = _nn_forward_pallas(a, b)
    dist1, idx1, dist2, idx2 = out
    return out, (a, b, idx1, idx2)


def _bwd(res, grads):
    from hyperpocket_tpu.ops.chamfer import _nn_bwd

    return _nn_bwd(res, grads)


nn_distance_pallas.defvjp(_fwd, _bwd)


@jax.custom_vjp
def chamfer_loss_streaming(gts: jax.Array, preds: jax.Array) -> jax.Array:
    """Reference ChamferLoss semantics via the streaming kernel.

    Identical value to ``ops.chamfer.chamfer_loss`` (sum-of-min both
    directions, scalar over the batch) but never materialises the pairwise
    matrix and backprops through gather/scatter instead of a (B, N, M) mask.
    (Gradients differ from the pure version only at near-tied argmins, where
    both are valid subgradients.)

    The PRIMAL (val epochs, eval loss calls — anything not differentiated)
    runs the min-only kernel: no argmin bookkeeping, which is the dominant
    per-element cost of the full kernel. Under ``grad`` the fwd rule runs
    the index-carrying kernels instead (the backward's gather/scatter needs
    the argmins); distances are identical either way.
    """
    d_gt, d_pred = _nn_min_forward(gts, preds)
    return jnp.sum(d_gt) + jnp.sum(d_pred)


def _cls_fwd(gts, preds):
    d_gt, i1, d_pred, i2 = _nn_forward_pallas(gts, preds)
    return jnp.sum(d_gt) + jnp.sum(d_pred), (gts, preds, i1, i2)


def _cls_bwd(res, g):
    from hyperpocket_tpu.ops.chamfer import _nn_bwd

    gts, preds, i1, i2 = res
    g1 = jnp.broadcast_to(g, i1.shape).astype(gts.dtype)
    g2 = jnp.broadcast_to(g, i2.shape).astype(preds.dtype)
    return _nn_bwd((gts, preds, i1, i2), (g1, None, g2, None))


chamfer_loss_streaming.defvjp(_cls_fwd, _cls_bwd)


def pallas_shapes_ok(n: int, m: int) -> bool:
    """The streaming kernel needs lane-aligned point counts both directions."""
    return n % 128 == 0 and m % 128 == 0


def chamfer_loss_auto(gts: jax.Array, preds: jax.Array) -> jax.Array:
    """Fused loss(+grad-under-autodiff) kernel when shapes allow, else pure JAX."""
    from hyperpocket_tpu.ops.chamfer import chamfer_loss

    n, m = gts.shape[1], preds.shape[1]
    # the kernels are fp32-internal; fp64 (the trajectory-parity debugging
    # mode) must keep full precision -> pure-XLA chain, which is dtype-generic
    fp32_inputs = gts.dtype == jnp.float32 and preds.dtype == jnp.float32
    if fp32_inputs and pallas_shapes_ok(n, m):
        return chamfer_loss_streaming(gts, preds)
    return chamfer_loss(gts, preds)


def _use_streaming(n: int, m: int) -> bool:
    """Single place for the metric-pipeline dispatch policy: the streaming
    kernel on real TPU hardware with lane-aligned point counts; the XLA
    matrix forms elsewhere (off-TPU, interpret mode would be slower than
    XLA on CPU — unlike ``chamfer_loss_auto``, whose interpret path IS the
    CPU test coverage for the training loss)."""
    return jax.default_backend() == "tpu" and pallas_shapes_ok(n, m)


def nn_distance_auto(a: jax.Array, b: jax.Array):
    """``nn_distance`` via the streaming kernel on TPU-aligned shapes.

    Identical distances/indices to ``ops.chamfer.nn_distance`` (tested),
    without the (B, N, M) HBM matrix — the dispatch the metric pipelines
    (eval/evaluation.py, eval/metrics.py) go through.
    """
    if _use_streaming(a.shape[1], b.shape[1]):
        return nn_distance_pallas(a, b)
    from hyperpocket_tpu.ops.chamfer import nn_distance

    return nn_distance(a, b)


def chamfer_per_cloud_auto(x: jax.Array, y: jax.Array) -> jax.Array:
    """``chamfer_per_cloud`` (mean-of-min both directions, per cloud) via the
    min-only streaming kernel on TPU-aligned shapes; XLA matrix form
    elsewhere."""
    if _use_streaming(x.shape[1], y.shape[1]):
        d1, d2 = _nn_min_forward(x, y)
        return jnp.mean(d1, axis=1) + jnp.mean(d2, axis=1)
    from hyperpocket_tpu.ops.chamfer import chamfer_per_cloud

    return chamfer_per_cloud(x, y)


def directed_hausdorff_auto(a: jax.Array, b: jax.Array) -> jax.Array:
    """``directed_hausdorff`` (max over a of sqrt NN-dist into b) via the
    min-only streaming kernel on TPU-aligned shapes (UHD's inner op)."""
    if _use_streaming(a.shape[1], b.shape[1]):
        dist, _ = _nn_min_forward(a, b)
        return jnp.max(jnp.sqrt(jnp.maximum(dist, 0.0)), axis=1)
    from hyperpocket_tpu.ops.chamfer import directed_hausdorff

    return directed_hausdorff(a, b)
