"""Approximate Earth Mover's Distance (auction-style soft matching).

Re-implements, as fused batched einsums under ``jit``, the fixed 9-round
approximate matching algorithm of the reference CUDA kernel
``utils/pytorch_structural_losses/approxmatch.cu``:

* ``approx_match`` — ``approxmatchkernel`` (approxmatch.cu:34-213): rounds at
  temperatures ``level = -4^j`` for ``j = 7..0`` and ``-0.25`` for the final
  round, producing a soft match matrix with row budget ``multiL`` and column
  budget ``multiR`` (integer-division multipliers, approxmatch.cu:36-42).
* ``match_cost`` — ``matchcostkernel`` (approxmatch.cu:215-255):
  ``sum(match * |x - y|)`` (Euclidean, not squared), per batch element.
* custom VJP — ``matchcostgrad{1,2}kernel`` (approxmatch.cu:260-322): the
  match matrix is treated as a constant; gradients are match-weighted unit
  vectors. We compute them without materialising the (B, N, M, 3) difference
  tensor: ``dx = x * rowsum(mt) - mt @ y`` with ``mt = match / dist``.

TPU-first notes: every round is two MXU einsums plus VPU elementwise work;
the (B, N, M) kernel matrix is recomputed per round (exactly like the CUDA
kernel) so only one N*M buffer is live at a time. Callers should chunk the
batch dimension for very large B (see ``earth_mover_distance``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from hyperpocket_tpu.ops.chamfer import batch_pairwise_sqdist

# Temperatures of the 9 rounds: -4^j for j = 7..0, then -0.25 (the reference
# loop runs j = 7..-1 with level = -pow(4, j); approxmatch.cu:55-60).
_LEVELS = tuple(-(4.0 ** j) for j in range(7, -2, -1))


def _match_multipliers(n: int, m: int) -> tuple[float, float]:
    """Row/column budgets with C integer-division semantics (approxmatch.cu:36-42)."""
    if n >= m:
        return 1.0, float(n // m)
    return float(m // n), 1.0


def approx_match(x: jax.Array, y: jax.Array) -> jax.Array:
    """Soft match matrix between x (B, N, 3) and y (B, M, 3) -> (B, N, M).

    ``match[b, k, l]`` is the transported mass between ``x[b, k]`` and
    ``y[b, l]``; rows sum to ~multiL and columns to ~multiR. Equivalent to the
    reference ``ApproxMatch`` with layout transposed to the natural (N, M)
    (the CUDA kernel stores match[l, k]).
    """
    n, m = x.shape[1], y.shape[1]
    multi_l, multi_r = _match_multipliers(n, m)
    d2 = batch_pairwise_sqdist(x, y)  # (B, N, M)

    def round_fn(carry, level):
        match, remain_l, remain_r = carry
        kern = jnp.exp(level * d2)  # (B, N, M)
        # Row normalisation: how much each x point wants to send per unit mass.
        suml = jnp.einsum("bnm,bm->bn", kern, remain_r) + 1e-9
        ratio_l = remain_l / suml
        # Column feasibility: clip the incoming mass at the remaining budget.
        sumr = jnp.einsum("bnm,bn->bm", kern, ratio_l) * remain_r
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        # Transported mass this round.
        w = kern * ratio_l[:, :, None] * ratio_r[:, None, :]
        match = match + w
        remain_l = jnp.maximum(0.0, remain_l - jnp.sum(w, axis=2))
        return (match, remain_l, remain_r), None

    init = (
        jnp.zeros_like(d2),
        jnp.full((x.shape[0], n), multi_l, dtype=x.dtype),
        jnp.full((x.shape[0], m), multi_r, dtype=x.dtype),
    )
    (match, _, _), _ = lax.scan(round_fn, init, jnp.asarray(_LEVELS, dtype=x.dtype))
    return match


def _cost_from_match(x, y, match):
    d2 = jnp.maximum(batch_pairwise_sqdist(x, y), 0.0)
    return jnp.sum(match * jnp.sqrt(d2), axis=(1, 2))


def _match_cost_reference(x, y):
    """Oracle path: materialised match (kept for tests/inspection)."""
    return _cost_from_match(x, y, approx_match(x, y))


def _streaming_cost(x, y):
    """One pass over the 9 rounds accumulating the cost without ever
    carrying the (B, N, M) match matrix.

    Uses the bilinear structure of each round's transported mass
    ``w = kern * ratio_l (x) ratio_r``: every reduction of ``w`` factorises
    into diagonal scalings around one matvec over ``kern``, so per round
    only transient (B, N, M) tensors exist and the carried state is
    O(N + M) plus the cost scalar.
    """
    n, m = x.shape[1], y.shape[1]
    multi_l, multi_r = _match_multipliers(n, m)
    d2 = batch_pairwise_sqdist(x, y)  # (B, N, M), the only persistent NM buffer
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))

    def round_fn(carry, level):
        remain_l, remain_r, cost = carry
        kern = jnp.exp(level * d2)
        suml = jnp.einsum("bnm,bm->bn", kern, remain_r) + 1e-9
        ratio_l = remain_l / suml
        sumr = jnp.einsum("bnm,bn->bm", kern, ratio_l) * remain_r
        consumption = jnp.minimum(remain_r / (sumr + 1e-9), 1.0)
        ratio_r = consumption * remain_r
        remain_r = jnp.maximum(0.0, remain_r - sumr)
        # cost += sum_kl w * dist  (bilinear in ratio_l, ratio_r)
        cost = cost + jnp.einsum(
            "bn,bn->b", ratio_l, jnp.einsum("bnm,bm->bn", kern * dist, ratio_r)
        )
        # remainder update needs w's row sums
        w_row = ratio_l * jnp.einsum("bnm,bm->bn", kern, ratio_r)
        remain_l = jnp.maximum(0.0, remain_l - w_row)
        return (remain_l, remain_r, cost), None

    b = x.shape[0]
    init = (
        jnp.full((b, n), multi_l, dtype=x.dtype),
        jnp.full((b, m), multi_r, dtype=x.dtype),
        jnp.zeros((b,), x.dtype),
    )
    (_, _, cost), _ = lax.scan(round_fn, init, jnp.asarray(_LEVELS, dtype=x.dtype))
    return cost


def _emd_impl() -> str:
    """EMD forward implementation: 'auto' (default), 'xla', or 'pallas'."""
    import os

    return os.environ.get("HPCD_EMD_IMPL", "auto")


def _forward_dispatch(x, y):
    """Pick the fused Pallas kernel on TPU when it wins (measured ~1.85x at
    N=2048 once per-call latency is excluded); XLA streaming otherwise."""
    impl = _emd_impl()
    if impl != "xla":
        from hyperpocket_tpu.ops import pallas_emd

        use_pallas = impl == "pallas" or (
            jax.default_backend() == "tpu"
            and pallas_emd.emd_shapes_ok(x.shape[1], y.shape[1])
            and x.shape[0] >= 16
        )
        if use_pallas:
            return pallas_emd.match_cost_pallas_fwd(
                x, y, interpret=jax.default_backend() != "tpu"
            )
    return _streaming_cost(x, y)


@jax.custom_vjp
def match_cost(x: jax.Array, y: jax.Array) -> jax.Array:
    """Approximate EMD: ``sum(match * |x - y|)`` per cloud pair -> (B,).

    Mirrors the reference ``MatchCostFunction``
    (utils/pytorch_structural_losses/match_cost.py:5-48): forward runs the
    9-round matching + cost in streaming form (no (B, N, M) match matrix is
    carried or saved) — fused Pallas kernel on TPU for aligned shapes and
    B >= 16, XLA scan otherwise (override with HPCD_EMD_IMPL=xla|pallas);
    backward recomputes the match and applies the CUDA gradient formulas
    (approxmatch.cu:260-322) — pairing each distance with its weight before
    reduction, which avoids the cancellation a factorised accumulation would
    suffer at near-zero distances. On TPU the backward is the fused Pallas
    kernel (pallas_emd.match_cost_pallas_bwd, nothing NM-sized in HBM);
    elsewhere a lax.map over 16-sample chunks bounds the live match buffers.
    """
    return _forward_dispatch(x, y)


def _match_cost_fwd(x, y):
    return _forward_dispatch(x, y), (x, y)


def _match_cost_bwd_chunk(x, y):
    match = approx_match(x, y)
    d2 = jnp.maximum(batch_pairwise_sqdist(x, y), 1e-20)
    mt = match * lax.rsqrt(d2)  # (B, N, M)
    row = jnp.sum(mt, axis=2)
    col = jnp.sum(mt, axis=1)
    # grad_x[k] = sum_l mt (x_k - y_l);  grad_y[l] = sum_k mt (y_l - x_k)
    gx = x * row[..., None] - jnp.einsum("bnm,bmd->bnd", mt, y)
    gy = y * col[..., None] - jnp.einsum("bnm,bnd->bmd", mt, x)
    return gx, gy


def _match_cost_bwd_xla(x, y):
    """Chunked match-recompute backward: at N=M=2048 each (b, N, M) match
    slice is 16 MB, so a B=64 backward would otherwise hold >1 GB live.
    ``lax.map`` (not an unrolled Python loop) guarantees the chunks run
    sequentially, so exactly one chunk's buffers are live at a time."""
    b = x.shape[0]
    chunk = max(1, min(b, 16))
    if b > chunk and b % chunk == 0:
        xs = x.reshape(b // chunk, chunk, *x.shape[1:])
        ys = y.reshape(b // chunk, chunk, *y.shape[1:])
        gx, gy = lax.map(lambda xy: _match_cost_bwd_chunk(*xy), (xs, ys))
        return gx.reshape(x.shape), gy.reshape(y.shape)
    gxs, gys = [], []
    for start in range(0, b, chunk):
        gx, gy = _match_cost_bwd_chunk(x[start : start + chunk], y[start : start + chunk])
        gxs.append(gx)
        gys.append(gy)
    gx = jnp.concatenate(gxs) if len(gxs) > 1 else gxs[0]
    gy = jnp.concatenate(gys) if len(gys) > 1 else gys[0]
    return gx, gy


def _match_cost_bwd(res, g):
    """Backward dispatch. PRECISION NOTE (training-loss use): on real TPU
    the pallas backward's gradients differ from the XLA path by up to ~0.5%
    on worst elements near coincident points (transcendental precision
    amplified by 1/dist; interpret-mode agreement is 1e-4). EMD is
    metrics-only in this framework (training uses Chamfer, as the reference
    hardcodes — core/main.py:58), where gradients never flow. Anyone
    adopting match_cost as a TRAINING loss should either set
    ``HPCD_EMD_IMPL=xla`` or first extend
    tests/test_pallas_emd.py::test_emd_descent_parity_pallas_vs_xla's
    descent check to their config on real hardware."""
    x, y = res
    impl = _emd_impl()
    use_pallas = False
    if impl != "xla":
        from hyperpocket_tpu.ops import pallas_emd

        # same gate as the forward (incl. B >= 16): below it the XLA path is
        # cheap enough that the kernel's per-shape Mosaic compile (erratic,
        # 17-290 s observed) isn't worth paying, and fwd/bwd should come
        # from matching implementations at any given shape
        use_pallas = impl == "pallas" or (
            jax.default_backend() == "tpu"
            and pallas_emd.emd_shapes_ok(x.shape[1], y.shape[1])
            and x.shape[0] >= 16
        )
    if use_pallas:
        gx, gy = pallas_emd.match_cost_pallas_bwd(
            x, y, interpret=jax.default_backend() != "tpu"
        )
    else:
        gx, gy = _match_cost_bwd_xla(x, y)
    g = g[:, None, None]
    return gx * g, gy * g


match_cost.defvjp(_match_cost_fwd, _match_cost_bwd)


def earth_mover_distance(sample: jax.Array, ref: jax.Array, batch_size: int | None = None) -> jax.Array:
    """Normalised approximate EMD per pair: ``match_cost / N`` -> (B,).

    Matches ``utils/metrics.py:44-76`` (``earth_mover_distance`` +
    ``emd_approx``): requires equal point counts; processes the batch in
    chunks of at most 300 to bound the live (B, N, M) buffers.
    """
    if sample.ndim == 2:
        sample = sample[None]
    if ref.ndim == 2:
        ref = ref[None]
    b, n = sample.shape[0], sample.shape[1]
    if ref.shape[1] != n:
        raise ValueError(f"EMD requires equal point counts, got {n} vs {ref.shape[1]}")
    if ref.shape[0] != b:
        raise ValueError(f"sample/ref batch mismatch: {b} vs {ref.shape[0]}")
    chunk = min(batch_size or b, 300)
    outs = []
    for start in range(0, b, chunk):
        outs.append(_match_cost_jit(sample[start : start + chunk], ref[start : start + chunk]))
    return jnp.concatenate(outs) / float(n)


# jitted entry for host-loop callers (eager dispatch is pathologically slow
# over the axon tunnel; see CLAUDE.md)
_match_cost_jit = jax.jit(match_cost)
