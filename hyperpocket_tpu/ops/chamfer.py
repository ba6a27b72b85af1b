"""Chamfer distance and exact nearest-neighbour distance.

Semantics reproduce the reference implementation:

* ``chamfer_loss`` matches ``losses/champfer_loss.py:11-35`` in the reference:
  squared pairwise distances via the ``|x|^2 + |y|^2 - 2<x,y>`` expansion,
  then the *sum* (not mean) of per-point minima in both directions, summed
  over the whole batch (a single scalar).
* ``nn_distance`` matches the CUDA extension
  ``utils/pytorch_structural_losses/nndistance.cu:8-160``: exact squared NN
  distance in both directions plus argmin indices, with a hand-written VJP
  (gradient ``2*g*(x - nn(x))`` scattered to both clouds).

TPU-first design notes: the O(N*M) distance matrix is produced by one einsum
that XLA tiles onto the MXU; fp32 accumulation with HIGHEST precision keeps
the <=1e-5 parity target vs the fp32 CUDA reference. A streaming Pallas
variant that never materialises the B,N,M matrix in HBM lives in
``hyperpocket_tpu.ops.pallas_nn`` (``nn_distance_pallas`` /
``chamfer_loss_auto``) — the training loss path dispatches to it on aligned
shapes; this module's ``nn_distance`` is always the pure-XLA form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def batch_pairwise_sqdist(x: jax.Array, y: jax.Array, *, precision=lax.Precision.HIGHEST) -> jax.Array:
    """Squared pairwise distances ``P[b, i, j] = |x[b,i] - y[b,j]|^2``.

    Uses the same ``|x|^2 + |y|^2 - 2 x.y`` expansion as the reference
    (``losses/champfer_loss.py:19-35``). Shapes: x (B, N, D), y (B, M, D)
    -> (B, N, M).
    """
    xx = jnp.sum(x * x, axis=-1)  # (B, N)
    yy = jnp.sum(y * y, axis=-1)  # (B, M)
    xy = jnp.einsum("bnd,bmd->bnm", x, y, precision=precision)
    return xx[..., :, None] + yy[..., None, :] - 2.0 * xy


def chamfer_loss(gts: jax.Array, preds: jax.Array) -> jax.Array:
    """Reference ChamferLoss: scalar sum over batch and points, both directions.

    ``loss = sum_j min_i P[b,i,j] + sum_i min_j P[b,i,j]`` summed over b,
    with ``P = batch_pairwise_sqdist(gts, preds)``
    (reference ``losses/champfer_loss.py:11-17``).
    """
    p = batch_pairwise_sqdist(gts, preds)
    loss_1 = jnp.sum(jnp.min(p, axis=1))
    loss_2 = jnp.sum(jnp.min(p, axis=2))
    return loss_1 + loss_2


def chamfer_per_cloud(x: jax.Array, y: jax.Array) -> jax.Array:
    """Per-cloud symmetric Chamfer: mean-of-min sqdist in both directions.

    Matches ``utils/metrics.py:79-107`` (``dist_chamfer`` + mean reduction):
    ``cd[b] = mean_i min_j P + mean_j min_i P``. Returns (B,).
    """
    p = batch_pairwise_sqdist(x, y)
    return jnp.mean(jnp.min(p, axis=2), axis=1) + jnp.mean(jnp.min(p, axis=1), axis=1)


# ---------------------------------------------------------------------------
# nn_distance with custom VJP (reference nndistance.cu semantics)
# ---------------------------------------------------------------------------


def _nn_forward(a: jax.Array, b: jax.Array):
    p = batch_pairwise_sqdist(a, b)
    dist1 = jnp.min(p, axis=2)
    idx1 = jnp.argmin(p, axis=2).astype(jnp.int32)
    dist2 = jnp.min(p, axis=1)
    idx2 = jnp.argmin(p, axis=1).astype(jnp.int32)
    return dist1, idx1, dist2, idx2


@jax.custom_vjp
def nn_distance(a: jax.Array, b: jax.Array):
    """Exact bidirectional NN squared distances and argmin indices.

    a: (B, N, 3), b: (B, M, 3) -> (dist1 (B,N), idx1 (B,N), dist2 (B,M),
    idx2 (B,M)). Mirrors the reference CUDA op ``nndistance.cu:8-133`` and the
    autograd wrapper ``utils/pytorch_structural_losses/nn_distance.py:6-41``.
    Only dist1/dist2 carry gradients (indices are integral).
    """
    return _nn_forward(a, b)


def _nn_fwd(a, b):
    dist1, idx1, dist2, idx2 = _nn_forward(a, b)
    return (dist1, idx1, dist2, idx2), (a, b, idx1, idx2)


def _scatter_add_points(idx: jax.Array, vals: jax.Array, n: int) -> jax.Array:
    """Per-cloud scatter-add of (K, 3) vals into (n, 3) rows at idx.

    On TPU this is a chunked one-hot matmul instead of ``.at[idx].add``:
    XLA's TPU scatter-add serializes updates (measured 22 ms for two
    B=256 N=2048 scatters vs 2.7 ms for the matmul form, which also stays
    flat in batch), while a (chunk, n) one-hot contraction rides the MXU.
    The replaced atomicAdd of the reference (nndistance.cu:146-151) has the
    same reassociation freedom, so ~1e-6-level sum-order differences are in
    -contract for the op.
    """
    k = idx.shape[0]
    chunk = min(256, k)
    if jax.default_backend() == "tpu" and k % chunk == 0:
        def body(c, acc):
            sl = lax.dynamic_slice_in_dim(idx, c * chunk, chunk)
            vv = lax.dynamic_slice_in_dim(vals, c * chunk, chunk)
            oh = jax.nn.one_hot(sl, n, dtype=vals.dtype)  # (chunk, n)
            return acc + oh.T @ vv

        init = jnp.zeros((n, vals.shape[-1]), vals.dtype)
        return lax.fori_loop(0, k // chunk, body, init)
    return jnp.zeros((n, vals.shape[-1]), vals.dtype).at[idx].add(vals)


def _gather_scatter_direction(a: jax.Array, b: jax.Array, idx: jax.Array,
                              g: jax.Array):
    """One direction of the NN gradient for one cloud pair.

    Returns ``(da_direct (K, 3), db_scatter (M, 3))`` where
    ``da_direct = 2 g (a - b[idx])`` and ``db_scatter`` accumulates
    ``-da_direct`` at ``idx`` (nndistance.cu:135-154).

    On TPU both the gather ``b[idx]`` and the scatter ride the MXU through
    chunked one-hot contractions: XLA's native gather/scatter of (B, K, 3)
    rows SERIALIZE (measured 4.0 ms per take_along_axis and 22 ms per
    scatter-add at B=256, K=M=2048, vs 2.0 ms per one-hot matmul). Fusing
    both into one loop builds each chunk's one-hot ONCE and contracts it
    twice — (chunk, M) @ (M, 3) for the gather, transposed against the
    chunk's gradient rows for the scatter.
    """
    k = idx.shape[0]
    m = b.shape[0]
    chunk = min(256, k)
    if jax.default_backend() == "tpu" and k % chunk == 0:
        def body(c, carry):
            da_acc, db_acc = carry
            sl = lax.dynamic_slice_in_dim(idx, c * chunk, chunk)
            oh = jax.nn.one_hot(sl, m, dtype=a.dtype)  # (chunk, M)
            b_part = oh @ b  # gather rows (chunk, 3)
            a_chunk = lax.dynamic_slice_in_dim(a, c * chunk, chunk)
            g_chunk = lax.dynamic_slice_in_dim(g, c * chunk, chunk)
            da = 2.0 * g_chunk[:, None] * (a_chunk - b_part)
            da_acc = lax.dynamic_update_slice_in_dim(da_acc, da, c * chunk, 0)
            return da_acc, db_acc - oh.T @ da

        init = (jnp.zeros_like(a), jnp.zeros((m, 3), a.dtype))
        return lax.fori_loop(0, k // chunk, body, init)
    b_part = jnp.take(b, idx, axis=0)
    da_direct = 2.0 * g[:, None] * (a - b_part)
    return da_direct, _scatter_add_points(idx, -da_direct, m)


def _nn_bwd(res, grads):
    a, b, idx1, idx2 = res
    g1, _, g2, _ = grads
    # Gradient of dist1 = |a_i - b_{idx1_i}|^2:
    #   d/da_i = 2 g1_i (a_i - b_{idx1_i});  d/db_{idx1_i} -= the same
    # (reference nndistance.cu:135-154, scatter with atomicAdd); dist2 is
    # the second kernel launch with the clouds swapped.
    da_direct, db_scatter = jax.vmap(_gather_scatter_direction)(a, b, idx1, g1)
    db_direct, da_scatter = jax.vmap(_gather_scatter_direction)(b, a, idx2, g2)
    return da_direct + da_scatter, db_direct + db_scatter


nn_distance.defvjp(_nn_fwd, _nn_bwd)


def directed_hausdorff(a: jax.Array, b: jax.Array) -> jax.Array:
    """Directed Hausdorff distance a -> b, per batch element.

    a: (B, N, 3), b: (B, M, 3) -> (B,). Matches the reference
    ``utils/evaluation/completeness.py:14-38`` (which takes (B, 3, N); here we
    use the natural (B, N, 3) layout): ``max_i min_j |a_i - b_j|``.
    """
    p = batch_pairwise_sqdist(a, b)
    shortest = jnp.sqrt(jnp.maximum(jnp.min(p, axis=2), 0.0))
    return jnp.max(shortest, axis=1)
