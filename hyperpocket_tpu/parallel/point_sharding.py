"""Point-axis sharding for the distance ops: a ring over ICI.

The CP / ring-attention analogue for point clouds (SURVEY.md §5
"long-context"): when clouds outgrow one chip, shard the POINT axis of both
clouds over a mesh axis and rotate key shards around the ring with
``lax.ppermute``, merging running minima — the same streaming-min pattern
the Pallas NN kernel uses inside a chip (ops/pallas_nn.py), lifted to the
device mesh. XLA overlaps each hop's ICI transfer with the next local tile's
compute. The reference has no counterpart (single GPU, fixed 2048-pt clouds,
SURVEY §2 parallelism inventory); this is the framework's scaling extension.

Ring layout: queries ``a`` stay put; key shards ``b`` (and their own running
query-minima, which must see every ``a`` shard) travel together. After a full
cycle every ``a`` shard has met every ``b`` shard and the travelling minima
are back on their home devices.

Differentiability: the merges are ``jnp.where`` selects over ``jnp.min``
values, so ``jax.grad`` produces the exact NN subgradient through the ring
(``ppermute`` transposes to the reverse permutation); no custom VJP needed.

Tie-breaking: on exactly-equal distances the argmin keeps the first shard
*visited* (ring order), which may differ from the unsharded op's
lowest-global-index winner. Real float clouds never tie.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from hyperpocket_tpu.ops.chamfer import batch_pairwise_sqdist
from hyperpocket_tpu.parallel.mesh import DATA_AXIS


def nn_distance_point_sharded(a: jax.Array, b: jax.Array, mesh, axis: str = DATA_AXIS):
    """Bidirectional exact NN distance with BOTH point axes sharded.

    a (B, N, 3), b (B, M, 3); N and M must divide by ``mesh.shape[axis]``.
    Returns ``(dist1 (B, N), idx1, dist2 (B, M), idx2)`` — the same contract
    as ``ops.chamfer.nn_distance`` — with the point dimension of each output
    sharded over ``axis`` and indices global.
    """
    n_shards = int(mesh.shape[axis])
    if a.shape[1] % n_shards or b.shape[1] % n_shards:
        raise ValueError(
            f"point counts {a.shape[1]}/{b.shape[1]} must divide the "
            f"{n_shards}-way mesh axis {axis!r}"
        )
    cloud = P(None, axis, None)
    vec = P(None, axis)
    perm = [(i, (i + 1) % n_shards) for i in range(n_shards)]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(cloud, cloud),
        out_specs=(vec, vec, vec, vec),
    )
    def ring(al, bl):
        me = lax.axis_index(axis)
        n_local, m_local = al.shape[1], bl.shape[1]
        batch = al.shape[0]
        # the carries become device-varying after the first ppermute, so the
        # init values must carry the same varying-axis type
        def _vary(x):
            return lax.pcast(x, axis, to="varying")

        init = (
            bl,
            _vary(jnp.full((batch, m_local), jnp.inf, al.dtype)),  # travelling d2
            _vary(jnp.zeros((batch, m_local), jnp.int32)),         # travelling idx2
            _vary(jnp.full((batch, n_local), jnp.inf, al.dtype)),  # resident d1
            _vary(jnp.zeros((batch, n_local), jnp.int32)),         # resident idx1
        )

        def hop(t, carry):
            b_cur, d2_cur, i2_cur, d1_best, i1_best = carry
            owner = (me - t) % n_shards  # original shard of the visiting block
            p = batch_pairwise_sqdist(al, b_cur)  # (B, n_local, m_local)
            hop_d1 = jnp.min(p, axis=2)
            hop_i1 = jnp.argmin(p, axis=2).astype(jnp.int32) + owner * m_local
            take1 = hop_d1 < d1_best
            d1_best = jnp.where(take1, hop_d1, d1_best)
            i1_best = jnp.where(take1, hop_i1, i1_best)
            hop_d2 = jnp.min(p, axis=1)
            hop_i2 = jnp.argmin(p, axis=1).astype(jnp.int32) + me * n_local
            take2 = hop_d2 < d2_cur
            d2_cur = jnp.where(take2, hop_d2, d2_cur)
            i2_cur = jnp.where(take2, hop_i2, i2_cur)
            # rotate the key shard and its travelling minima one step; after
            # n_shards hops they are home again
            b_cur = lax.ppermute(b_cur, axis, perm)
            d2_cur = lax.ppermute(d2_cur, axis, perm)
            i2_cur = lax.ppermute(i2_cur, axis, perm)
            return b_cur, d2_cur, i2_cur, d1_best, i1_best

        _, d2, i2, d1, i1 = lax.fori_loop(0, n_shards, hop, init)
        return d1, i1, d2, i2

    return ring(a, b)


def chamfer_loss_point_sharded(gts: jax.Array, preds: jax.Array, mesh,
                               axis: str = DATA_AXIS) -> jax.Array:
    """Reference ChamferLoss semantics (scalar sum-of-min both directions)
    with the point axes ring-sharded; differentiable end-to-end."""
    d1, _, d2, _ = nn_distance_point_sharded(gts, preds, mesh, axis)
    return jnp.sum(d1) + jnp.sum(d2)
