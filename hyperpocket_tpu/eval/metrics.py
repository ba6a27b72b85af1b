"""Generative point-cloud metrics (MMD/Coverage over CD & EMD, 1-NNA, JSD).

Reproduces reference ``utils/metrics.py`` (itself based on PointFlow):

* ``EMD_CD`` (metrics.py:86-118): paired CD (mean-of-min both directions) and
  normalised EMD between aligned sample/ref batches.
* ``pairwise_emd_cd`` (metrics.py:121-158): full N_sample x N_ref CD and EMD
  matrices, computed in ref-side chunks.
* ``mmd_cov`` (metrics.py:194-206): MMD(Fidelity) = mean over refs of the
  best sample distance; Coverage = fraction of refs that are some sample's
  argmin; ``mmd_smp`` = mean over samples of their best ref.
* ``knn`` (metrics.py:162-191): 1-NN two-sample accuracy (present in the
  reference but commented out of compute_all_metrics; kept for parity).
* JSD (metrics.py:246-359): occupancy-grid entropy on a 28^3 unit-cube grid,
  computed two ways and cross-checked.

TPU-first: CD/EMD matrices come from the jitted batched ops in
``hyperpocket_tpu.ops``; the host loop only chunks to bound HBM.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np
from scipy.stats import entropy

from hyperpocket_tpu.ops.emd import earth_mover_distance
from hyperpocket_tpu.ops.pallas_nn import chamfer_per_cloud_auto as _chamfer_per_cloud

# host loops call these per chunk — must be jitted (eager dispatch is
# pathologically slow over the axon tunnel)
chamfer_per_cloud = jax.jit(_chamfer_per_cloud)


def EMD_CD(sample_pcs, ref_pcs, batch_size: int, reduced: bool = True) -> dict:
    sample_pcs = jnp.asarray(sample_pcs)
    ref_pcs = jnp.asarray(ref_pcs)
    n_sample, n_ref = sample_pcs.shape[0], ref_pcs.shape[0]
    assert n_sample == n_ref, f"REF:{n_ref} SMP:{n_sample}"
    cd_list, emd_list = [], []
    for start in range(0, n_sample, batch_size):
        s = sample_pcs[start : start + batch_size]
        r = ref_pcs[start : start + batch_size]
        cd_list.append(chamfer_per_cloud(s, r))
        emd_list.append(earth_mover_distance(s, r))
    cd = jnp.concatenate(cd_list)
    emd = jnp.concatenate(emd_list)
    if reduced:
        cd, emd = jnp.mean(cd), jnp.mean(emd)
    return {"MMD-CD": cd, "MMD-EMD": emd}


def pairwise_emd_cd(sample_pcs, ref_pcs, batch_size: int,
                    row_block: int = 8) -> tuple[jax.Array, jax.Array]:
    """(N_sample, N_ref) CD and EMD matrices (reference _pairwise_EMD_CD_).

    The reference loops one sample row at a time against ref chunks
    (utils/metrics.py:121-158 — one CUDA launch per (row, chunk)); here
    ``row_block`` rows are flattened with each ref chunk into ONE
    (row_block*chunk)-pair dispatch. Per-pair values are unchanged (CD/EMD
    are per-cloud-pair independent), but the dispatch count drops by
    ``row_block`` — the difference between latency-bound and compute-bound
    over the axon tunnel's ~29 ms dispatch floor.
    """
    sample_pcs = jnp.asarray(sample_pcs)
    ref_pcs = jnp.asarray(ref_pcs)
    n_sample, n_ref = sample_pcs.shape[0], ref_pcs.shape[0]
    row_block = min(row_block, n_sample)
    batch_size = min(batch_size, n_ref)

    def _pad_to(x, n):
        # pad ragged tails by repeating the last cloud so EVERY dispatch is
        # the one compiled (row_block, batch_size) shape — fresh-shape Mosaic
        # compiles over the tunnel are erratic (up to ~10 min, CLAUDE.md);
        # the padded pairs' values are sliced away below
        if x.shape[0] == n:
            return x
        return jnp.concatenate(
            [x, jnp.broadcast_to(x[-1:], (n - x.shape[0],) + x.shape[1:])])

    rows_cd, rows_emd = [], []
    for i0 in range(0, n_sample, row_block):
        samp = _pad_to(sample_pcs[i0 : i0 + row_block], row_block)  # (R, P, 3)
        r = min(row_block, n_sample - i0)
        row_cd, row_emd = [], []
        for start in range(0, n_ref, batch_size):
            ref_chunk = _pad_to(ref_pcs[start : start + batch_size], batch_size)
            c = min(batch_size, n_ref - start)
            samp_exp = jnp.broadcast_to(
                samp[:, None], (row_block, batch_size) + samp.shape[1:]
            ).reshape((row_block * batch_size,) + samp.shape[1:])
            ref_exp = jnp.broadcast_to(
                ref_chunk[None], (row_block, batch_size) + ref_chunk.shape[1:]
            ).reshape((row_block * batch_size,) + ref_chunk.shape[1:])
            cd = chamfer_per_cloud(samp_exp, ref_exp).reshape(row_block, batch_size)
            emd = earth_mover_distance(samp_exp, ref_exp).reshape(row_block, batch_size)
            row_cd.append(cd[:r, :c])
            row_emd.append(emd[:r, :c])
        rows_cd.append(jnp.concatenate(row_cd, axis=1))
        rows_emd.append(jnp.concatenate(row_emd, axis=1))
    return jnp.concatenate(rows_cd, axis=0), jnp.concatenate(rows_emd, axis=0)


def _pair_ops_core(rows, cols, idx_r, idx_c):
    """CD + EMD for an explicit pair list: op(rows[idx_r[p]], cols[idx_c[p]]).

    Device-side gathers — rows/cols upload once per group, each chunk ships
    only two (pair_block,) index vectors. Argument order matters: the approx
    EMD is not symmetric, so per-pair values match the per-object loop only
    with the same (row, col) operand order.
    """
    a = jnp.take(rows, idx_r, axis=0)
    b = jnp.take(cols, idx_c, axis=0)
    return _chamfer_per_cloud(a, b), earth_mover_distance(a, b)


_pair_ops = jax.jit(_pair_ops_core)

# one compiled sharded pair-op per (mesh, shapes): meshes are hashable and
# eval drivers build exactly one, so a tiny cache suffices
_pair_ops_mesh_cache: dict = {}


def _pair_ops_mesh(mesh):
    """``_pair_ops`` data-parallel over ``mesh``'s data axis via shard_map.

    The per-pair CD/EMD kernels are pair-independent, so sharding the pair
    axis needs no collectives: rows/cols are replicated (they upload once per
    group and every shard gathers its own pairs), the index vectors and the
    per-pair outputs are split over ``DATA_AXIS``. shard_map (not sharded
    jit) so the Pallas kernels see ordinary per-device shapes — the SPMD
    partitioner has no sharding rule for custom calls.
    """
    fn = _pair_ops_mesh_cache.get(mesh)
    if fn is None:
        from jax.sharding import PartitionSpec as P

        from hyperpocket_tpu.parallel.mesh import DATA_AXIS
        from hyperpocket_tpu.parallel.point_sharding import shard_map

        dp = P(DATA_AXIS)
        # The varying-check must be off: the EMD op's lax.scan seeds its
        # carry with unvarying zeros, which trips the check even though the
        # computation is per-shard local (no collectives). The kwarg is
        # check_vma on jax >= 0.8's jax.shard_map; the experimental fallback
        # point_sharding may import on older jax spells it check_rep.
        specs = dict(mesh=mesh, in_specs=(P(), P(), dp, dp), out_specs=(dp, dp))
        try:
            fn = jax.jit(shard_map(_pair_ops_core, check_vma=False, **specs))
        except TypeError:
            fn = jax.jit(shard_map(_pair_ops_core, check_rep=False, **specs))
        _pair_ops_mesh_cache[mesh] = fn
    return fn


def pairwise_emd_cd_multi(row_pcs, col_sets, pair_block: int = 512, mesh=None):
    """(G, R, S) CD and EMD matrices: entry [g, i, j] = op(row_g_i, col_sets[g, j]).

    Flat-pair batching across OBJECTS (VERDICT r3 #3): evaluate_generativity
    needs an (R, S) matrix per object; per-object ``pairwise_emd_cd`` pays
    the ~29 ms dispatch floor per (row_block x chunk) tile per object. Here
    all G*R*S pairs are enumerated flat and dispatched in uniform
    ``pair_block`` chunks (last chunk padded, results sliced), with ONE
    device fetch for the whole group. Per-pair values are identical — the
    same jitted ops see the same operand pairs in the same order.

    ``row_pcs`` is either one shared (R, Q, 3) set (every object against the
    same rows — the M_rs case) or per-object (G, R, Q, 3) sets (the M_ss
    self-distance case).

    ``mesh`` (optional ``jax.sharding.Mesh`` with a data axis): shard each
    pair chunk over the mesh's data axis — the pairs are independent, so the
    matrix build is embarrassingly parallel (VERDICT r4 #6; the reference
    fanned exactly this out with Ray, utils/evaluation/completeness.py). The
    per-pair values are identical to the single-device path; the dryrun's
    [eval] stage certifies the equality on a virtual mesh.
    """
    if mesh is not None:
        from hyperpocket_tpu.parallel.mesh import DATA_AXIS

        n_shards = mesh.shape[DATA_AXIS]
        # uniform chunks must split evenly over the data axis
        pair_block = -(-pair_block // n_shards) * n_shards
        pair_fn = _pair_ops_mesh(mesh)
    else:
        pair_fn = _pair_ops
    col_sets = jnp.asarray(col_sets)
    G, S = col_sets.shape[:2]
    col_flat = col_sets.reshape((G * S,) + tuple(col_sets.shape[2:]))
    row_pcs = jnp.asarray(row_pcs)
    per_object_rows = row_pcs.ndim == 4
    if per_object_rows:
        R = row_pcs.shape[1]
        row_flat = row_pcs.reshape((G * R,) + tuple(row_pcs.shape[2:]))
    else:
        R = row_pcs.shape[0]
        row_flat = row_pcs
    n = G * R * S
    cd_chunks, emd_chunks = [], []
    for p0 in range(0, n, pair_block):
        idx = np.arange(p0, min(p0 + pair_block, n), dtype=np.int64)
        if idx.size < pair_block:
            idx = np.concatenate([idx, np.zeros(pair_block - idx.size, np.int64)])
        g, rem = np.divmod(idx, R * S)
        i, j = np.divmod(rem, S)
        r_idx = g * R + i if per_object_rows else i
        c, e = pair_fn(row_flat, col_flat,
                       jnp.asarray(r_idx, jnp.int32), jnp.asarray(g * S + j, jnp.int32))
        cd_chunks.append(c)
        emd_chunks.append(e)
    # one fetch for the whole group (per-leaf np.asarray is seconds per leaf
    # over the axon tunnel; each fetch pays a ~29 ms round-trip floor)
    cd, emd = jax.device_get((jnp.concatenate(cd_chunks), jnp.concatenate(emd_chunks)))
    return cd[:n].reshape(G, R, S), emd[:n].reshape(G, R, S)


def mmd_cov(all_dist: jax.Array) -> dict:
    """all_dist: (N_sample, N_ref) -> fidelity/coverage stats."""
    n_ref = all_dist.shape[1]
    min_val_fromsmp = jnp.min(all_dist, axis=1)
    min_idx = jnp.argmin(all_dist, axis=1)
    min_val = jnp.min(all_dist, axis=0)
    cov = float(np.unique(np.asarray(min_idx)).size) / float(n_ref)
    return {
        "mmd(Fidelity)": jnp.mean(min_val),
        "cov(Coverage)": jnp.asarray(cov),
        "mmd_smp": jnp.mean(min_val_fromsmp),
    }


def knn(mxx, mxy, myy, k: int, sqrt: bool = False) -> dict:
    """1-NN two-sample test stats (reference metrics.py:162-191)."""
    mxx, mxy, myy = jnp.asarray(mxx), jnp.asarray(mxy), jnp.asarray(myy)
    n0, n1 = mxx.shape[0], myy.shape[0]
    label = jnp.concatenate([jnp.ones(n0), jnp.zeros(n1)])
    m = jnp.concatenate(
        [jnp.concatenate([mxx, mxy], axis=1), jnp.concatenate([mxy.T, myy], axis=1)], axis=0
    )
    if sqrt:
        m = jnp.sqrt(jnp.abs(m))
    m = m + jnp.diag(jnp.full(n0 + n1, jnp.inf))
    # k smallest per column (torch .topk(k, 0, False))
    idx = jnp.argsort(m, axis=0)[:k]
    count = jnp.sum(label[idx], axis=0)
    pred = (count >= k / 2.0).astype(jnp.float32)
    tp = jnp.sum(pred * label)
    fp = jnp.sum(pred * (1 - label))
    fn = jnp.sum((1 - pred) * label)
    tn = jnp.sum((1 - pred) * (1 - label))
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "precision": tp / (tp + fp + 1e-10),
        "recall": tp / (tp + fn + 1e-10),
        "acc_t": tp / (tp + fn + 1e-10),
        "acc_f": tn / (tn + fp + 1e-10),
        "acc": jnp.mean((pred == label).astype(jnp.float32)),
    }


# Module-level so repeat callers (one per category in evaluate_generativity's
# 1-NNA path) share one compilation per matrix shape — a fresh jit(vmap(lambda))
# per call site defeats the cache, and new-callable compiles over the axon
# toolchain are erratic (CLAUDE.md).
knn_batch_1nna = jax.jit(jax.vmap(
    lambda mxx, mxy, myy: knn(mxx, mxy, myy, 1, sqrt=False),
    in_axes=(None, 0, 0),
))


def compute_all_metrics(sample_pcs, ref_pcs, batch_size: int) -> dict:
    """MMD/COV over CD & EMD (reference compute_all_metrics, metrics.py:209-238).

    Matches the reference's orientation: the pairwise matrix is computed as
    (ref, sample) then transposed before mmd_cov.
    """
    results = {}
    m_rs_cd, m_rs_emd = pairwise_emd_cd(ref_pcs, sample_pcs, batch_size)
    results.update({f"{k}-CD": v for k, v in mmd_cov(m_rs_cd.T).items()})
    results.update({f"{k}-EMD": v for k, v in mmd_cov(m_rs_emd.T).items()})
    return results


@jax.jit
def _mmd_cov_batch_core(all_dist):
    """Per-object mmd_cov reductions on stacked (G, S, R) matrices — same
    ops/axes as ``mmd_cov`` on each (S, R) slice, one dispatch per group."""
    min_val_fromsmp = jnp.min(all_dist, axis=2)
    min_idx = jnp.argmin(all_dist, axis=2)
    min_val = jnp.min(all_dist, axis=1)
    return jnp.mean(min_val, axis=1), jnp.mean(min_val_fromsmp, axis=1), min_idx


def compute_all_metrics_multi(sample_sets, ref_pcs, pair_block: int = 512,
                              mesh=None) -> list[dict]:
    """Per-object ``compute_all_metrics``, batched across objects.

    ``[g]`` equals ``compute_all_metrics(sample_sets[g], ref_pcs, ...)`` —
    same pairwise values (pairwise_emd_cd_multi), same mmd_cov reductions
    (one batched dispatch instead of per-object jnp round-trips).
    """
    m_cd, m_emd = pairwise_emd_cd_multi(ref_pcs, sample_sets, pair_block, mesh=mesh)
    return mmd_cov_multi(m_cd, m_emd)


def mmd_cov_multi(m_cd, m_emd) -> list[dict]:
    """mmd_cov over stacked per-object (R, S) CD/EMD matrices (callers that
    also need the raw matrices — e.g. the 1-NNA path — compute them once
    with ``pairwise_emd_cd_multi`` and reduce here)."""
    out: list[dict] = []
    stats = {}
    for tag, m in (("CD", m_cd), ("EMD", m_emd)):
        # mmd_cov receives the transposed (S, R) orientation, as in
        # compute_all_metrics: m[g] is (R, S) -> transpose to (G, S, R)
        stats[tag] = _mmd_cov_batch_core(jnp.asarray(m).transpose(0, 2, 1))
    # one fetch for all six leaves (vs six ~29 ms tunnel round-trips)
    stats = jax.device_get(stats)
    n_ref = m_cd.shape[1]
    for g in range(m_cd.shape[0]):
        res = {}
        for tag in ("CD", "EMD"):
            mmd, mmd_smp, min_idx = stats[tag]
            res[f"mmd(Fidelity)-{tag}"] = float(mmd[g])
            res[f"cov(Coverage)-{tag}"] = float(np.unique(min_idx[g]).size) / float(n_ref)
            res[f"mmd_smp-{tag}"] = float(mmd_smp[g])
        out.append(res)
    return out


# ---------------------------------------------------------------------------
# JSD via occupancy grids (reference metrics.py:246-359)
# ---------------------------------------------------------------------------


def unit_cube_grid_point_cloud(resolution: int, clip_sphere: bool = False):
    spacing = 1.0 / float(resolution - 1)
    ax = np.arange(resolution, dtype=np.float32) * spacing - 0.5
    grid = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), axis=-1).astype(np.float32)
    if clip_sphere:
        grid = grid.reshape(-1, 3)
        grid = grid[np.linalg.norm(grid, axis=1) <= 0.5]
    return grid, spacing


def entropy_of_occupancy_grid(pclouds, grid_resolution: int, in_sphere: bool = False,
                              verbose: bool = False):
    epsilon = 1e-3
    bound = 0.5 + epsilon
    pclouds = np.asarray(pclouds)
    if verbose and (abs(np.max(pclouds)) > bound or abs(np.min(pclouds)) > bound):
        warnings.warn("Point-clouds are not in unit cube.")
    if in_sphere and verbose and np.max(np.sqrt(np.sum(pclouds**2, axis=2))) > bound:
        warnings.warn("Point-clouds are not in unit sphere.")

    grid_coordinates, spacing = unit_cube_grid_point_cloud(grid_resolution, in_sphere)
    grid_coordinates = grid_coordinates.reshape(-1, 3)

    # Nearest grid cell analytically: the grid is REGULAR, so the nearest
    # full-grid point is coordinate-wise rounding — no KD-tree query per
    # cloud (the reference's per-cloud tree.query loop is the JSD wall at
    # real-dataset scale). With in_sphere the out-of-sphere cells are
    # removed from the grid; a point whose rounded cell was removed falls
    # back to a (single, batched) KD query over just those points — rounding
    # remains exact for every point whose rounded cell survives.
    res = grid_resolution
    if pclouds.dtype == object or pclouds.ndim != 3:
        # ragged cloud list: per-cloud KD loop (the reference's form)
        from scipy.spatial import cKDTree

        tree = cKDTree(grid_coordinates)
        grid_counters = np.zeros(len(grid_coordinates))
        grid_bernoulli_rvars = np.zeros(len(grid_coordinates))
        for pc in pclouds:
            _, indices = tree.query(pc)
            uniq, counts = np.unique(indices, return_counts=True)
            grid_counters[uniq] += counts
            grid_bernoulli_rvars[uniq] += 1
        return _finish_entropy(grid_counters, grid_bernoulli_rvars, len(pclouds))
    pts = pclouds.reshape(-1, 3)
    ijk = np.clip(np.rint((pts + 0.5) / spacing), 0, res - 1).astype(np.int64)
    full_flat = (ijk[:, 0] * res + ijk[:, 1]) * res + ijk[:, 2]
    if in_sphere:
        ax = np.arange(res, dtype=np.float32) * spacing - 0.5
        full_grid = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), axis=-1).reshape(-1, 3)
        kept = np.linalg.norm(full_grid, axis=1) <= 0.5
        full_to_kept = np.full(res**3, -1, dtype=np.int64)
        full_to_kept[kept] = np.arange(int(kept.sum()))
        indices_all = full_to_kept[full_flat]
        miss = indices_all < 0
        if miss.any():
            from scipy.spatial import cKDTree

            _, fb = cKDTree(grid_coordinates).query(pts[miss])
            indices_all[miss] = fb
    else:
        indices_all = full_flat
    indices_all = indices_all.reshape(pclouds.shape[0], pclouds.shape[1])

    grid_counters = np.zeros(len(grid_coordinates))
    grid_bernoulli_rvars = np.zeros(len(grid_coordinates))
    np.add.at(grid_counters, indices_all.ravel(), 1)
    # per-cloud occupancy: first occurrence per sorted row
    srt = np.sort(indices_all, axis=1)
    first = np.ones_like(srt, dtype=bool)
    first[:, 1:] = srt[:, 1:] != srt[:, :-1]
    np.add.at(grid_bernoulli_rvars, srt[first], 1)

    return _finish_entropy(grid_counters, grid_bernoulli_rvars, len(pclouds))


def _finish_entropy(grid_counters, grid_bernoulli_rvars, n_clouds: int):
    n = float(n_clouds)
    occupied = grid_bernoulli_rvars[grid_bernoulli_rvars > 0]
    # vectorized Bernoulli entropy: the reference loops scipy.stats.entropy
    # per occupied cell (metrics.py:283-287), ~0.5 ms of scipy overhead per
    # call x thousands of cells = seconds per JSD evaluation. Same formula:
    # H(p) = -(p ln p + (1-p) ln(1-p)), with 0 ln 0 := 0.
    p = occupied / n
    q = 1.0 - p
    with np.errstate(divide="ignore", invalid="ignore"):
        h = -(np.where(p > 0, p * np.log(p), 0.0)
              + np.where(q > 0, q * np.log(q), 0.0))
    acc_entropy = float(np.sum(h))
    return acc_entropy / len(grid_counters), grid_counters


def _jsdiv(p, q):
    def _kldiv(a, b):
        idx = np.logical_and(a > 0, b > 0)
        return np.sum(a[idx] * np.log2(a[idx] / b[idx]))

    p = p / np.sum(p)
    q = q / np.sum(q)
    m = 0.5 * (p + q)
    return 0.5 * (_kldiv(p, m) + _kldiv(q, m))


def jensen_shannon_divergence(p, q) -> float:
    p, q = np.asarray(p, dtype=np.float64), np.asarray(q, dtype=np.float64)
    if np.any(p < 0) or np.any(q < 0):
        raise ValueError("Negative values.")
    if len(p) != len(q):
        raise ValueError("Non equal size.")
    p_ = p / np.sum(p)
    q_ = q / np.sum(q)
    e1, e2 = entropy(p_, base=2), entropy(q_, base=2)
    e_sum = entropy((p_ + q_) / 2.0, base=2)
    res = e_sum - (e1 + e2) / 2.0
    res2 = _jsdiv(p_, q_)
    if not np.allclose(res, res2, atol=1e-4, rtol=0):
        warnings.warn("Numerical values of two JSD methods don't agree.")
    return float(res)


def jsd_between_point_cloud_sets(sample_pcs, ref_pcs=None, resolution: int = 28,
                                 ref_grid=None) -> float:
    """JSD between occupancy distributions. ``ref_grid`` (a precomputed
    ``entropy_of_occupancy_grid(ref_pcs, ...)[1]``) lets callers that compare
    many sample sets against ONE reference set (evaluate_generativity: every
    object vs the category population) skip recomputing the ref grid."""
    sample_grid = entropy_of_occupancy_grid(sample_pcs, resolution, True)[1]
    if ref_grid is None:
        if ref_pcs is None:
            raise ValueError("need ref_pcs or ref_grid")
        ref_grid = entropy_of_occupancy_grid(ref_pcs, resolution, True)[1]
    return jensen_shannon_divergence(sample_grid, ref_grid)
