"""Metrics vs brute-force numpy oracles."""

import numpy as np
import pytest

from hyperpocket_tpu.eval.metrics import (
    EMD_CD,
    compute_all_metrics,
    jensen_shannon_divergence,
    jsd_between_point_cloud_sets,
    knn,
    mmd_cov,
    pairwise_emd_cd,
    unit_cube_grid_point_cloud,
)


def brute_cd(a, b):
    d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return d.min(1).mean() + d.min(0).mean()


@pytest.fixture
def sets():
    rng = np.random.default_rng(0)
    sample = (rng.standard_normal((6, 64, 3)) * 0.2).astype(np.float32)
    ref = (rng.standard_normal((5, 64, 3)) * 0.2).astype(np.float32)
    return sample, ref


def test_pairwise_cd_matrix(sets):
    sample, ref = sets
    cd, emd = pairwise_emd_cd(sample, ref, batch_size=3)
    assert cd.shape == (6, 5) and emd.shape == (6, 5)
    for i in range(6):
        for j in range(5):
            assert float(cd[i, j]) == pytest.approx(brute_cd(sample[i], ref[j]), rel=1e-4)
    assert np.all(np.asarray(emd) > 0)


def test_mmd_cov_oracle(sets):
    sample, ref = sets
    d = np.random.default_rng(1).random((6, 5)).astype(np.float32)
    out = mmd_cov(d)
    assert float(out["mmd(Fidelity)"]) == pytest.approx(d.min(0).mean(), rel=1e-6)
    assert float(out["mmd_smp"]) == pytest.approx(d.min(1).mean(), rel=1e-6)
    assert float(out["cov(Coverage)"]) == pytest.approx(len(np.unique(d.argmin(1))) / 5)


def test_compute_all_metrics_keys_and_selfmatch(sets):
    sample, _ = sets
    out = compute_all_metrics(sample, sample, batch_size=3)
    assert set(out) == {
        "mmd(Fidelity)-CD", "cov(Coverage)-CD", "mmd_smp-CD",
        "mmd(Fidelity)-EMD", "cov(Coverage)-EMD", "mmd_smp-EMD",
    }
    # identical sets: every ref matched (cov=1), fidelity ~0 for CD
    assert float(out["cov(Coverage)-CD"]) == 1.0
    assert float(out["mmd(Fidelity)-CD"]) < 1e-6


def test_emd_cd_paired(sets):
    sample, _ = sets
    out = EMD_CD(sample, sample, batch_size=4)
    assert float(out["MMD-CD"]) < 1e-6
    assert float(out["MMD-EMD"]) < 0.02  # approximate EMD residual


def test_knn_separated_clusters():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((8, 16, 3)).astype(np.float32)
    y = x + 100.0
    dxx = ((x[:, None] - x[None]) ** 2).sum((-1, -2))
    dyy = ((y[:, None] - y[None]) ** 2).sum((-1, -2))
    dxy = ((x[:, None] - y[None]) ** 2).sum((-1, -2))
    out = knn(dxx, dxy, dyy, k=1)
    assert float(out["acc"]) == 1.0  # perfectly separable -> 1-NNA = 1


def test_unit_cube_grid():
    grid, spacing = unit_cube_grid_point_cloud(5)
    assert grid.shape == (5, 5, 5, 3)
    assert spacing == pytest.approx(0.25)
    assert grid.min() == -0.5 and grid.max() == 0.5
    clipped, _ = unit_cube_grid_point_cloud(5, clip_sphere=True)
    assert np.all(np.linalg.norm(clipped, axis=1) <= 0.5)


def test_jsd_identical_zero_and_symmetry():
    rng = np.random.default_rng(3)
    a = (rng.random((4, 128, 3)) - 0.5).astype(np.float32) * 0.8
    b = (rng.random((4, 128, 3)) - 0.5).astype(np.float32) * 0.8
    assert jsd_between_point_cloud_sets(a, a) == pytest.approx(0.0, abs=1e-9)
    jab = jsd_between_point_cloud_sets(a, b)
    jba = jsd_between_point_cloud_sets(b, a)
    assert jab == pytest.approx(jba, rel=1e-6)
    assert 0 < jab <= 1.0


def test_jsd_validates():
    with pytest.raises(ValueError):
        jensen_shannon_divergence(np.array([-1.0, 2.0]), np.array([1.0, 1.0]))
    with pytest.raises(ValueError):
        jensen_shannon_divergence(np.array([1.0]), np.array([0.5, 0.5]))


def test_uhd_tmd_empty_fixed_dir_is_actionable(tmp_path):
    """An empty fixed/ raises a named error, not max()-of-empty (ADVICE r4)."""
    from hyperpocket_tpu.eval.evaluation import tmd_process, uhd_process

    with pytest.raises(FileNotFoundError, match="reconstruction"):
        uhd_process(str(tmp_path))
    with pytest.raises(FileNotFoundError, match=str(tmp_path)):
        tmd_process(str(tmp_path))


def test_evaluation_uhd_tmd_mmd(tmp_path):
    """Synthetic fixed/ dir: identical completions -> TMD 0; subset existing -> UHD 0."""
    from hyperpocket_tpu.eval.evaluation import mmd_process, tmd_process, uhd_process

    rng = np.random.default_rng(4)
    n_obj, k = 2, 10
    for i in range(n_obj):
        cloud = (rng.standard_normal((64, 3)) * 0.2).astype(np.float32)
        for j in range(k):
            np.save(tmp_path / f"cat_{i}_{j}_reconstruction.npy", cloud.T)
        np.save(tmp_path / f"cat_{i}_existing.npy", cloud[:32].T)

    assert tmd_process(str(tmp_path)) == pytest.approx(0.0, abs=1e-6)
    # sqrt of the ~1e-8 fp32 residual of the |x|^2+|y|^2-2xy expansion
    assert uhd_process(str(tmp_path)) == pytest.approx(0.0, abs=1e-3)

    class DS:
        def __init__(self):
            self.items = [(None, None, (rng.standard_normal((64, 3)) * 0.2).astype(np.float32), i)
                          for i in range(3)]

        def __iter__(self):
            return iter(self.items)

    mmd = mmd_process(str(tmp_path), DS(), batch_size=8)
    assert mmd > 0


def test_batched_process_fns_match_per_loop_oracles(tmp_path):
    """The pair-blocked MMD and one-dispatch UHD/TMD must equal the original
    per-(ref,chunk)/per-object host loops float-for-float."""
    import glob
    from os.path import join

    import jax
    import jax.numpy as jnp

    from hyperpocket_tpu.eval.evaluation import (
        chamfer_per_cloud, directed_hausdorff, minimum_matching_distance,
        nn_distance, tmd_process, uhd_process,
    )

    rng = np.random.default_rng(42)
    n_ref, n_s, npts = 5, 11, 64
    refs = (rng.standard_normal((n_ref, npts, 3)) * 0.3).astype(np.float32)
    smps = (rng.standard_normal((n_s, npts, 3)) * 0.3).astype(np.float32)

    # oracle: the original per-ref/per-chunk loop
    def oracle_mmd(sample_pcs, ref_pcs, batch_size):
        sample_pcs = jnp.asarray(sample_pcs)
        matched = []
        for i in range(ref_pcs.shape[0]):
            ref = jnp.asarray(ref_pcs[i])
            best = min(
                float(jnp.min(
                    jnp.mean(d[0], axis=1) + jnp.mean(d[2], axis=1)
                ))
                for s in range(0, sample_pcs.shape[0], batch_size)
                for d in [nn_distance(
                    jnp.broadcast_to(ref[None], (sample_pcs[s:s+batch_size].shape[0],) + ref.shape),
                    sample_pcs[s:s+batch_size],
                )]
            )
            matched.append(best)
        return float(np.mean(matched))

    got, per_ref = minimum_matching_distance(smps, refs, batch_size=4)
    assert got == pytest.approx(oracle_mmd(smps, refs, 4), rel=1e-6)
    assert len(per_ref) == n_ref

    # uhd/tmd: build a fake fixed/ dir and compare against per-object loops
    group, n_obj = 3, 4
    for o in range(n_obj):
        ex = (rng.standard_normal((npts, 3)) * 0.3).astype(np.float32)
        np.save(join(tmp_path, f"{o:03d}_existing.npy"), ex.T)
        for g in range(group):
            rec = (rng.standard_normal((npts, 3)) * 0.3).astype(np.float32)
            np.save(join(tmp_path, f"{o:03d}_{g}_reconstruction.npy"), rec.T)

    gen_paths = sorted(glob.glob(join(tmp_path, "*reconstruction.npy")))
    gen = np.asarray([[np.load(gen_paths[i * group + j]).T for j in range(group)]
                      for i in range(n_obj)], dtype=np.float32)
    ex_paths = sorted(glob.glob(join(tmp_path, "*existing.npy")))
    existing = np.asarray([np.load(p).T for p in ex_paths], dtype=np.float32)

    uhd_oracle = float(np.mean([
        float(jnp.mean(directed_hausdorff(
            jnp.broadcast_to(jnp.asarray(existing[i])[None], gen[i].shape[:1] + existing[i].shape),
            jnp.asarray(gen[i]),
        ))) for i in range(n_obj)
    ]))
    assert uhd_process(str(tmp_path), group=group) == pytest.approx(uhd_oracle, rel=1e-6)

    ii, jj = np.triu_indices(group, 1)
    tmd_oracle = float(np.mean([
        float(jnp.sum(chamfer_per_cloud(jnp.asarray(gen[i][ii]), jnp.asarray(gen[i][jj])))
              * 2.0 / (group - 1))
        for i in range(n_obj)
    ]))
    assert tmd_process(str(tmp_path), group=group) == pytest.approx(tmd_oracle, rel=1e-6)


def test_pairwise_row_block_invariant(sets):
    """Row-blocking changes dispatch granularity, never values."""
    sample, ref = sets
    cd1, emd1 = pairwise_emd_cd(sample, ref, batch_size=3, row_block=1)
    cd4, emd4 = pairwise_emd_cd(sample, ref, batch_size=3, row_block=4)
    np.testing.assert_allclose(np.asarray(cd4), np.asarray(cd1), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(emd4), np.asarray(emd1), rtol=1e-6, atol=1e-7)


def test_entropy_grid_fast_path_matches_kdtree():
    """The analytic nearest-cell path must reproduce the reference's
    KD-tree-per-cloud scan (utils/metrics.py:264-287) exactly."""
    from scipy.spatial import cKDTree

    from hyperpocket_tpu.eval.metrics import entropy_of_occupancy_grid

    rng = np.random.default_rng(5)
    clouds = (rng.uniform(-0.55, 0.55, size=(7, 128, 3))).astype(np.float32)
    for in_sphere in (False, True):
        ent, counters = entropy_of_occupancy_grid(clouds, 28, in_sphere)
        grid, _ = unit_cube_grid_point_cloud(28, in_sphere)
        tree = cKDTree(grid.reshape(-1, 3))
        exp_counters = np.zeros(len(grid.reshape(-1, 3)))
        exp_bern = np.zeros_like(exp_counters)
        for pc in clouds:
            _, idx = tree.query(pc)
            uniq, counts = np.unique(idx, return_counts=True)
            exp_counters[uniq] += counts
            exp_bern[uniq] += 1
        np.testing.assert_array_equal(counters, exp_counters)
        # entropy recompute from the oracle occupancy
        occ = exp_bern[exp_bern > 0] / 7.0
        h = -(occ * np.log(occ) + (1 - occ) * np.log(1 - occ))
        h[~np.isfinite(h)] = 0.0
        assert ent == pytest.approx(float(h.sum()) / len(exp_counters), rel=1e-9)


def test_entropy_grid_ragged_fallback():
    rng = np.random.default_rng(6)
    clouds = [rng.uniform(-0.4, 0.4, size=(n, 3)).astype(np.float32) for n in (50, 70)]
    import numpy as _np

    arr = _np.empty(2, dtype=object)
    arr[0], arr[1] = clouds
    ent, counters = __import__("hyperpocket_tpu.eval.metrics", fromlist=["x"]).entropy_of_occupancy_grid(arr, 16, True)
    assert np.isfinite(ent) and counters.sum() == 120


def test_jsd_ref_grid_param(sets):
    from hyperpocket_tpu.eval.metrics import entropy_of_occupancy_grid

    sample, ref = sets
    ref_grid = entropy_of_occupancy_grid(ref, 28, True)[1]
    full = jsd_between_point_cloud_sets(sample, ref)
    cached = jsd_between_point_cloud_sets(sample, ref_grid=ref_grid)
    assert cached == pytest.approx(full, abs=1e-12)


def test_compute_all_metrics_multi_matches_loop():
    """Object-batched metrics == per-object compute_all_metrics (VERDICT r3
    #3): same pairwise values, same reductions, pad-tail chunks exercised."""
    from hyperpocket_tpu.eval.metrics import compute_all_metrics_multi

    rng = np.random.default_rng(3)
    G, S, R = 3, 4, 5
    samples = (rng.standard_normal((G, S, 48, 3)) * 0.2).astype(np.float32)
    refs = (rng.standard_normal((R, 48, 3)) * 0.2).astype(np.float32)
    multi = compute_all_metrics_multi(samples, refs, pair_block=7)
    assert len(multi) == G
    for g in range(G):
        want = compute_all_metrics(samples[g], refs, batch_size=2)
        assert set(multi[g]) == set(want)
        for k in want:
            assert multi[g][k] == pytest.approx(float(want[k]), rel=1e-5, abs=1e-7), k


def test_pairwise_multi_per_object_rows():
    """(G, R, Q, 3) per-object rows (the M_ss self-distance case) match the
    per-object pairwise_emd_cd matrices."""
    from hyperpocket_tpu.eval.metrics import pairwise_emd_cd_multi

    rng = np.random.default_rng(4)
    G, S = 3, 4
    sets_ = (rng.standard_normal((G, S, 48, 3)) * 0.2).astype(np.float32)
    m_cd, m_emd = pairwise_emd_cd_multi(sets_, sets_, pair_block=5)
    for g in range(G):
        cd_g, emd_g = pairwise_emd_cd(sets_[g], sets_[g], batch_size=3)
        np.testing.assert_allclose(m_cd[g], np.asarray(cd_g), rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(m_emd[g], np.asarray(emd_g), rtol=1e-5, atol=1e-7)


def test_pairwise_multi_mesh_matches_single():
    """VERDICT r4 #6: the pairwise matrix build sharded over an 8-way data
    mesh is bit-identical to the single-device path — the pairs are
    independent, sharding only re-tiles the dispatch. Covers the shared-rows
    (M_rs), per-object-rows (M_ss) and pad-tail (pair_block not dividing
    G*R*S) cases, plus pair_block rounding to a mesh multiple."""
    from hyperpocket_tpu.eval.metrics import pairwise_emd_cd_multi
    from hyperpocket_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(8)
    G, R, S, Q = 3, 6, 5, 48
    rows = (rng.standard_normal((R, Q, 3)) * 0.2).astype(np.float32)
    cols = (rng.standard_normal((G, S, Q, 3)) * 0.2).astype(np.float32)
    mesh = make_mesh(8, 1)

    # pair_block=10 is not a multiple of 8: the mesh path must round up
    # to 16 and still slice the pad away
    cd0, emd0 = pairwise_emd_cd_multi(rows, cols, pair_block=10)
    cd1, emd1 = pairwise_emd_cd_multi(rows, cols, pair_block=10, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(cd0), np.asarray(cd1))
    np.testing.assert_array_equal(np.asarray(emd0), np.asarray(emd1))

    rows_po = (rng.standard_normal((G, R, Q, 3)) * 0.2).astype(np.float32)
    a_cd, a_emd = pairwise_emd_cd_multi(rows_po, cols, pair_block=16)
    b_cd, b_emd = pairwise_emd_cd_multi(rows_po, cols, pair_block=16, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(a_cd), np.asarray(b_cd))
    np.testing.assert_array_equal(np.asarray(a_emd), np.asarray(b_emd))
