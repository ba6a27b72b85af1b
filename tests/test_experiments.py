"""Experiments-mode smoke tests: train tiny model, run every experiment, check artifacts."""

import glob
import json
import os
from os.path import exists, join

import numpy as np
import pytest

from tests.test_data import CAT, make_synthetic_shapenet
from tests.test_train_integration import make_config


@pytest.fixture(scope="module")
def trained_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    results = tmp_path_factory.mktemp("results")
    make_synthetic_shapenet(root, n_models=6, n_gt=64, n_part=32)
    config = make_config(root, results, max_epoch=1)

    from hyperpocket_tpu.train.trainer import Trainer

    trainer = Trainer(config, use_mesh=False)
    trainer.run(plot_samples=False)
    return config, trainer


def _ctx_and_datasets(config):
    from hyperpocket_tpu.data import get_datasets

    _, _, test_dict = get_datasets(config["dataset"])
    return test_dict


def test_experiments_mode_end_to_end(trained_setup, tmp_path):
    config, trainer = trained_setup
    config = json.loads(json.dumps(config))
    config["mode"] = "experiments"
    config["experiments"] = {
        "epoch": "best_val",
        # exercises run_experiments' config-driven prior fitting (fits on
        # val missing halves via get_datasets)
        "latent_prior": {"max_items": 8, "batch_size": 4},
        "settings": {
            "fixed": {"execute": True, "mean": 0.0, "std": 0.05, "amount": 4,
                      "noises_per_item": 10, "batch_size": 2, "num_points": 64,
                      "noise_source": "empirical"},
            "compute_mmd_tmd_uhd": {"execute": True, "batch_size": 4},
            "same_model_different_slices": {"execute": False},
            "evaluate_generativity": {"execute": False},
            "temp_exp": {"execute": True},
        },
    }
    from hyperpocket_tpu.eval.experiments import run_experiments
    from hyperpocket_tpu.train.config import get_results_dir_path

    result_dir = get_results_dir_path(config, "experiments")
    os.makedirs(result_dir, exist_ok=True)
    run_experiments(config, result_dir)

    recs = sorted(glob.glob(join(result_dir, "fixed", "*_reconstruction.npy")))
    assert len(recs) == 10  # 1 test model x 10 noises
    first = np.load(recs[0])
    assert first.shape == (3, 64)  # (3, N) artifact layout, N matches gt size
    assert exists(join(result_dir, "fixed", "airplane_0_existing.npy"))

    res_files = glob.glob(join(result_dir, "compute_mmd_tmd_uhd", "*res.json"))
    assert len(res_files) == 1
    res = json.load(open(res_files[0]))
    assert set(res) == {"MMD * 1000", "UHD * 100", "TMD * 100"}
    assert all(np.isfinite(v) for v in res.values())


def test_empirical_latent_prior(trained_setup, tmp_path):
    """fit_latent_prior + noise_source='empirical': the fitted Gaussian's
    samples must reproduce its mean/covariance, and the experiments must run
    end-to-end with the empirical draw."""
    import jax

    from hyperpocket_tpu.eval.experiments import (
        ExperimentContext,
        evaluate_generativity,
        fixed,
    )
    from hyperpocket_tpu.eval.latent_stats import fit_latent_gaussian

    config, trainer = trained_setup
    rng = np.random.default_rng(11)
    # items shaped like real corpora: 1024-pt missing halves (EMD pairs them
    # with the 1024 lowest-y points of each 2048-pt completion)
    ds = [
        (
            (rng.standard_normal((32, 3)) * 0.3).astype(np.float32),
            (rng.standard_normal((1024, 3)) * 0.3).astype(np.float32),
            (rng.standard_normal((64, 3)) * 0.3).astype(np.float32),
            "airplane",
        )
        for _ in range(4)
    ]
    halves = np.stack([d[1] for d in ds])

    ctx = ExperimentContext(trainer.model, trainer.params, epoch=1, seed=5)
    with pytest.raises(ValueError, match="fit_latent_prior"):
        ctx.sample_noise(2, 0.0, 0.1, source="empirical")
    ctx.fit_latent_prior(halves, batch_size=4)

    prior = ctx.latent_prior
    draws = np.asarray(prior.sample(jax.random.key(0), 8192))
    cov = prior.scale_tril @ prior.scale_tril.T
    np.testing.assert_allclose(draws.mean(0), prior.mean, atol=0.05)
    got_cov = np.cov(draws.T)
    np.testing.assert_allclose(got_cov, cov, atol=0.08)

    # the fit itself: mean must equal the encoded-mu mean
    lg = fit_latent_gaussian(trainer.model, trainer.params, halves, batch_size=4)
    np.testing.assert_allclose(lg.mean, prior.mean, rtol=1e-5)

    fixed(ctx, {"airplane": ds}, str(tmp_path), 1, noises_per_item=2,
          batch_size=2, num_points=64, noise_source="empirical")
    recs = glob.glob(join(tmp_path, "fixed", "*reconstruction.npy"))
    assert len(recs) == 2 * len(ds)

    res = evaluate_generativity(
        ctx, {"airplane": ds}, str(tmp_path), 1, batch_size=2, std=0.05,
        dispatch_clouds=4, noise_source="empirical",
    )["airplane"]
    assert all(np.isfinite(v) for v in res.values())


def test_mmd_without_fixed_raises_clearly(tmp_path):
    """A config listing compute_mmd_tmd_uhd before fixed must fail with an
    actionable message, not an opaque np.stack error (run_experiments runs
    in config-settings order, reference core/main.py:184)."""
    from hyperpocket_tpu.eval.experiments import compute_mmd_tmd_uhd

    with pytest.raises(FileNotFoundError, match="'fixed' experiment must run first"):
        compute_mmd_tmd_uhd(None, {"chair": []}, str(tmp_path), 1)


def test_fixed_uses_gt_point_count(trained_setup):
    """fixed must emit 2048-pt clouds for real configs — here gt is 64 pts."""
    # covered by shape assert above; this guards the num_points plumbing
    config, trainer = trained_setup
    from hyperpocket_tpu.eval.experiments import ExperimentContext

    ctx = ExperimentContext(trainer.model, trainer.params, epoch=1)
    rec = ctx.complete(np.zeros((2, 32, 3), np.float32), ctx.sample_noise(2, 0.0, 0.05),
                       num_points=96)
    assert rec.shape == (2, 96, 3)


def test_same_model_different_slices(trained_setup, tmp_path):
    config, trainer = trained_setup
    from hyperpocket_tpu.data import get_datasets
    from hyperpocket_tpu.eval.experiments import ExperimentContext, same_model_different_slices

    test_dict = _ctx_and_datasets(config)
    ctx = ExperimentContext(trainer.model, trainer.params, epoch=1)
    same_model_different_slices(ctx, test_dict, str(tmp_path), 1, amount=1, slices_number=2,
                                slice_points=32)
    files = os.listdir(join(tmp_path, "same_model_different_slices"))
    assert any(f.endswith("_gt.npy") for f in files)
    # 2 slices x 2 halves x 3 artifacts + gt
    assert sum(f.endswith("_rec.npy") for f in files) == 4
    pcd = np.load(join(tmp_path, "same_model_different_slices",
                       [f for f in files if f.endswith("_f_pcd.npy")][0]))
    assert pcd.shape == (32, 3)  # half of the 64-pt synthetic gt... 1024 in prod


def test_merge_different_categories_requires_enough_models(trained_setup, tmp_path):
    config, trainer = trained_setup
    from hyperpocket_tpu.eval.experiments import ExperimentContext, merge_different_categories

    test_dict = _ctx_and_datasets(config)
    ctx = ExperimentContext(trainer.model, trainer.params, epoch=1)
    with pytest.raises(ValueError, match="max amount value"):
        merge_different_categories(ctx, {"car": test_dict["airplane"],
                                         "airplane": test_dict["airplane"]},
                                   str(tmp_path), 1, amount=10)


def test_encode_and_tsne_reduction(trained_setup, tmp_path):
    config, trainer = trained_setup
    from hyperpocket_tpu.eval.experiments import ExperimentContext, make_tsne_reduction

    test_dict = _ctx_and_datasets(config)
    ctx = ExperimentContext(trainer.model, trainer.params, epoch=1)

    import jax
    import jax.numpy as jnp

    latent, tnw = trainer.model.encode(
        trainer.params, jnp.zeros((2, 32, 3)), jnp.zeros((2, 32, 3)),
        jax.random.key(0), training=False,
    )
    assert latent.shape == (2, trainer.model.latent_size)
    assert tnw.shape == (2, trainer.model.flat_weight_count)

    make_tsne_reduction(ctx, test_dict, str(tmp_path), 1, amount=6)
    out = os.listdir(join(tmp_path, "temp_exp"))
    assert "airplane_latent_tsne.npy" in out and "airplane_tnw_tsne.npy" in out
    emb = np.load(join(tmp_path, "temp_exp", "airplane_latent_tsne.npy"))
    assert emb.shape == (2 * min(6, len(test_dict["airplane"])), 2)


def _hash_dir(path):
    import hashlib

    h = hashlib.sha256()
    for name in sorted(os.listdir(path)):
        h.update(name.encode())
        with open(join(path, name), "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()


def test_same_model_different_slices_reproducible(trained_setup, tmp_path):
    """Two runs with the same ctx seed must produce identical artifacts
    (the reference seeds RNGs before the experiments mode switch,
    core/main.py:28; round-1 used unseeded global np.random here)."""
    config, trainer = trained_setup
    from hyperpocket_tpu.eval.experiments import ExperimentContext, same_model_different_slices

    test_dict = _ctx_and_datasets(config)
    digests = []
    for run in ("a", "b"):
        ctx = ExperimentContext(trainer.model, trainer.params, epoch=1, seed=123)
        out = tmp_path / run
        os.makedirs(out)
        same_model_different_slices(ctx, test_dict, str(out), 1, amount=2,
                                    slices_number=2, slice_points=32)
        digests.append(_hash_dir(join(out, "same_model_different_slices")))
    assert digests[0] == digests[1]


def test_merge_different_categories_reproducible(trained_setup, tmp_path):
    config, trainer = trained_setup
    from hyperpocket_tpu.eval.experiments import ExperimentContext, merge_different_categories

    test_dict = _ctx_and_datasets(config)
    digests = []
    for run in ("a", "b"):
        ctx = ExperimentContext(trainer.model, trainer.params, epoch=1, seed=321)
        out = tmp_path / run
        os.makedirs(out)
        merge_different_categories(ctx, {"car": test_dict["airplane"],
                                         "airplane": test_dict["airplane"]},
                                   str(out), 1, amount=1, split_points=32)
        digests.append(_hash_dir(join(out, "merge_different_categories")))
    assert digests[0] == digests[1]


def test_evaluate_generativity_matches_loop_form(trained_setup, tmp_path):
    """The batched pipeline must reproduce the reference-shaped per-object
    loop (core/experiments.py:63-104) exactly: same ctx key consumption
    order, same per-object metric SUMS (quirk preserved), same JSD."""
    import jax.numpy as jnp

    from hyperpocket_tpu.eval.experiments import ExperimentContext, evaluate_generativity
    from hyperpocket_tpu.eval.metrics import compute_all_metrics, jsd_between_point_cloud_sets

    config, trainer = trained_setup
    rng = np.random.default_rng(9)
    n_obj = 5
    # missing parts are 1024-pt (EMD pairs them with the 1024 lowest-y
    # points of each 2048-pt completion, as on the real datasets)
    ds = [
        (
            (rng.standard_normal((32, 3)) * 0.3).astype(np.float32),
            (rng.standard_normal((1024, 3)) * 0.3).astype(np.float32),
            (rng.standard_normal((64, 3)) * 0.3).astype(np.float32),
            "airplane",
        )
        for _ in range(n_obj)
    ]
    batch_size = 2  # n_gen=5 -> blocks of 2,2,1 per object (exercises tails)

    # batched implementation under test
    ctx = ExperimentContext(trainer.model, trainer.params, epoch=1, seed=123)
    got = evaluate_generativity(
        ctx, {"airplane": ds}, str(tmp_path / "batched"), 1,
        batch_size=batch_size, std=0.05, dispatch_clouds=6,
    )["airplane"]

    # loop-form spec: the reference's structure, one dispatch per block
    ctx2 = ExperimentContext(trainer.model, trainer.params, epoch=1, seed=123)
    cat_gt = np.stack([d[1] for d in ds])
    expected: dict[str, float] = {}
    for obj_idx in range(n_obj):
        existing = ds[obj_idx][0][None]
        recs = []
        for start in range(0, n_obj, batch_size):
            b = min(batch_size, n_obj - start)
            noise = ctx2.sample_noise(b, 0.0, 0.05)
            rec = ctx2.complete(np.repeat(existing, b, axis=0), noise)
            for pc in rec:
                order = np.argsort(pc[:, 1])[:1024]
                recs.append(pc[order])
        obj_recs = np.stack(recs)
        for k, v in compute_all_metrics(obj_recs, cat_gt, batch_size).items():
            expected[k] = expected.get(k, 0.0) + float(v)
        expected["jsd"] = expected.get("jsd", 0.0) + jsd_between_point_cloud_sets(
            obj_recs, cat_gt
        )

    assert set(got) == set(expected)
    for k in expected:
        assert got[k] == pytest.approx(expected[k], rel=1e-5, abs=1e-7), (
            k, got[k], expected[k]
        )


def test_evaluate_generativity_1nna_flag(trained_setup, tmp_path):
    """include_1nna adds the reference's commented-out 1-NN accuracy keys
    (utils/metrics.py:224-237) without perturbing the parity keys: the same
    ctx/key stream yields identical base metrics with the flag on and off."""
    from hyperpocket_tpu.eval.experiments import ExperimentContext, evaluate_generativity

    config, trainer = trained_setup
    rng = np.random.default_rng(11)
    ds = [
        (
            (rng.standard_normal((32, 3)) * 0.3).astype(np.float32),
            (rng.standard_normal((1024, 3)) * 0.3).astype(np.float32),
            (rng.standard_normal((64, 3)) * 0.3).astype(np.float32),
            "airplane",
        )
        for _ in range(4)
    ]

    ctx = ExperimentContext(trainer.model, trainer.params, epoch=1, seed=77)
    base = evaluate_generativity(
        ctx, {"airplane": ds}, str(tmp_path / "off"), 1,
        batch_size=2, std=0.05, dispatch_clouds=4,
    )["airplane"]
    assert not any("1-NN" in k for k in base)

    ctx2 = ExperimentContext(trainer.model, trainer.params, epoch=1, seed=77)
    with_nna = evaluate_generativity(
        ctx2, {"airplane": ds}, str(tmp_path / "on"), 1,
        batch_size=2, std=0.05, dispatch_clouds=4, include_1nna=True,
    )["airplane"]

    for k, v in base.items():
        assert with_nna[k] == pytest.approx(v, rel=1e-6), k
    nna_keys = [k for k in with_nna if k.startswith("1-NN-")]
    assert {f"1-NN-{t}-{a}" for t in ("CD", "EMD")
            for a in ("acc", "acc_t", "acc_f")} <= set(nna_keys)
    # per-object accuracies in [0, 1], summed over 4 objects
    for k in nna_keys:
        assert 0.0 <= with_nna[k] <= 4.0 + 1e-6, (k, with_nna[k])


def test_evaluate_generativity_parallel_data(trained_setup, tmp_path):
    """experiments settings key parallel_data=N shards the pairwise matrix
    builds over an N-way data mesh (VERDICT r4 #6) without changing any
    reported value: same ctx/key stream -> identical per-category sums."""
    from hyperpocket_tpu.eval.experiments import ExperimentContext, evaluate_generativity

    config, trainer = trained_setup
    rng = np.random.default_rng(13)
    ds = [
        (
            (rng.standard_normal((32, 3)) * 0.3).astype(np.float32),
            (rng.standard_normal((1024, 3)) * 0.3).astype(np.float32),
            (rng.standard_normal((64, 3)) * 0.3).astype(np.float32),
            "airplane",
        )
        for _ in range(4)
    ]

    ctx = ExperimentContext(trainer.model, trainer.params, epoch=1, seed=55)
    base = evaluate_generativity(
        ctx, {"airplane": ds}, str(tmp_path / "single"), 1,
        batch_size=2, std=0.05, dispatch_clouds=4, include_1nna=True,
    )["airplane"]

    ctx2 = ExperimentContext(trainer.model, trainer.params, epoch=1, seed=55)
    sharded = evaluate_generativity(
        ctx2, {"airplane": ds}, str(tmp_path / "mesh"), 1,
        batch_size=2, std=0.05, dispatch_clouds=4, include_1nna=True,
        parallel_data=8,
    )["airplane"]

    assert set(base) == set(sharded)
    for k, v in base.items():
        assert sharded[k] == pytest.approx(v, rel=1e-6, abs=1e-9), k
