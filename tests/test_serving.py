"""Serving export (hyperpocket_tpu/serving.py): jax.export roundtrip + CLI."""

from __future__ import annotations

import json
import sys
from os.path import exists, join

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")
from test_train_integration import make_config  # noqa: E402

from hyperpocket_tpu import serving
from hyperpocket_tpu.models.full_model import FullModel
from hyperpocket_tpu.train import checkpoint as ckpt
from hyperpocket_tpu.train.config import get_results_dir_path

B, N_EXIST, N_OUT = 2, 64, 128


def _tiny_model():
    cfg = make_config("/none", "/none")["full_model"]
    model = FullModel.from_config(cfg)
    params = model.init(jax.random.key(0))
    return model, params


def test_export_roundtrip_matches_direct_apply(tmp_path):
    model, params = _tiny_model()
    data = serving.export_completion(
        model, params, batch=B, n_existing=N_EXIST, num_output_points=N_OUT,
        epoch=50.0)
    assert isinstance(data, bytes) and len(data) > 1000

    f = serving.load_completion(data)
    existing = np.random.default_rng(0).normal(size=(B, N_EXIST, 3)).astype(np.float32) * 0.3
    noise = np.random.default_rng(1).normal(size=(B, model.get_noise_size())).astype(np.float32)
    seed = np.uint32(7)
    out = np.asarray(f(existing, noise, seed))
    assert out.shape == (B, N_OUT, 3)

    direct = serving.make_serving_fn(model, params, num_output_points=N_OUT,
                                     epoch=50.0)
    ref = np.asarray(direct(jnp.asarray(existing), jnp.asarray(noise),
                            jnp.asarray(seed)))
    np.testing.assert_allclose(out, ref, atol=1e-6)

    # deterministic under a fixed seed; different seeds move the ball points
    again = np.asarray(f(existing, noise, seed))
    np.testing.assert_array_equal(out, again)
    other = np.asarray(f(existing, noise, np.uint32(8)))
    assert np.abs(other - out).max() > 0


def test_data_parallel_export_matches_single_device():
    # conftest provides 8 virtual CPU devices; the DP artifact must return
    # batch-sharded output identical to the unsharded serving fn.
    model, params = _tiny_model()
    n_dp, batch = 8, 8
    data = serving.export_completion(
        model, params, batch=batch, n_existing=N_EXIST,
        num_output_points=N_OUT, epoch=50.0, data_parallel=n_dp)
    f = serving.load_completion(data)

    rng = np.random.default_rng(2)
    existing = rng.normal(size=(batch, N_EXIST, 3)).astype(np.float32) * 0.3
    noise = rng.normal(size=(batch, model.get_noise_size())).astype(np.float32)
    seed = np.uint32(3)

    mesh = serving._dp_mesh(n_dp)
    from jax.sharding import NamedSharding, PartitionSpec as P

    ex_s = jax.device_put(jnp.asarray(existing), NamedSharding(mesh, P("data")))
    no_s = jax.device_put(jnp.asarray(noise), NamedSharding(mesh, P("data")))
    out = f(ex_s, no_s, jnp.asarray(seed))
    assert len(out.sharding.device_set) == n_dp

    # exact vs the sharded jit (same computation as the artifact) ...
    sharded = serving.make_serving_fn(model, params, num_output_points=N_OUT,
                                      epoch=50.0, mesh=mesh)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(sharded(ex_s, no_s, jnp.asarray(seed))))
    # ... and within fp32 reduction-order noise of the single-device fn
    # (partitioned matmul reductions reassociate; observed ~4e-5 on O(10)
    # outputs)
    single = serving.make_serving_fn(model, params, num_output_points=N_OUT,
                                     epoch=50.0)
    ref = np.asarray(single(jnp.asarray(existing), jnp.asarray(noise),
                            jnp.asarray(seed)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4)


def test_data_parallel_batch_divisibility():
    model, params = _tiny_model()
    with pytest.raises(ValueError, match="not divisible"):
        serving.export_completion(model, params, batch=3, n_existing=N_EXIST,
                                  num_output_points=N_OUT, data_parallel=2)


def test_cli_exports_from_checkpoint(tmp_path, capsys):
    config = make_config(tmp_path / "data", tmp_path / "results")
    model = FullModel.from_config(config["full_model"])
    params = model.init(jax.random.key(config["setup"]["seed"]))

    # stage a checkpoint in the exact training-results layout
    training_dir = get_results_dir_path(config, "training")
    opt_state = {"dummy": jnp.zeros((1,))}
    ckpt.save_checkpoint(join(training_dir, "weights"), join(training_dir, "metrics"),
                         3, params, opt_state, {"lr": 1e-3},
                         [[1.0, 1.0, 0.0]], [[2.0]])

    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as fh:
        json.dump(config, fh)
    out_path = str(tmp_path / ("model" + serving.ARTIFACT_SUFFIX))

    rc = serving.main(["-c", cfg_path, "--out", out_path, "--batch", str(B),
                       "--n-existing", str(N_EXIST), "--points", str(N_OUT)])
    assert rc == 0
    assert exists(out_path) and exists(out_path + ".json")
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["restored_epoch"] == 3
    assert meta["num_output_points"] == N_OUT

    with open(out_path, "rb") as fh:
        f = serving.load_completion(fh.read())
    existing = np.zeros((B, N_EXIST, 3), np.float32)
    noise = np.zeros((B, model.get_noise_size()), np.float32)
    out = np.asarray(f(existing, noise, np.uint32(0)))
    assert out.shape == (B, N_OUT, 3) and np.all(np.isfinite(out))


def test_fit_prior_cli(tmp_path, capsys):
    """fit-prior subcommand: config -> fitted latent Gaussian npz."""
    from test_data import make_synthetic_shapenet

    from hyperpocket_tpu.eval.latent_stats import load_latent_gaussian

    make_synthetic_shapenet(tmp_path / "data", n_models=6, n_gt=64, n_part=32)
    config = make_config(tmp_path / "data", tmp_path / "results")
    model = FullModel.from_config(config["full_model"])
    params = model.init(jax.random.key(config["setup"]["seed"]))
    training_dir = get_results_dir_path(config, "training")
    ckpt.save_checkpoint(join(training_dir, "weights"), join(training_dir, "metrics"),
                         2, params, {"dummy": jnp.zeros((1,))}, {"lr": 1e-3},
                         [[1.0, 1.0, 0.0]], [[2.0]])
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as fh:
        json.dump(config, fh)
    out = str(tmp_path / "prior.npz")
    rc = serving.main(["fit-prior", "-c", cfg_path, "--out", out,
                       "--max-items", "6", "--batch-size", "2"])
    assert rc == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["fitted_on"] > 0
    lg = load_latent_gaussian(out)
    assert lg.dim == model.get_noise_size()
    # covariance Cholesky must be usable (finite, lower-triangular)
    assert np.all(np.isfinite(lg.scale_tril))
    assert np.allclose(lg.scale_tril, np.tril(lg.scale_tril))


def test_infer_cli_ply_roundtrip(tmp_path, capsys):
    """infer subcommand: PLY in -> batched artifact calls -> rescaled PLY out."""
    from hyperpocket_tpu.data.plyio import load_ply, save_ply

    model, params = _tiny_model()
    out_path = str(tmp_path / "model.jaxexp")
    data = serving.export_completion(
        model, params, batch=B, n_existing=N_EXIST, num_output_points=N_OUT,
        epoch=50.0)
    with open(out_path, "wb") as fh:
        fh.write(data)
    with open(out_path + ".json", "w") as fh:
        json.dump({"batch": B, "n_existing": N_EXIST, "num_output_points": N_OUT,
                   "noise_size": model.get_noise_size(), "data_parallel": None}, fh)

    # three ragged inputs, shifted/scaled away from the origin: exercises
    # resampling, batch padding (3 jobs, batch 2) and the box denormalize
    rng = np.random.default_rng(0)
    inputs = []
    for i, n in enumerate((50, 90, 64)):
        pts = (rng.normal(size=(n, 3)).astype(np.float32) * 0.2
               + np.float32(5.0 * (i + 1)))
        p = str(tmp_path / f"scan{i}.ply")
        save_ply(p, pts)
        inputs.append(p)

    out_dir = str(tmp_path / "completions")
    rc = serving.infer_main(["--artifact", out_path, "--inputs", *inputs,
                             "--out-dir", out_dir, "--seed", "3"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(res["written"]) == 3
    for i, path in enumerate(sorted(res["written"])):
        rec = load_ply(path)
        assert rec.shape == (N_OUT, 3) and np.all(np.isfinite(rec))
        # denormalized back into the input's coordinate frame
        assert np.abs(rec.mean(axis=0) - 5.0 * (i + 1)).max() < 2.0

    # multi-sample generativity: distinct noises -> distinct files
    rc = serving.infer_main(["--artifact", out_path, "--inputs", inputs[0],
                             "--out-dir", out_dir, "--samples", "3",
                             "--noise-std", "0.13"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(res["written"]) == 3
    a, b = (load_ply(p) for p in res["written"][:2])
    if model.get_noise_size() > 0:
        assert np.abs(a - b).max() > 0

    # --latent-prior: draws ride the fitted Gaussian npz instead of isotropic
    from hyperpocket_tpu.eval.latent_stats import LatentGaussian, save_latent_gaussian

    z = model.get_noise_size()
    prior_path = str(tmp_path / "prior.npz")
    save_latent_gaussian(
        LatentGaussian(mean=np.full((z,), 0.5, np.float32),
                       scale_tril=0.01 * np.eye(z, dtype=np.float32)),
        prior_path,
    )
    rc = serving.infer_main(["--artifact", out_path, "--inputs", inputs[0],
                             "--out-dir", str(tmp_path / "emp"), "--samples", "2",
                             "--latent-prior", prior_path])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(res["written"]) == 2
    # dim mismatch fails loudly
    save_latent_gaussian(
        LatentGaussian(mean=np.zeros((z + 1,), np.float32),
                       scale_tril=np.eye(z + 1, dtype=np.float32)),
        prior_path,
    )
    with pytest.raises(SystemExit, match="noise_size"):
        serving.infer_main(["--artifact", out_path, "--inputs", inputs[0],
                            "--out-dir", str(tmp_path / "emp"),
                            "--latent-prior", prior_path])

    # the explicit "export" subcommand spelling resolves to the exporter
    with pytest.raises(SystemExit):
        serving.main(["export", "--help"])
