"""Multi-chip sharding on the simulated 8-device CPU mesh.

These stand in for pod-slice tests: DP gradient equivalence vs single-device,
DP+TP execution via the graft entry, and sharding-rule shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hyperpocket_tpu.models import FullModel
from hyperpocket_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    param_shardings,
    replicate,
    shard_batch,
)
from hyperpocket_tpu.train.optim import make_optimizer
from hyperpocket_tpu.train.trainer import make_train_step

CFG = {
    "random_encoder": {"output_size": 16, "use_bias": True, "relu_slope": 0.2},
    "real_encoder": {"output_size": 16, "use_bias": True, "relu_slope": 0.2},
    "hyper_network": {"use_bias": True, "relu_slope": 0.2},
    "target_network": {"use_bias": True, "relu_slope": 0.2, "freeze_layers_learning": False,
                       "layer_out_channels": [8, 16, 8]},
    "target_network_input": {"constant": False,
                             "normalization": {"enable": True, "type": "progressive", "epoch": 100}},
}


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def _batch(rng, b, n):
    return rng.standard_normal((b, n, 3)).astype(np.float32)


def test_dp_train_step_matches_single_device():
    model = FullModel.from_config(CFG)
    params = model.init(jax.random.key(0))
    tx = make_optimizer({"type": "Adam", "hyperparams": {"lr": 1e-3}})
    step = make_train_step(model, tx, 0.05)

    rng = np.random.default_rng(0)
    existing, missing, gt = _batch(rng, 8, 32), _batch(rng, 8, 32), _batch(rng, 8, 64)
    key, ep = jax.random.key(5), jnp.asarray(1.0)

    # single device
    p1, o1 = jax.tree_util.tree_map(jnp.copy, params), tx.init(params)
    p1, o1, loss1, *_ = step(p1, o1, jnp.asarray(existing), jnp.asarray(missing),
                             jnp.asarray(gt), key, ep, num_points=64)

    # 8-device DP
    mesh = make_mesh(8, 1)
    p8 = replicate(mesh, jax.tree_util.tree_map(jnp.copy, params))
    o8 = replicate(mesh, tx.init(params))
    de, dm, dg = shard_batch(mesh, jnp.asarray(existing), jnp.asarray(missing), jnp.asarray(gt))
    p8, o8, loss8, *_ = step(p8, o8, de, dm, dg, key, ep, num_points=64)

    assert float(loss1) == pytest.approx(float(loss8), rel=1e-4)
    # Adam's eps-regularised rsqrt amplifies psum reduction-order noise for
    # near-zero grads; allow a few ULP-scale divergences.
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_tp_sharding_rules():
    model = FullModel.from_config(CFG)
    params = model.init(jax.random.key(0))
    mesh = make_mesh(4, 2)
    shardings = param_shardings(mesh, params)
    heads_w = shardings["hyper_network"]["heads"]["w"]
    assert heads_w.spec == P(MODEL_AXIS, None)
    last_trunk_w = shardings["hyper_network"]["trunk"][-1]["w"]
    assert last_trunk_w.spec == P(None, MODEL_AXIS)
    # encoders replicated
    assert shardings["random_encoder"]["conv"][0]["w"].spec == P()


def test_dp_tp_full_step_executes():
    """4x2 data x model mesh: forward+backward+update runs and is finite.

    Runs in a FRESH subprocess (the driver's self-provisioning path):
    executing the donated 8-device step in-process aborts ~50% of the time
    when it lands late in a long-lived full-suite pytest run (XLA CPU
    runtime SIGABRT inside block_until_ready with no Python exception;
    passes reliably in a fresh process — both standalone and here).
    """
    from __graft_entry__ import _dryrun_in_cpu_subprocess

    _dryrun_in_cpu_subprocess(8)


def test_mesh_validation():
    with pytest.raises(ValueError):
        make_mesh(16, 1)  # more than available


def test_shard_batch_layout():
    mesh = make_mesh(8, 1)
    x = shard_batch(mesh, jnp.zeros((16, 4, 3)))
    assert x.sharding.spec == P(DATA_AXIS)
    assert x.shape == (16, 4, 3)


def test_trainer_dp_end_to_end(tmp_path):
    """Trainer with use_mesh=True shards batches over all 8 CPU devices."""
    import numpy as np

    from hyperpocket_tpu.train.trainer import Trainer
    from tests.test_data import make_synthetic_shapenet
    from tests.test_train_integration import make_config

    root = tmp_path / "data"
    make_synthetic_shapenet(root, n_models=10, n_gt=64, n_part=32)
    with open(root / "train.list", "w") as fh:
        fh.write("\n".join(f"02691156/model{i:03d}" for i in range(8)))
    with open(root / "val.list", "w") as fh:
        fh.write("02691156/model008")
    config = make_config(root, tmp_path / "results", max_epoch=1, batch=8)

    trainer = Trainer(config, use_mesh=True)
    assert trainer.mesh is not None
    train_losses, _ = trainer.run(plot_samples=False)
    assert np.isfinite(train_losses[0]).all()


def test_trainer_dp_tp_loss_equivalence(tmp_path):
    """Trainer losses match across single-device, pure-DP and DP x TP meshes.

    Same seed -> same data order, same RNG keys; only the partitioning
    differs, so per-epoch losses must agree to fp tolerance.
    """
    from hyperpocket_tpu.train.trainer import Trainer
    from tests.test_data import make_synthetic_shapenet
    from tests.test_train_integration import make_config

    root = tmp_path / "data"
    make_synthetic_shapenet(root, n_models=10, n_gt=64, n_part=32)
    with open(root / "train.list", "w") as fh:
        fh.write("\n".join(f"02691156/model{i:03d}" for i in range(8)))
    with open(root / "val.list", "w") as fh:
        fh.write("02691156/model008")

    losses = {}
    for tag, parallel, use_mesh in (
        ("single", None, False),
        ("dp", {"model": 1}, True),
        ("dp_tp", {"model": 2}, True),
    ):
        config = make_config(root, tmp_path / f"results_{tag}", max_epoch=2, batch=8)
        if parallel is not None:
            config["training"]["parallel"] = parallel
        trainer = Trainer(config, use_mesh=use_mesh)
        if tag == "dp_tp":
            assert trainer.mesh is not None and trainer.mesh.shape[MODEL_AXIS] == 2
            heads_w = trainer.params["hyper_network"]["heads"]["w"]
            assert heads_w.sharding.spec == P(MODEL_AXIS, None)
        train_losses, _ = trainer.run(plot_samples=False)
        losses[tag] = np.asarray(train_losses)

    np.testing.assert_allclose(losses["dp"], losses["single"], rtol=2e-4)
    np.testing.assert_allclose(losses["dp_tp"], losses["single"], rtol=2e-4)


def test_trainer_dp_val_epoch_shards_and_matches(tmp_path):
    """val_epoch places batches on the mesh (same path as train) and its
    losses match the unsharded run — regression for the round-2 gap where
    val bypassed _device_batch and ran with default placement."""
    from hyperpocket_tpu.train.trainer import Trainer
    from tests.test_data import make_synthetic_shapenet
    from tests.test_train_integration import make_config

    root = tmp_path / "data"
    make_synthetic_shapenet(root, n_models=10, n_gt=64, n_part=32)
    with open(root / "train.list", "w") as fh:
        fh.write("\n".join(f"02691156/model{i:03d}" for i in range(8)))
    with open(root / "val.list", "w") as fh:
        fh.write("\n".join(f"02691156/model{i:03d}" for i in range(8)))

    config = make_config(root, tmp_path / "results_mesh", max_epoch=1, batch=8)
    t_mesh = Trainer(config, use_mesh=True)
    assert t_mesh.mesh is not None

    orig_step, seen = t_mesh.val_step, []
    def spy(params, existing, missing, gt, key, ep, num_points):
        seen.append(existing.sharding)
        return orig_step(params, existing, missing, gt, key, ep, num_points=num_points)
    t_mesh.val_step = spy
    losses_mesh, _ = t_mesh.val_epoch(1)
    assert seen, "val epoch ran no batches"
    assert all(s.spec == P(DATA_AXIS) for s in seen), [s.spec for s in seen]

    config2 = make_config(root, tmp_path / "results_single", max_epoch=1, batch=8)
    t_single = Trainer(config2, use_mesh=False)
    losses_single, _ = t_single.val_epoch(1)
    np.testing.assert_allclose(
        losses_mesh["total"], losses_single["total"], rtol=2e-5
    )


def test_point_sharded_nn_distance_matches_unsharded():
    """Ring point-axis sharding == unsharded nn_distance (values and indices)."""
    from hyperpocket_tpu.ops.chamfer import nn_distance
    from hyperpocket_tpu.parallel.point_sharding import nn_distance_point_sharded

    mesh = make_mesh(8, 1)
    rng = np.random.default_rng(21)
    a = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 128, 3)), jnp.float32)
    d1r, i1r, d2r, i2r = nn_distance(a, b)
    d1, i1, d2, i2 = nn_distance_point_sharded(a, b, mesh, DATA_AXIS)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d1r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(d2r), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i1r))
    np.testing.assert_array_equal(np.asarray(i2), np.asarray(i2r))


def test_point_sharded_chamfer_value_and_grad():
    from hyperpocket_tpu.ops.chamfer import chamfer_loss
    from hyperpocket_tpu.parallel.point_sharding import chamfer_loss_point_sharded

    mesh = make_mesh(8, 1)
    rng = np.random.default_rng(22)
    x = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((2, 64, 3)), jnp.float32)
    ref = float(chamfer_loss(x, y))
    val = float(chamfer_loss_point_sharded(x, y, mesh))
    assert val == pytest.approx(ref, rel=1e-5)
    g_ref = jax.grad(chamfer_loss)(x, y)
    g = jax.grad(lambda a, b: chamfer_loss_point_sharded(a, b, mesh))(x, y)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)


def test_point_sharded_validates_divisibility():
    from hyperpocket_tpu.parallel.point_sharding import nn_distance_point_sharded

    mesh = make_mesh(8, 1)
    with pytest.raises(ValueError, match="divide"):
        nn_distance_point_sharded(jnp.zeros((1, 60, 3)), jnp.zeros((1, 64, 3)), mesh)
