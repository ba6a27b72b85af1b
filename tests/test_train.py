"""Optimizer/scheduler registry, checkpoint roundtrips, loss semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from hyperpocket_tpu.train.checkpoint import (
    find_latest_epoch,
    load_tree,
    resolve_restore_epoch,
    save_tree,
)
from hyperpocket_tpu.train.losses import kld_loss, reconstruction_loss
from hyperpocket_tpu.train.optim import make_lr_schedule, make_optimizer, set_learning_rate


def test_adam_matches_torch_single_param():
    """Our Adam chain must track torch.optim.Adam trajectories."""
    w0 = np.random.default_rng(0).standard_normal((5, 4)).astype(np.float32)
    grads = [np.random.default_rng(i + 1).standard_normal((5, 4)).astype(np.float32) for i in range(5)]

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=1e-2, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    tx = make_optimizer({"type": "Adam", "hyperparams": {"lr": 1e-2, "betas": [0.9, 0.999],
                                                         "weight_decay": 0.01, "amsgrad": False}})
    params = jnp.asarray(w0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params), tw.detach().numpy(), atol=1e-5)


def test_step_lr_matches_torch():
    sched = make_lr_schedule({"type": "StepLR", "hyperparams": {"step_size": 3, "gamma": 0.1}}, 1.0)
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    tsched = torch.optim.lr_scheduler.StepLR(opt, step_size=3, gamma=0.1)
    for epoch in range(1, 11):
        assert sched(epoch) == pytest.approx(opt.param_groups[0]["lr"])
        tsched.step()


def test_multistep_exponential_cosine():
    ms = make_lr_schedule({"type": "MultiStepLR", "hyperparams": {"milestones": [2, 4], "gamma": 0.5}}, 1.0)
    assert [ms(e) for e in (1, 2, 3, 4, 5)] == [1.0, 1.0, 0.5, 0.5, 0.25]
    ex = make_lr_schedule({"type": "ExponentialLR", "hyperparams": {"gamma": 0.9}}, 2.0)
    assert ex(1) == 2.0 and ex(3) == pytest.approx(2.0 * 0.81)
    cos = make_lr_schedule({"type": "CosineAnnealingLR", "hyperparams": {"T_max": 10}}, 1.0)
    assert cos(1) == pytest.approx(1.0) and cos(11) == pytest.approx(0.0)


def test_set_learning_rate_changes_updates():
    tx = make_optimizer({"type": "Adam", "hyperparams": {"lr": 1.0}})
    params = jnp.ones((3,))
    state = tx.init(params)
    g = jnp.ones((3,))
    upd1, state = tx.update(g, state, params)
    state = set_learning_rate(state, 0.0)
    upd2, state = tx.update(g, state, params)
    assert float(jnp.abs(upd1).max()) > 0
    assert float(jnp.abs(upd2).max()) == 0


def test_unknown_optimizer_raises():
    with pytest.raises(ValueError):
        make_optimizer({"type": "Shampoo", "hyperparams": {}})


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
            "nested": [{"w": jnp.ones((4,))}, {"w": jnp.zeros((2, 2))}]}
    path = tmp_path / "ckpt.npz"
    save_tree(path, tree)
    template = jax.tree_util.tree_map(jnp.zeros_like, tree)
    back = load_tree(path, template)
    for a, b in zip(jax.tree_util.tree_leaves(tree), jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    save_tree(tmp_path / "c.npz", {"a": jnp.ones((3,))})
    with pytest.raises(ValueError):
        load_tree(tmp_path / "c.npz", {"a": jnp.ones((4,))})


def test_find_latest_epoch(tmp_path):
    (tmp_path / "weights").mkdir()
    for e in (3, 12, 7):
        (tmp_path / "weights" / f"{e:05}_model.npz").touch()
    assert find_latest_epoch(str(tmp_path)) == 12
    assert find_latest_epoch(str(tmp_path / "weights")) == 12
    assert find_latest_epoch(str(tmp_path / "nowhere")) == 0


def test_find_latest_resumable_epoch_skips_model_only_saves(tmp_path):
    """A best-val (model-only) save newer than the last full checkpoint must
    not be picked for crash-resume — observed: resume crashed on a missing
    00104_O.npz after an async best-val save landed at 104 with full state
    only at 99."""
    from hyperpocket_tpu.train.checkpoint import find_latest_resumable_epoch

    w = tmp_path / "weights"
    m = tmp_path / "metrics"
    w.mkdir(), m.mkdir()
    for e in (94, 99):
        (w / f"{e:05}_model.npz").touch()
        (w / f"{e:05}_O.npz").touch()
        (m / f"{e:05}_train.npy").touch()
        (m / f"{e:05}_val.npy").touch()
    (w / "00104_model.npz").touch()  # best-val, no optimizer twin
    assert find_latest_resumable_epoch(str(w), str(m)) == 99
    assert find_latest_epoch(str(tmp_path)) == 104  # reference semantics kept
    assert find_latest_resumable_epoch(str(tmp_path / "no"), str(m)) == 0


def test_resolve_restore_policies(tmp_path):
    val = np.array([[3.0], [1.0], [2.0]])
    np.save(tmp_path / "00003_val.npy", val)
    assert resolve_restore_epoch(str(tmp_path), 3, "latest") == 3
    assert resolve_restore_epoch(str(tmp_path), 3, "best_val") == 2
    assert resolve_restore_epoch(str(tmp_path), 3, 7) == 7
    with pytest.raises(ValueError):
        resolve_restore_epoch(str(tmp_path), 3, "bogus")


def test_kld_quirk_matches_reference_formula():
    """KLD consumes sigma=exp(raw) and applies exp() AGAIN — the reference's
    exact objective (core/epoch_loops.py:28-31 with encoder.py:51's output)."""
    rng = np.random.default_rng(4)
    mu = rng.standard_normal((3, 8)).astype(np.float32)
    sigma = np.exp(rng.standard_normal((3, 8)).astype(np.float32) * 0.1)
    t_mu, t_sigma = torch.from_numpy(mu), torch.from_numpy(sigma)
    ref = float(0.5 * (torch.exp(t_sigma) + torch.square(t_mu) - 1 - t_sigma).sum() / 3)
    ours = float(kld_loss(jnp.asarray(mu), jnp.asarray(sigma), 3))
    assert ours == pytest.approx(ref, rel=1e-5)


def test_reconstruction_loss_coef():
    rng = np.random.default_rng(5)
    gt = jnp.asarray(rng.standard_normal((2, 32, 3)).astype(np.float32))
    rec = jnp.asarray(rng.standard_normal((2, 32, 3)).astype(np.float32))
    assert float(reconstruction_loss(gt, rec, 0.05)) == pytest.approx(
        0.05 * float(reconstruction_loss(gt, rec, 1.0)), rel=1e-6
    )


def test_frozen_heads_masked_from_weight_decay():
    """Coupled weight decay must not move frozen hypernet heads."""
    import jax
    import jax.numpy as jnp

    from hyperpocket_tpu.models import FullModel
    from tests.test_models import _cfg

    model = FullModel.from_config(_cfg(8, 8, freeze=True))
    params = model.init(jax.random.key(0))
    mask = jax.tree_util.tree_map_with_path(
        lambda path, _: not ("hyper_network" in [getattr(p, "key", None) for p in path]
                             and "heads" in [getattr(p, "key", None) for p in path]),
        params,
    )
    tx = make_optimizer({"type": "Adam", "hyperparams": {"lr": 0.1, "weight_decay": 0.5}},
                        trainable_mask=mask)
    state = tx.init(params)
    zero_grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(zero_grads, state, params)
    heads_update = updates["hyper_network"]["heads"]["w"]
    trunk_update = updates["hyper_network"]["trunk"][0]["w"]
    assert float(jnp.abs(heads_update).max()) == 0.0  # frozen: untouched
    assert float(jnp.abs(trunk_update).max()) > 0.0  # decay moves trainables


def test_best_val_restore_skips_missing_checkpoints(tmp_path):
    """best_val picks the best epoch AMONG PERSISTED checkpoints: async
    checkpointing may have superseded the curve's argmin epoch."""
    import os

    val = np.array([[3.0], [1.0], [2.0]])  # argmin -> epoch 2
    np.save(tmp_path / "00003_val.npy", val)
    w = tmp_path / "weights"
    os.makedirs(w)
    for e in (1, 3):  # epoch 2's file was never written
        (w / f"{e:05}_model.npz").write_bytes(b"")
    assert resolve_restore_epoch(str(tmp_path), 3, "best_val", str(w)) == 3
    # with the argmin epoch present it is chosen, as before
    (w / "00002_model.npz").write_bytes(b"")
    assert resolve_restore_epoch(str(tmp_path), 3, "best_val", str(w)) == 2
    # no weights_path: reference behavior (bare argmin)
    assert resolve_restore_epoch(str(tmp_path), 3, "best_val") == 2


def test_train_step_prng_impl_rbg():
    """training.prng_impl="rbg" folds counters into the hardware generator."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from hyperpocket_tpu.models import FullModel
    from hyperpocket_tpu.train.optim import make_optimizer
    from hyperpocket_tpu.train.trainer import make_train_step

    cfg = {
        "random_encoder": {"output_size": 8, "use_bias": True},
        "real_encoder": {"output_size": 8, "use_bias": True},
        "hyper_network": {"use_bias": True},
        "target_network": {"use_bias": True, "layer_out_channels": [8],
                            "freeze_layers_learning": False},
        "target_network_input": {"constant": False,
                                  "normalization": {"enable": False}},
    }
    model = FullModel.from_config(cfg)
    params = model.init(jax.random.key(0))
    tx = make_optimizer({"type": "Adam", "hyperparams": {"lr": 1e-3}})
    opt_state = tx.init(params)
    step = make_train_step(model, tx, 0.05, prng_impl="rbg")
    rng = np.random.default_rng(0)
    ex = jnp.asarray(rng.standard_normal((2, 16, 3)), jnp.float32)
    mi = jnp.asarray(rng.standard_normal((2, 16, 3)), jnp.float32)
    gt = jnp.asarray(rng.standard_normal((2, 32, 3)), jnp.float32)
    p, s, loss, *_ = step(params, opt_state, ex, mi, gt, np.uint32(3),
                           jnp.asarray(1.0), num_points=32)
    assert np.isfinite(float(loss))
    # same counter -> same loss (deterministic per seed within an impl)
    params2 = model.init(jax.random.key(0))
    opt2 = tx.init(params2)
    _, _, loss2, *_ = step(params2, opt2, ex, mi, gt, np.uint32(3),
                            jnp.asarray(1.0), num_points=32)
    assert float(loss) == float(loss2)
