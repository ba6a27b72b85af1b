"""End-to-end training on a tiny synthetic MissingShapeNet tree.

Covers: Trainer construction from a reference-schema config, epoch loop,
loss decrease, results-dir layout, checkpointing, resume, and best_val
restore — the integration tier the reference never had (SURVEY.md §4).
"""

import json
from os.path import exists, join

import numpy as np
import pytest

from tests.test_data import CAT, make_synthetic_shapenet


def make_config(root, results_root, max_epoch=2, batch=2):
    return {
        "mode": "training",
        "dataset": {"name": "shapenet", "path": str(root), "classes": [CAT],
                    "is_rotated": False, "num_samples": 1, "gen_test_set": False},
        "training": {
            "optimizer": {"type": "Adam", "hyperparams": {"lr": 0.001, "weight_decay": 0,
                                                          "betas": [0.9, 0.999], "amsgrad": False}},
            "lr_scheduler": {"type": "StepLR", "hyperparams": {"step_size": 3000, "gamma": 0.01}},
            "dataloader": {
                "train": {"batch_size": batch, "shuffle": True, "num_workers": 2, "drop_last": True},
                "val": {"batch_size": batch, "shuffle": False, "num_workers": 2, "drop_last": False},
            },
            "state_save_frequency": 1,
            "loss_coef": 0.05,
            "max_epoch": max_epoch,
        },
        "full_model": {
            "random_encoder": {"output_size": 16, "use_bias": True, "relu_slope": 0.2},
            "real_encoder": {"output_size": 16, "use_bias": True, "relu_slope": 0.2},
            "hyper_network": {"use_bias": True, "relu_slope": 0.2},
            "target_network": {"use_bias": True, "relu_slope": 0.2,
                               "freeze_layers_learning": False,
                               "layer_out_channels": [8, 16, 8]},
            "target_network_input": {"constant": False,
                                     "normalization": {"enable": True, "type": "progressive",
                                                       "epoch": 100}},
        },
        "setup": {"seed": 2020, "gpu_id": 0},
        "telegram_logger": {"enable": False, "bot_token": "", "chat_id": ""},
        "results_root": str(results_root),
    }


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    results = tmp_path_factory.mktemp("results")
    make_synthetic_shapenet(root, n_models=6, n_gt=64, n_part=32)
    config = make_config(root, results, max_epoch=2)

    from hyperpocket_tpu.train.trainer import Trainer

    trainer = Trainer(config, use_mesh=False)
    train_losses, val_losses = trainer.run(plot_samples=False)
    return config, trainer, train_losses, val_losses


def test_training_runs_and_improves(trained):
    _, _, train_losses, val_losses = trained
    assert len(train_losses) == 2 and len(val_losses) == 2
    assert np.isfinite(train_losses[-1]).all()
    # reconstruction loss should drop from epoch 1 to 2 on this trivial set
    assert train_losses[1][1] < train_losses[0][1]


def test_results_dir_layout(trained):
    config, trainer, _, _ = trained
    assert exists(join(trainer.result_dir, "last_config.json"))
    assert exists(join(trainer.result_dir, "log.txt"))
    assert exists(join(trainer.weights_path, "00002_model.npz"))
    assert exists(join(trainer.weights_path, "00002_O.npz"))
    assert exists(join(trainer.metrics_path, "00002_train.npy"))
    assert exists(join(trainer.metrics_path, "00002_val.npy"))
    with open(join(trainer.result_dir, "last_config.json")) as fh:
        assert json.load(fh)["mode"] == "training"
    # naming encodes the config (reference util.py:26-61)
    assert "2e16x16StepLR_step_size3000_gamma0.01" in trainer.result_dir
    assert "uniform_normed_progressive_to_epoch_100" in trainer.result_dir


def test_resume_from_checkpoint(trained):
    config, first, train_losses, _ = trained
    from hyperpocket_tpu.train.trainer import Trainer

    config2 = json.loads(json.dumps(config))
    config2["training"]["max_epoch"] = 3
    trainer2 = Trainer(config2, use_mesh=False)
    assert trainer2.start_epoch == 3  # epochs 1-2 restored
    t3, v3 = trainer2.run(plot_samples=False)
    assert len(t3) == 3
    # restored history must match the first run's
    np.testing.assert_allclose(np.array(t3[:2]), np.array(train_losses), rtol=1e-6)


def test_resume_reproduces_uninterrupted_trajectory(tmp_path):
    """Interrupt/resume == uninterrupted, bit-for-bit: the checkpoint's
    scheduler json carries the RNG key counter, so the resumed epoch draws
    the SAME step keys the uninterrupted run would have (trainer.py
    _maybe_restore). Pre-round-4 checkpoints lack the field and keep the
    fresh counter (loss parity then holds only to Adam-noise tolerance)."""
    from hyperpocket_tpu.train.trainer import Trainer

    root = tmp_path / "data"
    make_synthetic_shapenet(root, n_models=6, n_gt=64, n_part=32)

    cfg_full = make_config(root, tmp_path / "res_full", max_epoch=3)
    t_full = Trainer(cfg_full, use_mesh=False)
    full_train, full_val = t_full.run(plot_samples=False)

    cfg_a = make_config(root, tmp_path / "res_resume", max_epoch=2)
    Trainer(cfg_a, use_mesh=False).run(plot_samples=False)
    cfg_b = make_config(root, tmp_path / "res_resume", max_epoch=3)
    t_b = Trainer(cfg_b, use_mesh=False)
    assert t_b.start_epoch == 3
    res_train, res_val = t_b.run(plot_samples=False)

    np.testing.assert_array_equal(np.array(res_train), np.array(full_train))
    np.testing.assert_array_equal(np.array(res_val), np.array(full_val))


def test_compute_dtype_switch_schedule(tmp_path):
    """training.compute_dtype_switch: a bf16-early/fp32-late schedule in ONE
    run. Epochs <= switch.epoch must be bit-identical to a pure-bf16 run;
    the full trajectory must be bit-identical to manually resuming the bf16
    checkpoint under fp32 compute (the chip experiment in
    results/REHEARSALS.md, automated). Master params are fp32 either way, so
    the crossing rebuilds only the model/step fns, never converts state."""
    import shutil

    from hyperpocket_tpu.train.trainer import Trainer

    root = tmp_path / "data"
    make_synthetic_shapenet(root, n_models=6, n_gt=64, n_part=32)

    def cfg(results, max_epoch, dtype, switch=None):
        c = make_config(root, results, max_epoch=max_epoch)
        c["training"]["compute_dtype"] = dtype
        if switch is not None:
            c["training"]["compute_dtype_switch"] = switch
        return c

    # pure bf16 for the pre-switch segment (leaves its epoch-2 checkpoint)
    a_train, a_val = Trainer(
        cfg(tmp_path / "res_pre", 2, "bfloat16"), use_mesh=False
    ).run(plot_samples=False)

    # manual schedule: resume that checkpoint in fp32 for epochs 3-4
    shutil.copytree(tmp_path / "res_pre", tmp_path / "res_manual")
    t_b = Trainer(cfg(tmp_path / "res_manual", 4, "float32"), use_mesh=False)
    assert t_b.start_epoch == 3
    b_train, b_val = t_b.run(plot_samples=False)

    # the switch config: one uninterrupted run crossing the boundary
    t_s = Trainer(
        cfg(tmp_path / "res_switch", 4, "bfloat16",
            switch={"epoch": 2, "compute_dtype": "float32"}),
        use_mesh=False,
    )
    s_train, s_val = t_s.run(plot_samples=False)
    assert t_s.model.compute_dtype == "float32"  # boundary crossed

    np.testing.assert_array_equal(np.array(s_train[:2]), np.array(a_train))
    np.testing.assert_array_equal(np.array(s_val[:2]), np.array(a_val))
    np.testing.assert_array_equal(np.array(s_train), np.array(b_train))
    np.testing.assert_array_equal(np.array(s_val), np.array(b_val))


def test_val_epoch_per_category(trained):
    _, trainer, _, _ = trained
    losses, samples = trainer.val_epoch(2)
    assert set(losses) == {"airplane", "total"}
    assert samples["airplane"][0].shape == (32, 3)
    assert samples["airplane"][2].shape == (64, 3)


def test_hyper_cloud_mode_trains(tmp_path):
    """HyperCloud (random encoder only, VAE on existing) end-to-end."""
    import json

    from hyperpocket_tpu.train.trainer import Trainer

    root = tmp_path / "data"
    make_synthetic_shapenet(root, n_models=4, n_gt=64, n_part=32)
    config = make_config(root, tmp_path / "results", max_epoch=1)
    config["full_model"]["real_encoder"]["output_size"] = 0

    trainer = Trainer(config, use_mesh=False)
    assert trainer.model.mode == "hyper_cloud"
    assert not trainer.model.has_generativity  # KLD only in HyperPocket
    train_losses, val_losses = trainer.run(plot_samples=False)
    assert np.isfinite(train_losses[0]).all()
    assert train_losses[0][2] == 0.0  # no KLD term
    assert "1e16StepLR" in trainer.result_dir  # naming: one encoder, random only


def test_async_checkpointing_matches_sync(tmp_path):
    """training.checkpoint.async produces the same checkpoint files/values."""
    import jax
    import numpy as np

    from hyperpocket_tpu.train import checkpoint as ckpt
    from hyperpocket_tpu.train.trainer import Trainer
    from tests.test_data import make_synthetic_shapenet

    root = tmp_path / "data"
    make_synthetic_shapenet(root, n_models=6, n_gt=64, n_part=32)

    trees = {}
    for tag, ck in (("sync", {}), ("async", {"async": True, "drop_if_busy": False})):
        config = make_config(root, tmp_path / f"res_{tag}", max_epoch=2)
        config["training"]["checkpoint"] = ck
        trainer = Trainer(config, use_mesh=False)
        trainer.run(plot_samples=False)
        path = join(trainer.weights_path, "00002_model.npz")
        assert exists(path), f"{tag}: checkpoint missing after run()"
        trees[tag] = ckpt.load_tree(path, trainer.params)
    for a, b in zip(jax.tree_util.tree_leaves(trees["sync"]),
                    jax.tree_util.tree_leaves(trees["async"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpoint_drop_if_busy_flushes_final(tmp_path):
    """A save deferred while the writer is busy is flushed by wait()."""
    import threading
    import time

    import jax.numpy as jnp

    from hyperpocket_tpu.train import checkpoint as ckpt

    gate = threading.Event()
    orig = ckpt.save_checkpoint
    calls = []

    def slow_save(*args):
        calls.append(args[2])  # epoch
        gate.wait(5)
        orig(*args)

    ac = ckpt.AsyncCheckpointer(drop_if_busy=True)
    params = {"w": jnp.ones((4,))}
    opt = {"m": jnp.zeros((4,))}
    ckpt.save_checkpoint, saved = slow_save, ckpt.save_checkpoint
    try:
        w, m = str(tmp_path / "w"), str(tmp_path / "m")
        assert ac.submit(w, m, 1, params, opt, {"epoch": 1}, [], [])
        time.sleep(0.1)  # writer now blocked in slow_save
        assert not ac.submit(w, m, 2, {"w": 2 * params["w"]}, opt, {"epoch": 2}, [], [])
        assert ac.dropped == 1
        gate.set()
        ac.wait()
    finally:
        ckpt.save_checkpoint = saved
    assert calls == [1, 2]  # deferred epoch-2 save flushed on wait
    assert exists(join(str(tmp_path / "w"), "00002_model.npz"))
