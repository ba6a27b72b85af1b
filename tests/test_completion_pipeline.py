"""End-to-end HyperRec pipeline on a synthetic Completion3D tree.

Covers the missing=None path through Trainer (the Completion3D dataset yields
scalar placeholders for the missing cloud) and the benchmark submission
experiment (per-model h5 + submission.zip).
"""

import json
import os
from os.path import exists, join
from zipfile import ZipFile

import numpy as np
import pytest

from tests.test_datasets_more import make_completion_tree


def make_completion_config(root, results_root, max_epoch=1):
    return {
        "mode": "training",
        "dataset": {"name": "completion", "path": str(root), "classes": []},
        "training": {
            "optimizer": {"type": "Adam", "hyperparams": {"lr": 0.001}},
            "lr_scheduler": {"type": "StepLR", "hyperparams": {"step_size": 41, "gamma": 0.01}},
            "dataloader": {
                "train": {"batch_size": 2, "shuffle": True, "num_workers": 2, "drop_last": True},
                "val": {"batch_size": 2, "shuffle": False, "num_workers": 2, "drop_last": False},
            },
            "state_save_frequency": 1,
            "loss_coef": 0.05,
            "max_epoch": max_epoch,
        },
        "full_model": {
            "random_encoder": {"output_size": 0, "use_bias": True, "relu_slope": 0.2},
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
def completion_setup(tmp_path_factory):
    pytest.importorskip("h5py")
    root = tmp_path_factory.mktemp("c3d")
    results = tmp_path_factory.mktemp("c3d_results")
    make_completion_tree(root, n_models=4)
    config = make_completion_config(root, results)

    from hyperpocket_tpu.train.trainer import Trainer

    trainer = Trainer(config, use_mesh=False)
    trainer.run(plot_samples=False)
    return config, trainer


def test_hyper_rec_trains_without_missing(completion_setup):
    config, trainer = completion_setup
    assert trainer.model.mode == "hyper_rec"
    assert not trainer.uses_missing
    assert len(trainer.train_losses) == 1
    assert np.isfinite(trainer.train_losses[0]).all()
    assert trainer.train_losses[0][2] == 0.0  # no KLD in HyperRec


def test_val_covers_both_categories(completion_setup):
    config, trainer = completion_setup
    losses, samples = trainer.val_epoch(1)
    # empty classes -> all 8 PCN default categories (reference
    # completion3d.py get_validation_datasets); ours are only 2 non-empty
    assert {"airplane", "chair", "total"} <= set(losses)
    assert np.isfinite(losses["airplane"]).all() and losses["airplane"][0] > 0
    assert samples["airplane"] is not None
    # empty categories are skipped at loader construction (no constant-0.0
    # rows diluting the printed total), so sofa must not appear at all
    assert "sofa" not in losses and "sofa" not in samples
    cats = [k for k in losses if k != "total"]
    np.testing.assert_allclose(
        losses["total"], sum(losses[c] for c in cats) / len(cats))


def test_completion3d_submission(completion_setup, tmp_path):
    config, trainer = completion_setup
    from hyperpocket_tpu.data import get_datasets
    from hyperpocket_tpu.eval.experiments import ExperimentContext, completion3d_submission

    _, _, test_dict = get_datasets(config["dataset"])
    ctx = ExperimentContext(trainer.model, trainer.params, epoch=1)
    completion3d_submission(ctx, test_dict, str(tmp_path), 1, batch_size=2)

    import h5py

    files = sorted(os.listdir(join(tmp_path, "completion3d_submission")))
    assert len(files) == 4
    with h5py.File(join(tmp_path, "completion3d_submission", files[0])) as fh:
        assert fh["data"].shape == (2048, 3)
    with ZipFile(join(tmp_path, "submission.zip")) as zf:
        assert len(zf.namelist()) == 4
        assert all(name.startswith("all/") for name in zf.namelist())
