"""Rehearsal-driver helpers (util_scripts/dress_rehearsal_r4.py) and the
trainer's empty-val-category handling.

Locks the two behaviors fixed after the multicat rehearsal's CPU pre-flight
smoke: (1) `_scoped_config` must impose the driver's pass order on the
experiment settings — `run_experiments` executes in config-settings order
(reference core/main.py:184) and sort_keys-dumped configs put
`compute_mmd_tmd_uhd` alphabetically before the `fixed` pass it consumes;
(2) categories whose val split is empty are skipped at loader construction
instead of reporting a constant 0.0 row.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                "util_scripts"))

from tests.test_data import make_synthetic_shapenet
from tests.test_train_integration import make_config


def _settings(names):
    return {n: {"execute": False} for n in names}


def test_scoped_config_imposes_pass_order():
    from dress_rehearsal_r4 import _scoped_config

    config = {"experiments": {"settings": _settings(
        ["completion3d_submission", "compute_mmd_tmd_uhd",
         "evaluate_generativity", "fixed", "merge_different_categories"])}}
    out = _scoped_config(config, ["fixed", "compute_mmd_tmd_uhd"])
    keys = list(out["experiments"]["settings"].keys())
    # executing passes first, in names order; the rest keep relative order
    assert keys[:2] == ["fixed", "compute_mmd_tmd_uhd"]
    assert keys[2:] == ["completion3d_submission", "evaluate_generativity",
                        "merge_different_categories"]
    flags = {k: v["execute"] for k, v in out["experiments"]["settings"].items()}
    assert flags == {"fixed": True, "compute_mmd_tmd_uhd": True,
                     "completion3d_submission": False,
                     "evaluate_generativity": False,
                     "merge_different_categories": False}
    # the input config is untouched (deepcopy semantics)
    assert not any(v["execute"] for v in config["experiments"]["settings"].values())


def test_scoped_config_ignores_unknown_names():
    from dress_rehearsal_r4 import _scoped_config

    config = {"experiments": {"settings": _settings(["fixed"])}}
    out = _scoped_config(config, ["not_an_experiment", "fixed"])
    assert list(out["experiments"]["settings"]) == ["fixed"]
    assert out["experiments"]["settings"]["fixed"]["execute"]


class _Empty:
    def __len__(self):
        return 0

    def __getitem__(self, i):
        raise IndexError(i)


def test_empty_val_category_skipped(tmp_path):
    from hyperpocket_tpu.data import get_datasets
    from hyperpocket_tpu.train.trainer import Trainer

    root = tmp_path / "data"
    make_synthetic_shapenet(root, n_models=6, n_gt=64, n_part=32)
    config = make_config(root, tmp_path / "res", max_epoch=1, batch=2)
    train_ds, val_dict, test_dict = get_datasets(config["dataset"])
    val_dict = dict(val_dict)
    val_dict["phantom"] = _Empty()

    trainer = Trainer(config, datasets=(train_ds, val_dict, test_dict),
                      use_mesh=False)
    assert "phantom" not in trainer.val_loaders
    assert len(trainer.val_loaders) == len(val_dict) - 1

    trainer.train_epoch(1)
    val_losses, val_samples = trainer.val_epoch(1)
    assert "phantom" not in val_losses and "phantom" not in val_samples
    # the total averages only real categories — no 0.0 dilution
    cats = [k for k in val_losses if k != "total"]
    expect = sum(val_losses[c] for c in cats) / len(cats)
    np.testing.assert_allclose(val_losses["total"], expect)
