"""Full-run determinism: same config + seed => bitwise-identical loss curves."""

import numpy as np
import pytest

from tests.test_data import make_synthetic_shapenet
from tests.test_train_integration import make_config


def test_two_runs_identical(tmp_path):
    from hyperpocket_tpu.train.trainer import Trainer

    root = tmp_path / "data"
    make_synthetic_shapenet(root, n_models=6, n_gt=64, n_part=32)

    def run(tag):
        config = make_config(root, tmp_path / f"results_{tag}", max_epoch=2)
        trainer = Trainer(config, use_mesh=False)
        train_losses, val_losses = trainer.run(plot_samples=False)
        return np.array(train_losses), np.array(val_losses)

    t1, v1 = run("a")
    t2, v2 = run("b")
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(v1, v2)


def test_different_seeds_differ(tmp_path):
    from hyperpocket_tpu.train.trainer import Trainer

    root = tmp_path / "data"
    make_synthetic_shapenet(root, n_models=6, n_gt=64, n_part=32)
    config_a = make_config(root, tmp_path / "ra", max_epoch=1)
    config_b = make_config(root, tmp_path / "rb", max_epoch=1)
    config_b["setup"]["seed"] = 999
    ta, _ = Trainer(config_a, use_mesh=False).run(plot_samples=False)
    tb, _ = Trainer(config_b, use_mesh=False).run(plot_samples=False)
    assert not np.array_equal(np.array(ta), np.array(tb))
