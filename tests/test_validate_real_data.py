"""End-to-end test of the real-data validation harness (VERDICT r3 #5).

The synthetic 3D-EPN tree stands in for the official archives: the tree is
zipped into archives exactly as the downloads would arrive, a sha256
manifest is written, and ``validate_real_data.main`` runs every stage —
checksum -> extract/ingest/slice -> training -> experiments -> scale diff —
from the archives alone.
"""

import json
import os
import zipfile
from os.path import join

import numpy as np
import pytest

from util_scripts.make_synthetic_3depn import make_synthetic_3depn
from util_scripts.validate_real_data import main, sha256_file, stage_checksum

CHAIR, AIRPLANE = "03001627", "02691156"


def _tiny_config(results_root: str) -> dict:
    return {
        "mode": "training",
        "dataset": {"name": "3depn", "path": "OVERRIDDEN", "classes": [CHAIR],
                    "num_samples": 1, "cache": False},
        "training": {
            "optimizer": {"type": "Adam", "hyperparams": {"lr": 0.001}},
            "lr_scheduler": {"type": "StepLR", "hyperparams": {"step_size": 3000, "gamma": 0.01}},
            "dataloader": {
                "train": {"batch_size": 4, "shuffle": True, "num_workers": 2, "drop_last": True},
                "val": {"batch_size": 4, "shuffle": False, "num_workers": 2, "drop_last": False},
            },
            "state_save_frequency": 1,
            "loss_coef": 0.05,
            "max_epoch": 1,
        },
        "experiments": {
            "epoch": "best_val",
            "settings": {
                "fixed": {"execute": True, "amount": 2, "mean": 0.0, "std": 0.05,
                          "triangulation_config": {"execute": False, "method": "edge", "depth": 2}},
                "compute_mmd_tmd_uhd": {"execute": True},
                "evaluate_generativity": {"execute": True, "batch_size": 2, "num_workers": 2},
                "merge_different_categories": {"execute": True, "amount": 1,
                                               "first_cat": "chair", "second_cat": "airplane"},
                "same_model_different_slices": {"execute": True, "amount": 1, "slices_number": 2},
                "completion3d_submission": {"execute": True, "batch_size": 8},
            },
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
        "setup": {"seed": 1856, "gpu_id": 0},
        "telegram_logger": {"enable": False, "bot_token": "", "chat_id": ""},
        "results_root": results_root,
    }


def test_checksum_stage_catches_corruption(tmp_path):
    p = tmp_path / "a.zip"
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("x.txt", "payload")
    good = {"a.zip": sha256_file(str(p))}
    man = tmp_path / "man.json"
    man.write_text(json.dumps(good))
    assert stage_checksum(str(tmp_path), str(man)) == good

    man.write_text(json.dumps({"a.zip": "0" * 64}))
    with pytest.raises(SystemExit, match="checksum stage FAILED"):
        stage_checksum(str(tmp_path), str(man))
    man.write_text(json.dumps({**good, "missing.zip": "0" * 64}))
    with pytest.raises(SystemExit, match="absent"):
        stage_checksum(str(tmp_path), str(man))


def test_ingest_rejects_path_traversal_archives(tmp_path):
    """Untrusted archives with ../ members must not extract (ADVICE r4)."""
    import tarfile

    from util_scripts.validate_real_data import _check_members, stage_ingest

    data = tmp_path / "data"
    data.mkdir()
    with zipfile.ZipFile(data / "evil.zip", "w") as zf:
        zf.writestr("../evil.txt", "escape")
    with pytest.raises(SystemExit, match="traversal"):
        stage_ingest(str(data), str(tmp_path / "work"), "3depn", [CHAIR], 1)
    assert not (tmp_path / "evil.txt").exists()

    # tar path: Python>=3.12 filter="data" raises; the fallback uses
    # _check_members, exercised directly here
    evil_tar = data / "evil.tar"
    with tarfile.open(evil_tar, "w") as tf:
        info = tarfile.TarInfo("../evil2.txt")
        info.size = 0
        tf.addfile(info)
    os.remove(data / "evil.zip")
    with pytest.raises((SystemExit, tarfile.TarError, OSError)):
        stage_ingest(str(data), str(tmp_path / "work2"), "3depn", [CHAIR], 1)
    assert not (tmp_path / "evil2.txt").exists()
    with pytest.raises(SystemExit, match="traversal"):
        _check_members(str(tmp_path / "work3"), ["../evil2.txt"], "evil.tar")


def test_validate_real_data_end_to_end(tmp_path):
    # 1. the synthetic 3D-EPN tree, zipped into two archives like the downloads
    tree = tmp_path / "tree"
    make_synthetic_3depn(str(tree), {CHAIR: 30, AIRPLANE: 10}, seed=0)
    data_root = tmp_path / "archives"
    os.makedirs(data_root)
    groups = {
        "ShapeNetPointCloud.zip": ["ShapeNetPointCloud"],
        "shapenet_dim32_sdf_pc.zip": ["shapenet_dim32_sdf_pc", "shapenet-official-split.csv"],
    }
    for arc, tops in groups.items():
        with zipfile.ZipFile(data_root / arc, "w") as zf:
            for top in tops:
                p = tree / top
                if p.is_file():
                    zf.write(p, top)
                    continue
                for dirpath, _, files in os.walk(p):
                    for f in files:
                        full = join(dirpath, f)
                        zf.write(full, os.path.relpath(full, tree))
    manifest = {arc: sha256_file(str(data_root / arc)) for arc in groups}
    (tmp_path / "manifest.json").write_text(json.dumps(manifest))

    # 2. tiny but schema-complete config
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(_tiny_config(str(tmp_path / "results"))))

    # a 1-epoch toy model won't land in the production sanity bands (that's
    # the bands working); widen them via --expect, which also exercises the
    # user-supplied-expectations path
    (tmp_path / "expect.json").write_text(json.dumps(
        {"MMD * 1000": [0, 1e5], "UHD * 100": [0, 1e4], "TMD * 100": [0, 1e4]}
    ))
    work = tmp_path / "work"
    rc = main([
        "--data-root", str(data_root),
        "--work", str(work),
        "--dataset", "3depn",
        "--config", str(cfg_path),
        "--manifest", str(tmp_path / "manifest.json"),
        "--expect", str(tmp_path / "expect.json"),
        "--gen-objects", "3",
        "--epochs", "1",
    ])
    assert rc == 0

    summary = json.load(open(work / "summary.json"))
    stages = summary["stages"]
    assert set(manifest) == set(stages["checksum"])
    assert os.path.isdir(stages["ingest"]["dataset_root"])
    # slices built by ingest (the archives carry only raw scans + gt clouds)
    assert os.path.isdir(join(stages["ingest"]["dataset_root"], "slices", "gt", CHAIR))
    assert stages["train"]["epochs"] == 1 and np.isfinite(stages["train"]["last_loss"])
    assert stages["diff"]["failures"] == []
    vals = stages["diff"]["values"]
    assert {"MMD * 1000", "UHD * 100", "TMD * 100"} <= set(vals)
    assert all(np.isfinite(v) for v in vals.values())
    # every executed experiment left artifacts
    exp_dir = work / "experiments"
    for sub in ("fixed", "compute_mmd_tmd_uhd", "evaluate_generativity",
                "merge_different_categories", "same_model_different_slices",
                "completion3d_submission"):
        assert os.listdir(exp_dir / sub), sub
