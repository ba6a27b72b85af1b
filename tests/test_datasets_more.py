"""3D-EPN, Completion3D and real-scan datasets on synthetic directory trees."""

import csv
import os
from os.path import join

import numpy as np
import pytest

from hyperpocket_tpu.data.completion3d import Completion3DDataset
from hyperpocket_tpu.data.plyio import save_ply
from hyperpocket_tpu.data.real_data import RealDataNPYDataset
from hyperpocket_tpu.data.shapenet_3depn import (
    ShapeNet3DEPNDataset,
    collect_split_by_id,
    sample_point_cloud_by_n,
)

CAT = "03001627"  # chair


# ---------------------------------------------------------------------------
# 3D-EPN
# ---------------------------------------------------------------------------


def make_3depn_tree(root, n_models=3, num_samples=2):
    rng = np.random.default_rng(0)
    rows = [["id", "synsetId", "subSynsetId", "modelId", "split"]]
    for d in ("existing", "missing", "gt"):
        os.makedirs(join(root, "slices", d, CAT), exist_ok=True)
    os.makedirs(join(root, "ShapeNetPointCloud", CAT), exist_ok=True)
    os.makedirs(join(root, "shapenet_dim32_sdf_pc", CAT), exist_ok=True)
    for i in range(n_models):
        name = f"m{i:02d}"
        gt = rng.standard_normal((256, 3)).astype(np.float32)
        save_ply(join(root, "slices", "gt", CAT, name + ".ply"), gt)
        for k in range(num_samples):
            save_ply(join(root, "slices", "existing", CAT, f"{k}~{name}.ply"), gt[:128])
            save_ply(join(root, "slices", "missing", CAT, f"{k}~{name}.ply"), gt[128:])
        # test-split assets
        save_ply(join(root, "ShapeNetPointCloud", CAT, name + ".ply"), gt)
        for raw in range(8):
            save_ply(join(root, "shapenet_dim32_sdf_pc", CAT, f"{name}__{raw}__.ply"),
                     gt[: 64 + raw])
        rows.append([f"{i:06d}", CAT, CAT, name, "test" if i == 0 else "train"])
    with open(join(root, "shapenet-official-split.csv"), "w", newline="") as fh:
        csv.writer(fh).writerows(rows)


def test_3depn_train_split(tmp_path):
    make_3depn_tree(tmp_path)
    ds = ShapeNet3DEPNDataset(str(tmp_path), split="train", classes=[CAT], num_samples=2)
    assert len(ds) == 6  # 3 models x 2 samples
    existing, missing, gt, label = ds[3]
    assert existing.shape == (128, 3) and gt.shape == (256, 3)
    assert label == "m01"  # filename sans .ply


def test_3depn_test_split_deterministic(tmp_path):
    make_3depn_tree(tmp_path)
    ds1 = ShapeNet3DEPNDataset(str(tmp_path), split="test", classes=[CAT])
    ds2 = ShapeNet3DEPNDataset(str(tmp_path), split="test", classes=[CAT])
    assert len(ds1) == 1  # only model 0 is in the test split
    # scan choice and resampling are fully deterministic per index now
    raw1, _, real1, name1 = ds1[0]
    raw2, _, real2, name2 = ds2[0]
    assert raw1.shape == (1024, 3) and real1.shape == (2048, 3)
    assert name1 == name2 == "m00"
    np.testing.assert_array_equal(raw1, raw2)
    np.testing.assert_array_equal(real1, real2)
    # numpy integer indices (np.random.choice output) must work: the
    # per-index random.Random seed rejects np.int64 under numpy>=2
    raw3, _, _, _ = ds1[np.int64(0)]
    np.testing.assert_array_equal(raw1, raw3)


def test_3depn_axis_swap_applied(tmp_path):
    make_3depn_tree(tmp_path)
    ds = ShapeNet3DEPNDataset(str(tmp_path), split="test", classes=[CAT])
    raw, _, _, _ = ds[0]
    # rotation preserves norms
    assert np.isfinite(raw).all()


def test_collect_split_by_id(tmp_path):
    make_3depn_tree(tmp_path)
    info = collect_split_by_id(join(tmp_path, "shapenet-official-split.csv"), CAT)
    assert info["test"] == ["m00"]
    assert info["train"] == ["m01", "m02"]


def test_collect_split_by_id_warns_on_unknown_label(tmp_path, caplog):
    """Malformed split labels are visible, not silently dropped (ADVICE r4)."""
    import logging

    csv_path = join(tmp_path, "split.csv")
    with open(csv_path, "w") as fh:
        fh.write("id,synsetId,subSynsetId,modelId,split\n")
        fh.write(f"1,{CAT},x,m00,train\n")
        fh.write(f"2,{CAT},x,m01,tran\n")  # typo'd label
    with caplog.at_level(logging.WARNING):
        info = collect_split_by_id(csv_path, CAT)
    assert info["train"] == ["m00"]
    assert info["test"] == ["m01"]  # bucketed, but ...
    assert any("tran" in r.message for r in caplog.records)  # ... loudly


def test_sample_point_cloud_by_n():
    pts = np.arange(30).reshape(10, 3)
    up = sample_point_cloud_by_n(pts, 16)
    down = sample_point_cloud_by_n(pts, 4)
    same = sample_point_cloud_by_n(pts, 10)
    assert up.shape == (16, 3) and down.shape == (4, 3)
    np.testing.assert_array_equal(same, pts)
    np.testing.assert_array_equal(up[:10], pts)  # upsample keeps originals first


# ---------------------------------------------------------------------------
# Completion3D
# ---------------------------------------------------------------------------


def make_completion_tree(root, n_models=4):
    import h5py

    rng = np.random.default_rng(1)
    names = [f"{'02691156' if i % 2 else '03001627'}/model{i}" for i in range(n_models)]
    for split in ("train", "val", "test"):
        for kind in ("partial", "gt"):
            for name in names:
                path = join(root, split, kind, name + ".h5")
                if split == "test" and kind == "gt":
                    continue
                os.makedirs(os.path.dirname(path), exist_ok=True)
                with h5py.File(path, "w") as fh:
                    fh.create_dataset("data", data=rng.standard_normal((64, 3)).astype(np.float32))
        with open(join(root, f"{split}.list"), "w") as fh:
            fh.write("\n".join(names))
    return names


def test_completion3d_train_and_test(tmp_path):
    h5py = pytest.importorskip("h5py")
    names = make_completion_tree(tmp_path)
    ds = Completion3DDataset(str(tmp_path), split="train")
    assert len(ds) == 4
    existing, missing, gt, name = ds[0]
    assert existing.shape == (64, 3) and gt.shape == (64, 3)
    assert missing == 0  # scalar placeholder (completion3d.py:48)
    assert name == names[0]

    test = Completion3DDataset(str(tmp_path), split="test")
    e, _, g, _ = test[0]
    np.testing.assert_array_equal(e, g)  # no gt in test -> gt := existing


def test_completion3d_val_by_category(tmp_path):
    pytest.importorskip("h5py")
    make_completion_tree(tmp_path)
    val = Completion3DDataset.get_validation_datasets(str(tmp_path),
                                                      classes=["02691156", "03001627"])
    assert set(val) == {"airplane", "chair"}
    assert len(val["airplane"]) == 2
    # names map to synset ids everywhere (PARITY.md)
    by_name = Completion3DDataset.get_validation_datasets(str(tmp_path),
                                                          classes=["airplane", "chair"])
    assert {c: ds.model_list for c, ds in by_name.items()} == {
        c: ds.model_list for c, ds in val.items()}
    train_id = Completion3DDataset(str(tmp_path), split="train", classes=["02691156"])
    train_name = Completion3DDataset(str(tmp_path), split="train", classes=["airplane"])
    assert train_name.model_list == train_id.model_list and len(train_id) == 2


def test_completion3d_class_filter(tmp_path):
    pytest.importorskip("h5py")
    make_completion_tree(tmp_path)
    ds = Completion3DDataset(str(tmp_path), split="train", classes=["02691156"])
    assert len(ds) == 2


# ---------------------------------------------------------------------------
# Real scans
# ---------------------------------------------------------------------------


def test_real_data_scaling_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    obj = (rng.standard_normal((500, 3)) * 5 + 10).astype(np.float32)
    scene = rng.standard_normal((100, 3)).astype(np.float32)
    np.save(tmp_path / "object_0.npy", obj)
    np.save(tmp_path / "scene_0.npy", scene)
    ds = RealDataNPYDataset(str(tmp_path))
    assert len(ds) == 1
    pcd, _, _, idx = ds[0]
    assert pcd.shape == (1024, 3)
    # normalised into the 0.9 box
    assert (pcd.max(0) - pcd.min(0)).max() <= 0.9 + 1e-5
    # inverse scale puts it back at the original location/extent
    restored = ds.inverse_scale(0, pcd)
    assert abs((restored.max(0) - restored.min(0)).max()
               - (obj.max(0) - obj.min(0)).max()) < 0.5
    merged = ds.inverse_scale_to_scene(0, pcd)
    assert merged.shape == (100 + 1024, 3)


def test_real_data_missing_assets_raise(tmp_path):
    np.save(tmp_path / "object_0.npy", np.zeros((10, 3), np.float32))
    ds = RealDataNPYDataset(str(tmp_path))
    with pytest.raises(ValueError):
        ds.get_scene(0)
    with pytest.raises(ValueError):
        ds.get_obj_box(0)


def test_3depn_split_by_csv(tmp_path):
    """Reference quirk + framework fix: by default train == val (the slicer
    pools CSV train+val models into one slices/ tree and both branches list
    the whole dir — reference shapenet_3depn.py:101-104); split_by_csv=True
    filters by the official labels so val is genuinely held out."""
    make_3depn_tree(tmp_path, n_models=4)
    rows = [["id", "synsetId", "subSynsetId", "modelId", "split"],
            ["000000", CAT, CAT, "m00", "test"],
            ["000001", CAT, CAT, "m01", "train"],
            ["000002", CAT, CAT, "m02", "train"],
            ["000003", CAT, CAT, "m03", "val"]]
    with open(join(tmp_path, "shapenet-official-split.csv"), "w", newline="") as fh:
        csv.writer(fh).writerows(rows)

    # default = reference parity: both splits see every sliced model
    tr = ShapeNet3DEPNDataset(str(tmp_path), split="train", classes=[CAT], num_samples=2)
    va = ShapeNet3DEPNDataset(str(tmp_path), split="val", classes=[CAT], num_samples=2)
    assert tr.shape_names == va.shape_names and len(tr) == len(va) == 8

    tr2 = ShapeNet3DEPNDataset(str(tmp_path), split="train", classes=[CAT],
                               num_samples=2, split_by_csv=True)
    va2 = ShapeNet3DEPNDataset(str(tmp_path), split="val", classes=[CAT],
                               num_samples=2, split_by_csv=True)
    assert tr2.shape_names == ["m01.ply", "m02.ply"]
    assert va2.shape_names == ["m03.ply"]
    assert len(tr2) == 4 and len(va2) == 2
    assert not set(tr2.shape_names) & set(va2.shape_names)


def test_3depn_cache(tmp_path):
    make_3depn_tree(tmp_path)
    ds = ShapeNet3DEPNDataset(str(tmp_path), split="train", classes=[CAT],
                              num_samples=2, cache=True)
    a = ds[0]
    assert len(ds._cache) == 3  # existing + missing + gt
    b = ds[0]
    for x, y in zip(a[:3], b[:3]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # cache kwarg reaches the validation datasets through the classmethod
    vals = ShapeNet3DEPNDataset.get_validation_datasets(
        str(tmp_path), classes=[CAT], cache=True)
    (ds_val,) = vals.values()
    assert ds_val._cache == {}
    if len(ds_val):
        ds_val[0]
        assert len(ds_val._cache) == 3


def test_synthetic_completion3d_generator(tmp_path):
    """Production-shape synthetic Completion3D tree loads through the
    dataset family end-to-end (all three v2 categories, 2048-pt clouds,
    test split partial-only)."""
    pytest.importorskip("h5py")
    from util_scripts.make_synthetic_completion3d import make_synthetic_completion3d

    make_synthetic_completion3d(str(tmp_path), n_per_cat=3, seed=0, n_points=256)
    train = Completion3DDataset(str(tmp_path), split="train")
    assert len(train) > 0
    existing, missing, gt, name = train[0]
    assert existing.shape == (256, 3) and gt.shape == (256, 3)
    assert np.ndim(missing) == 0  # scalar placeholder, completion3d.py:48
    test = Completion3DDataset(str(tmp_path), split="test")
    if len(test):
        e, _, g, _ = test[0]
        np.testing.assert_array_equal(np.asarray(e), np.asarray(g))
    # all three v2 family categories present across the splits
    cats = set()
    for split in ("train", "val", "test"):
        with open(join(tmp_path, f"{split}.list")) as fh:
            cats.update(line.split("/")[0] for line in fh.read().splitlines() if line)
    assert cats == {"02691156", "03001627", "04379243"}


def test_synthetic_3depn_table_family(tmp_path):
    """The v2 table family generates a valid 3D-EPN tree entry: thin top
    slab above four legs, consumable by the 3D-EPN dataset."""
    from util_scripts.make_synthetic_3depn import TABLE, make_synthetic_3depn

    make_synthetic_3depn(str(tmp_path), {TABLE: 4}, seed=0, style="v2")
    pc_dir = join(tmp_path, "ShapeNetPointCloud", TABLE)
    files = sorted(os.listdir(pc_dir))
    assert len(files) == 4
    from hyperpocket_tpu.data.plyio import load_ply

    pts = load_ply(join(pc_dir, files[0]))
    assert pts.shape[1] == 3 and np.isfinite(pts).all()
    # structure: points well below the top slab exist (legs), and the
    # z-extent exceeds the top slab's own thickness many times over
    z = pts[:, 2]
    assert z.max() - z.min() > 0.15
    assert (z < z.max() - 0.1).sum() > 50


def test_3depn_multiclass_train_extension(tmp_path, caplog):
    """Reference quirk + extension: the 3depn train branch reads classes[0]
    only (reference shapenet_3depn.py:102-104 — it only ships per-class
    configs), so a multi-class parity config must warn loudly and
    dataset.multiclass_train=true must concatenate real per-class sets."""
    import logging

    from hyperpocket_tpu.data.base import get_datasets

    cat2 = "02691156"  # airplane
    make_3depn_tree(tmp_path)
    # second category: 2 models, same layout
    rng = np.random.default_rng(7)
    rows = list(csv.reader(open(join(tmp_path, "shapenet-official-split.csv"))))
    for d in ("existing", "missing", "gt"):
        os.makedirs(join(tmp_path, "slices", d, cat2), exist_ok=True)
    for i in range(2):
        name = f"a{i:02d}"
        gt = rng.standard_normal((256, 3)).astype(np.float32)
        save_ply(join(tmp_path, "slices", "gt", cat2, name + ".ply"), gt)
        for k in range(2):
            save_ply(join(tmp_path, "slices", "existing", cat2, f"{k}~{name}.ply"), gt[:128])
            save_ply(join(tmp_path, "slices", "missing", cat2, f"{k}~{name}.ply"), gt[128:])
        rows.append([f"9{i:05d}", cat2, cat2, name, "train"])
    with open(join(tmp_path, "shapenet-official-split.csv"), "w", newline="") as fh:
        csv.writer(fh).writerows(rows)

    cfg = {"name": "3depn", "path": str(tmp_path), "classes": [CAT, cat2],
           "num_samples": 2}
    # parity default: classes[0] only, with a warning
    with caplog.at_level(logging.WARNING):
        train, val, test = get_datasets(cfg)
    assert len(train) == 6  # 3 chair models x 2 samples; airplanes DROPPED
    assert any("ONLY the first class" in r.message for r in caplog.records)
    assert set(val) == {"chair", "airplane"}

    # extension: true multi-class concat
    train2, _, _ = get_datasets({**cfg, "multiclass_train": True})
    assert len(train2) == 6 + 4  # + 2 airplane models x 2 samples
    labels = {train2[i][3] for i in range(len(train2))}
    assert {"m00", "a00"} <= labels
    import pytest as _pytest
    with _pytest.raises(IndexError):
        train2[len(train2)]
