"""Data layer: PLY I/O roundtrips, slicer property, datasets on synthetic trees."""

import os
from os.path import join

import numpy as np
import pytest

from hyperpocket_tpu.data import load_ply, save_ply, slice_point_cloud
from hyperpocket_tpu.data import plyio
from hyperpocket_tpu.data.base import get_datasets, resample_pcd
from hyperpocket_tpu.data.loader import BatchLoader, collate
from hyperpocket_tpu.data.shapenet import MissingShapeNetDataset
from hyperpocket_tpu.data.slicer import HyperPlane


def test_ply_roundtrip(tmp_path):
    pts = np.random.default_rng(0).standard_normal((777, 3)).astype(np.float32)
    p = tmp_path / "cloud.ply"
    save_ply(p, pts)
    back = load_ply(p)
    np.testing.assert_array_equal(back, pts)


def test_ply_ascii(tmp_path):
    pts = np.array([[1.5, 2.5, 3.5], [-1, 0, 2]], dtype=np.float32)
    p = tmp_path / "a.ply"
    with open(p, "w") as fh:
        fh.write(
            "ply\nformat ascii 1.0\nelement vertex 2\n"
            "property float x\nproperty float y\nproperty float z\nend_header\n"
            "1.5 2.5 3.5\n-1 0 2\n"
        )
    np.testing.assert_allclose(load_ply(p), pts)


def test_ply_extra_properties(tmp_path):
    """binary PLY with extra per-vertex columns (e.g. normals) still loads xyz."""
    n = 10
    pts = np.random.default_rng(1).standard_normal((n, 3)).astype("<f4")
    extra = np.random.default_rng(2).standard_normal((n,)).astype("<f4")
    p = tmp_path / "b.ply"
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float confidence\nend_header\n"
    )
    rec = np.empty(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("c", "<f4")])
    rec["x"], rec["y"], rec["z"], rec["c"] = pts[:, 0], pts[:, 1], pts[:, 2], extra
    with open(p, "wb") as fh:
        fh.write(header.encode())
        fh.write(rec.tobytes())
    np.testing.assert_array_equal(load_ply(p), pts)


def test_ply_rejects_garbage(tmp_path):
    p = tmp_path / "bad.ply"
    p.write_bytes(b"not a ply at all")
    with pytest.raises(ValueError):
        load_ply(p)


def test_slicer_exact_split():
    rng = np.random.default_rng(3)
    pts = rng.standard_normal((2048, 3)).astype(np.float32)
    existing, missing = slice_point_cloud(pts, 1024, rng=rng)
    assert existing.shape == (1024, 3)
    assert missing.shape == (1024, 3)
    # together they are a permutation of the input
    both = np.concatenate([existing, missing])
    assert sorted(map(tuple, both)) == sorted(map(tuple, pts))


def test_hyperplane_sign():
    plane = HyperPlane(np.array([0.0, 0.0, 1.0]), 0.0)
    signs = plane.check_point(np.array([[0, 0, 1.0], [0, 0, -1.0]]))
    assert signs[0] > 0 > signs[1]


def test_resample_pcd_sizes():
    pts = np.arange(30).reshape(10, 3).astype(np.float32)
    up = resample_pcd(pts, 25)
    down = resample_pcd(pts, 4)
    assert up.shape == (25, 3) and down.shape == (4, 3)
    # all rows must come from the original cloud
    orig = set(map(tuple, pts))
    assert set(map(tuple, up)) <= orig


# ---------------------------------------------------------------------------
# synthetic MissingShapeNet tree
# ---------------------------------------------------------------------------

CAT = "02691156"  # airplane


def make_synthetic_shapenet(root, n_models=6, num_samples=1, n_gt=128, n_part=64, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(join(root, CAT), exist_ok=True)
    names = []
    for i in range(n_models):
        name = f"model{i:03d}"
        names.append(f"{CAT}/{name}")
        gt = rng.standard_normal((n_gt, 3)).astype(np.float32) * 0.2
        save_ply(join(root, CAT, name + ".ply"), gt)
        for k in range(num_samples):
            for kind, sl in (("existing", gt[:n_part]), ("missing", gt[n_part : 2 * n_part])):
                os.makedirs(join(root, "slices", kind, CAT), exist_ok=True)
                save_ply(join(root, "slices", kind, CAT, f"{k}~{name}.ply"), sl)
    for split, sel in (("train", names[:4]), ("val", names[4:5]), ("test", names[5:])):
        with open(join(root, split + ".list"), "w") as fh:
            fh.write("\n".join(sel) + "\n")
    return names


def test_missing_shapenet_dataset(tmp_path):
    make_synthetic_shapenet(tmp_path)
    ds = MissingShapeNetDataset(str(tmp_path), split="train", num_samples=1)
    assert len(ds) == 4
    existing, missing, gt, label = ds[0]
    assert existing.shape == (64, 3) and missing.shape == (64, 3) and gt.shape == (128, 3)
    assert label == 0  # airplane ordinal


def test_get_datasets_factory(tmp_path):
    make_synthetic_shapenet(tmp_path)
    cfg = {"name": "shapenet", "path": str(tmp_path), "classes": [CAT],
           "is_rotated": False, "num_samples": 1, "gen_test_set": False}
    train, val, test = get_datasets(cfg)
    assert len(train) == 4
    assert list(val.keys()) == ["airplane"] and len(val["airplane"]) == 1
    assert list(test.keys()) == ["airplane"] and len(test["airplane"]) == 1
    with pytest.raises(ValueError):
        get_datasets({"name": "nope", "path": "/x"})


def test_classes_accept_category_names(tmp_path):
    """Names ('airplane') select the same data as synset ids ('02691156').

    Strict superset of the reference: its PCN-list branch silently matches
    nothing on names (shapenet.py:33-34) and its per-class factory KeyErrors
    (shapenet.py:104); id configs stay bit-identical."""
    make_synthetic_shapenet(tmp_path)
    by_id = MissingShapeNetDataset(str(tmp_path), split="train", num_samples=1, classes=[CAT])
    by_name = MissingShapeNetDataset(str(tmp_path), split="train", num_samples=1, classes=["airplane"])
    assert by_name.names == by_id.names and len(by_name) == 4
    cfg = {"name": "shapenet", "path": str(tmp_path), "classes": ["airplane"],
           "is_rotated": False, "num_samples": 1, "gen_test_set": False}
    train, val, test = get_datasets(cfg)
    assert len(train) == 4
    assert list(val.keys()) == ["airplane"] and list(test.keys()) == ["airplane"]
    with pytest.raises(ValueError, match="not_a_category"):
        MissingShapeNetDataset(str(tmp_path), split="train", classes=["not_a_category"])


def test_batch_loader_determinism_and_drop_last(tmp_path):
    make_synthetic_shapenet(tmp_path, n_models=10)
    ds = MissingShapeNetDataset(str(tmp_path), split="train", num_samples=1)  # len 4... need more
    # use all 10 models by writing a bigger train list
    with open(join(tmp_path, "train.list"), "w") as fh:
        fh.write("\n".join(f"{CAT}/model{i:03d}" for i in range(10)))
    ds = MissingShapeNetDataset(str(tmp_path), split="train", num_samples=1)
    loader = BatchLoader(ds, 3, shuffle=True, drop_last=True, seed=7, num_workers=2)
    assert len(loader) == 3  # 10 // 3
    b1 = [b[0] for b in loader.epoch(1)]
    b2 = [b[0] for b in loader.epoch(1)]
    b3 = [b[0] for b in loader.epoch(2)]
    assert all(x.shape == (3, 64, 3) for x in b1)
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a, b)  # same epoch -> same order
    assert any(not np.array_equal(a, b) for a, b in zip(b1, b3))  # epochs differ


def test_collate_mixed_types():
    items = [(np.ones((4, 3), np.float32), 0, np.zeros((8, 3), np.float32), "a"),
             (np.ones((4, 3), np.float32), 0, np.zeros((8, 3), np.float32), "b")]
    e, m, g, labels = collate(items)
    assert e.shape == (2, 4, 3) and g.shape == (2, 8, 3)
    assert m.tolist() == [0, 0]
    assert labels == ["a", "b"]


def test_loader_propagates_worker_errors(tmp_path):
    class Boom:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("broken item")

    loader = BatchLoader(Boom(), 2, num_workers=2)
    with pytest.raises(RuntimeError, match="broken item"):
        list(loader.epoch(0))


def test_loader_early_exit_does_not_leak(tmp_path):
    """Breaking out of an epoch mid-way must stop the producer promptly."""
    import threading
    import time

    make_synthetic_shapenet(tmp_path, n_models=10)
    with open(join(tmp_path, "train.list"), "w") as fh:
        fh.write("\n".join(f"{CAT}/model{i:03d}" for i in range(10)))
    ds = MissingShapeNetDataset(str(tmp_path), split="train", num_samples=1)
    loader = BatchLoader(ds, 1, num_workers=2, prefetch=1)
    before = threading.active_count()
    for _ in range(5):
        g = loader.epoch(0)
        next(g)
        g.close()
    # bounded puts let producers notice the stop event within ~0.1s each
    deadline = time.monotonic() + 5.0
    while threading.active_count() > before + 1 and time.monotonic() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before + 1


def test_loader_process_sharding(tmp_path):
    """Each host slice of a global batch is disjoint and covers the batch."""
    make_synthetic_shapenet(tmp_path, n_models=10)
    with open(join(tmp_path, "train.list"), "w") as fh:
        fh.write("\n".join(f"{CAT}/model{i:03d}" for i in range(8)))
    ds = MissingShapeNetDataset(str(tmp_path), split="train", num_samples=1)

    full = BatchLoader(ds, 4, shuffle=True, seed=3, drop_last=True)
    shards = [BatchLoader(ds, 4, shuffle=True, seed=3, drop_last=True,
                          process_shard=(p, 2)) for p in range(2)]
    full_batches = full._batch_indices(1)
    shard_batches = [s._batch_indices(1) for s in shards]
    for bi, fb in enumerate(full_batches):
        merged = np.concatenate([shard_batches[0][bi], shard_batches[1][bi]])
        np.testing.assert_array_equal(merged, fb)

    with pytest.raises(ValueError, match="not divisible"):
        BatchLoader(ds, 5, process_shard=(0, 2))


def test_dataset_cache(tmp_path):
    make_synthetic_shapenet(tmp_path)
    ds = MissingShapeNetDataset(str(tmp_path), split="train", num_samples=1, cache=True)
    a = ds[0]
    b = ds[0]
    np.testing.assert_array_equal(a[2], b[2])
    assert len(ds._cache) == 3  # existing + missing + gt cached
    # rotation augmentation must not mutate the cached arrays
    ds_rot = MissingShapeNetDataset(str(tmp_path), split="train", num_samples=1,
                                    cache=True, is_random_rotated=True)
    ds_rot[0]
    cached = ds_rot._cache[join(str(tmp_path), CAT, "model000.ply")]
    np.testing.assert_array_equal(cached, load_ply(join(str(tmp_path), CAT, "model000.ply")))


def test_device_slicer_matches_host_semantics():
    import jax

    from hyperpocket_tpu.data.slicer import slice_point_cloud_device

    rng = np.random.default_rng(9)
    pts = rng.standard_normal((512, 3)).astype(np.float32)
    fn = jax.jit(lambda p, k: slice_point_cloud_device(p, k, 256))
    existing, missing = fn(pts, jax.random.key(0))
    existing, missing = np.asarray(existing), np.asarray(missing)
    assert existing.shape == (256, 3) and missing.shape == (256, 3)
    both = np.concatenate([existing, missing])
    assert sorted(map(tuple, both)) == sorted(map(tuple, pts))
    # different keys -> different slicings
    e2, _ = fn(pts, jax.random.key(1))
    assert not np.array_equal(existing, np.asarray(e2))


def test_gen_test_set_path(tmp_path):
    """is_gen test split reads test_gen/{right,left,gt} with resampling."""
    rng = np.random.default_rng(11)
    make_synthetic_shapenet(tmp_path, n_models=6)
    for side in ("left", "right", "gt"):
        os.makedirs(join(tmp_path, "test_gen", side, CAT), exist_ok=True)
    name = "model005.ply"  # the test-split model
    gt = rng.standard_normal((2048, 3)).astype(np.float32)
    order = gt[:, 1].argsort()
    save_ply(join(tmp_path, "test_gen", "left", CAT, name), gt[order[:1024]])
    save_ply(join(tmp_path, "test_gen", "right", CAT, name), gt[order[1024:]])
    save_ply(join(tmp_path, "test_gen", "gt", CAT, name), gt)

    ds = MissingShapeNetDataset(str(tmp_path), split="test", num_samples=4, is_gen=True)
    assert len(ds) == 1  # is_gen forces num_samples=1
    existing, missing, out_gt, label = ds[0]
    assert existing.shape == (1024, 3) and missing.shape == (1024, 3)
    assert out_gt.shape == (2048, 3)
    # existing comes from the right (high-y) half
    assert existing[:, 1].mean() > missing[:, 1].mean()


def test_ply_big_endian(tmp_path):
    n = 5
    pts = np.random.default_rng(4).standard_normal((n, 3)).astype(">f4")
    p = tmp_path / "be.ply"
    header = (
        "ply\nformat binary_big_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\nend_header\n"
    )
    rec = np.empty(n, dtype=[("x", ">f4"), ("y", ">f4"), ("z", ">f4")])
    rec["x"], rec["y"], rec["z"] = pts[:, 0], pts[:, 1], pts[:, 2]
    with open(p, "wb") as fh:
        fh.write(header.encode())
        fh.write(rec.tobytes())
    np.testing.assert_array_equal(load_ply(p), pts.astype("<f4"))


def test_ply_binary_element_before_vertex(tmp_path):
    """A list-carrying element declared before vertex is skipped correctly."""
    n = 4
    pts = np.random.default_rng(5).standard_normal((n, 3)).astype("<f4")
    p = tmp_path / "face_first.ply"
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        "element face 2\nproperty list uchar int vertex_indices\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\nend_header\n"
    )
    body = b""
    for idxs in ([0, 1, 2], [1, 2, 3]):
        body += np.uint8(len(idxs)).tobytes() + np.asarray(idxs, "<i4").tobytes()
    body += pts.tobytes()
    with open(p, "wb") as fh:
        fh.write(header.encode())
        fh.write(body)
    np.testing.assert_array_equal(load_ply(p), pts)


def test_ply_binary_vertex_list_property(tmp_path):
    """List properties ON the vertex element (plyfile-general) are skipped."""
    n = 3
    pts = np.random.default_rng(6).standard_normal((n, 3)).astype("<f4")
    p = tmp_path / "vlist.ply"
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty list uchar float weights\n"
        "property float y\nproperty float z\nend_header\n"
    )
    body = b""
    for r in range(n):
        body += pts[r, 0].tobytes()
        w = np.arange(r + 1, dtype="<f4")  # variable-length list
        body += np.uint8(len(w)).tobytes() + w.tobytes()
        body += pts[r, 1].tobytes() + pts[r, 2].tobytes()
    with open(p, "wb") as fh:
        fh.write(header.encode())
        fh.write(body)
    np.testing.assert_array_equal(load_ply(p), pts)


def test_ply_ascii_vertex_list_property(tmp_path):
    pts = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]], dtype=np.float32)
    p = tmp_path / "alist.ply"
    with open(p, "w") as fh:
        fh.write(
            "ply\nformat ascii 1.0\nelement vertex 2\n"
            "property float x\nproperty list uchar float w\n"
            "property float y\nproperty float z\nend_header\n"
            "1 2 9.5 0.5 2 3\n"
            "4 0 5 6\n"
        )
    np.testing.assert_array_equal(load_ply(p), pts)


def test_ply_ignores_truncated_trailing_elements(tmp_path):
    """Elements after vertex are not parsed; a truncated face block must not
    fail the load (review finding; matches the strict reader's behavior)."""
    n = 4
    pts = np.random.default_rng(8).standard_normal((n, 3)).astype("<f4")
    p = tmp_path / "trailing.ply"
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty list uchar float w\n"
        "property float y\nproperty float z\n"
        "element face 1000000\nproperty list uchar int vertex_indices\n"
        "end_header\n"
    )
    body = b""
    for r in range(n):
        body += pts[r, 0].tobytes() + np.uint8(0).tobytes()
        body += pts[r, 1].tobytes() + pts[r, 2].tobytes()
    body += b"\x03" + np.asarray([0, 1, 2], "<i4").tobytes()  # 1 of 1M faces
    with open(p, "wb") as fh:
        fh.write(header.encode())
        fh.write(body)
    np.testing.assert_array_equal(load_ply(p), pts)


def test_ply_truncated_vertex_list_raises_parse_error(tmp_path):
    from hyperpocket_tpu.data.plyio import PlyParseError, _load_ply_numpy

    p = tmp_path / "trunc.ply"
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        "element vertex 2\n"
        "property float x\nproperty list uchar float w\n"
        "property float y\nproperty float z\nend_header\n"
    )
    body = np.float32(1.0).tobytes() + np.uint8(4).tobytes()  # claims 4 floats, has none
    with open(p, "wb") as fh:
        fh.write(header.encode())
        fh.write(body)
    with pytest.raises(PlyParseError):
        _load_ply_numpy(p)


# --- general element/property PLY API (plyfile's full envelope) ------------


def _mesh_elements():
    verts = [
        ("x", np.array([0.0, 1.0, 0.5, 0.25], np.float32)),
        ("y", np.array([0.0, 0.0, 1.0, 0.5], np.float32)),
        ("z", np.array([0.0, 0.0, 0.0, 1.0], np.float32)),
        ("red", np.array([255, 0, 0, 128], np.uint8)),
        ("quality", np.array([0.5, -1.25, 3.75, 0.0], np.float64)),
    ]
    faces = [
        ("vertex_indices", plyio.ListProperty(
            [[0, 1, 2], [0, 2, 3], [0, 1, 2, 3]], "uchar", "int")),
        ("flags", np.array([1, 2, 3], np.int16)),
    ]
    edges = [
        ("v1", np.array([0, 1], np.int32)),
        ("v2", np.array([1, 2], np.int32)),
    ]
    return [("vertex", verts), ("face", faces), ("edge", edges)]


@pytest.mark.parametrize("fmt", ["ascii", "binary_little_endian", "binary_big_endian"])
def test_ply_elements_roundtrip(tmp_path, fmt):
    """Arbitrary elements + scalar/list properties survive a write/read cycle
    in every format (vendored plyfile envelope, utils/plyfile.py:364-916)."""
    path = str(tmp_path / f"mesh_{fmt}.ply")
    elements = _mesh_elements()
    plyio.save_ply_elements(path, elements, fmt=fmt, comments=["made by test"])
    back = plyio.load_ply_elements(path)
    assert [n for n, _ in back] == ["vertex", "face", "edge"]
    for (_, want_props), (_, got_props) in zip(elements, back):
        assert [p for p, _ in got_props] == [p for p, _ in want_props]
        for (_, want), (_, got) in zip(want_props, got_props):
            if isinstance(want, plyio.ListProperty):
                assert got == want
            else:
                assert got.dtype == np.asarray(want).dtype
                np.testing.assert_array_equal(got, want)


def test_ply_elements_vertex_readable_by_pipeline_reader(tmp_path):
    """A general-API mesh's vertex block is readable by the (N, 3) loader."""
    path = str(tmp_path / "mesh.ply")
    elements = _mesh_elements()
    plyio.save_ply_elements(path, elements, fmt="binary_little_endian")
    pts = plyio.load_ply(path)
    np.testing.assert_allclose(pts[:, 0], elements[0][1][0][1])
    np.testing.assert_allclose(pts[:, 2], elements[0][1][2][1])


def test_ply_elements_list_count_value_types(tmp_path):
    """Non-default list count/value types are preserved (plyfile.py:670)."""
    path = str(tmp_path / "wide.ply")
    lp = plyio.ListProperty([[1.5, 2.5], [3.5]], "ushort", "double")
    plyio.save_ply_elements(path, [("samples", [("vals", lp)])],
                            fmt="binary_little_endian")
    (_, props), = plyio.load_ply_elements(path)
    got = props[0][1]
    assert got.count_type == "ushort" and got.value_type == "double"
    assert got == lp
    # and the header declares them
    header = open(path, "rb").read(200).decode("ascii", "replace")
    assert "property list ushort double vals" in header


def test_ply_elements_mismatched_lengths_raise(tmp_path):
    with pytest.raises(ValueError, match="lengths differ"):
        plyio.save_ply_elements(
            str(tmp_path / "bad.ply"),
            [("vertex", [("x", np.zeros(3, np.float32)),
                         ("y", np.zeros(2, np.float32))])])
