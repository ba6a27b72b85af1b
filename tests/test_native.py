"""Native C++ data-plane vs the numpy oracle (skipped when not built)."""

import subprocess
from os.path import dirname, join

import numpy as np
import pytest

from hyperpocket_tpu.data import native, plyio

REPO = dirname(dirname(__file__))


@pytest.fixture(scope="module", autouse=True)
def build_native():
    if not native.available():
        subprocess.run(["make", "-C", join(REPO, "native")], check=False, capture_output=True)
        native._load_lib.cache_clear()
    if not native.available():
        pytest.skip("native library not buildable here")


def test_roundtrip_parity(tmp_path):
    pts = np.random.default_rng(0).standard_normal((777, 3)).astype(np.float32)
    p_numpy, p_native = tmp_path / "a.ply", tmp_path / "b.ply"
    plyio.save_ply(p_numpy, pts)
    native.save_ply(str(p_native), pts)
    np.testing.assert_array_equal(native.load_ply(str(p_numpy)), pts)
    np.testing.assert_array_equal(plyio._load_ply_numpy(p_native), pts)


def test_extra_columns(tmp_path):
    """Native reader skips non-xyz vertex properties like the numpy one."""
    n = 16
    rec = np.empty(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("c", "<f4")])
    rng = np.random.default_rng(1)
    for k in rec.dtype.names:
        rec[k] = rng.standard_normal(n)
    p = tmp_path / "extra.ply"
    header = (
        f"ply\nformat binary_little_endian 1.0\nelement vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float confidence\nend_header\n"
    )
    with open(p, "wb") as fh:
        fh.write(header.encode())
        fh.write(rec.tobytes())
    out = native.load_ply(str(p))
    np.testing.assert_array_equal(out[:, 0], rec["x"])
    np.testing.assert_array_equal(out[:, 2], rec["z"])


def test_batch_load_and_error(tmp_path):
    pts = np.random.default_rng(2).standard_normal((128, 3)).astype(np.float32)
    paths = []
    for i in range(8):
        p = tmp_path / f"c{i}.ply"
        plyio.save_ply(p, pts + i)
        paths.append(str(p))
    batch = native.load_ply_batch(paths, 128)
    assert batch.shape == (8, 128, 3)
    for i in range(8):
        np.testing.assert_array_equal(batch[i], pts + i)

    plyio.save_ply(tmp_path / "short.ply", pts[:10])
    with pytest.raises(IOError, match="short.ply"):
        native.load_ply_batch(paths[:2] + [str(tmp_path / "short.ply")], 128)


def test_dispatch_prefers_native_with_fallback(tmp_path):
    """plyio.load_ply must still read ascii files (native can't)."""
    p = tmp_path / "ascii.ply"
    with open(p, "w") as fh:
        fh.write(
            "ply\nformat ascii 1.0\nelement vertex 2\n"
            "property float x\nproperty float y\nproperty float z\nend_header\n"
            "1 2 3\n4 5 6\n"
        )
    out = plyio.load_ply(p)
    np.testing.assert_allclose(out, [[1, 2, 3], [4, 5, 6]])
