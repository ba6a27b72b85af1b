"""Generate a synthetic parametric-shape MissingShapeNet tree.

No counterpart in the reference — a convenience for smoke-testing the full
pipeline at production shapes (2048-pt gt, 1024-pt plane-sliced halves)
without downloading ShapeNet. Shapes are random ellipsoid surfaces (a family
a PointNet encoder + hypernet can actually learn, so losses visibly drop).

Usage:
  python util_scripts/make_synthetic_dataset.py <out_dir> [n_models] [seed]
"""

from __future__ import annotations

import os
import sys
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyperpocket_tpu.data.plyio import save_ply
from hyperpocket_tpu.data.slicer import slice_point_cloud

CAT = "02691156"


def make_ellipsoid_dataset(root: str, n_models: int = 120, seed: int = 0,
                           n_gt: int = 2048, n_half: int = 1024) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(join(root, CAT), exist_ok=True)
    for d in ("existing", "missing"):
        os.makedirs(join(root, "slices", d, CAT), exist_ok=True)
    names = []
    for i in range(n_models):
        axes = rng.uniform(0.1, 0.45, 3)
        direction = rng.standard_normal((n_gt, 3))
        direction /= np.linalg.norm(direction, axis=1, keepdims=True)
        gt = (direction * axes).astype(np.float32)
        name = f"ell{i:03d}"
        names.append(f"{CAT}/{name}")
        save_ply(join(root, CAT, name + ".ply"), gt)
        existing, missing = slice_point_cloud(gt, n_half, rng=rng)
        save_ply(join(root, "slices", "existing", CAT, f"0~{name}.ply"), existing)
        save_ply(join(root, "slices", "missing", CAT, f"0~{name}.ply"), missing)
    n_train = int(0.8 * n_models)
    n_val = max(1, int(0.13 * n_models))
    splits = (("train", names[:n_train]),
              ("val", names[n_train : n_train + n_val]),
              ("test", names[n_train + n_val :]))
    for split, sel in splits:
        with open(join(root, split + ".list"), "w") as fh:
            fh.write("\n".join(sel))
    print(f"{n_models} models at {root} "
          f"(train/val/test = {n_train}/{n_val}/{n_models - n_train - n_val})")


if __name__ == "__main__":
    out = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    make_ellipsoid_dataset(out, n, seed)
