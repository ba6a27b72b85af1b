"""Generate a synthetic Completion3D-layout tree at production shapes.

Emits the exact on-disk layout the Completion3D pipeline consumes
(reference datasets/completion.py:24-59; our data/completion3d.py):

* ``{train,val}/{partial,gt}/<cat>/<model>.h5`` — 2048-point clouds under a
  ``data`` dataset (the benchmark's format),
* ``test/partial/<cat>/<model>.h5`` — test has partials only (gt := existing
  downstream, completion3d.py:44-46),
* ``{train,val,test}.list`` — ``<cat>/<model>`` rows.

Shapes come from the same v2 structured families as the synthetic 3D-EPN
tree (make_synthetic_3depn): box-assembly chairs/airplanes/tables whose
half-space "partials" remove whole parts, so reconstruction has structure to
recover. Partials are visible-side samples resampled to 2048 points exactly
as the benchmark ships them.

No counterpart in the reference (it assumes the benchmark download); this
feeds the chip-scale Completion3D rehearsal.

Usage:
  python util_scripts/make_synthetic_completion3d.py <out_dir> [n_per_cat] [seed]
"""

from __future__ import annotations

import os
import sys
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_synthetic_3depn import FAMILIES_V2  # noqa: E402


def _resample(rng: np.random.Generator, pts: np.ndarray, n: int) -> np.ndarray:
    """Exact-n resample, with replacement only when short (benchmark style)."""
    if pts.shape[0] >= n:
        return pts[rng.permutation(pts.shape[0])[:n]]
    extra = rng.integers(0, pts.shape[0], n - pts.shape[0])
    return np.concatenate([pts, pts[extra]])


def make_synthetic_completion3d(root: str, n_per_cat: int = 100,
                                seed: int = 0, n_points: int = 2048) -> None:
    import h5py

    rng = np.random.default_rng(seed)
    lists: dict[str, list[str]] = {"train": [], "val": [], "test": []}
    for cat, fam in sorted(FAMILIES_V2.items()):
        for i in range(n_per_cat):
            name = f"{cat}/syn{cat[-3:]}_{i:04d}"
            gt = _resample(rng, fam(rng, int(rng.integers(2400, 3600))), n_points)
            # partial: visible half-space from a random view, jittered,
            # resampled to the same count as the benchmark partials
            view = rng.standard_normal(3)
            view /= np.linalg.norm(view)
            vis = gt[gt @ view > rng.uniform(-0.05, 0.05)]
            if vis.shape[0] < 32:
                vis = gt[np.argsort(gt @ view)[-256:]]
            partial = _resample(rng, vis + rng.normal(0, 0.003, vis.shape), n_points)
            u = rng.uniform()
            split = "train" if u < 0.85 else ("val" if u < 0.925 else "test")
            lists[split].append(name)
            kinds = ("partial",) if split == "test" else ("partial", "gt")
            for kind in kinds:
                path = join(root, split, kind, name + ".h5")
                os.makedirs(os.path.dirname(path), exist_ok=True)
                with h5py.File(path, "w") as fh:
                    fh.create_dataset(
                        "data",
                        data=(partial if kind == "partial" else gt).astype(np.float32),
                    )
    for split, names in lists.items():
        with open(join(root, f"{split}.list"), "w") as fh:
            fh.write("\n".join(names))
    print(f"{sum(map(len, lists.values()))} models at {root}: " +
          ", ".join(f"{s}={len(n)}" for s, n in lists.items()))


if __name__ == "__main__":
    out = sys.argv[1]
    n_per_cat = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    make_synthetic_completion3d(out, n_per_cat, seed)
