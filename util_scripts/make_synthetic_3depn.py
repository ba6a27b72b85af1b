"""Generate a synthetic RAW 3D-EPN tree (no counterpart in the reference).

Emits the exact on-disk layout the 3D-EPN pipeline consumes
(reference datasets/shapenet_3depn.py:80-123; our data/shapenet_3depn.py):

* ``ShapeNetPointCloud/<cat>/<model>.ply`` — complete clouds at non-2048
  counts (exercises ``sample_point_cloud_by_n`` resampling),
* ``shapenet_dim32_sdf_pc/<cat>/<model>__{0..7}__.ply`` — eight z-up
  half-space "scans" per model at varying counts (exercises the fixed
  axis-swap rotation and both resampling directions),
* ``shapenet-official-split.csv`` — header + (id, synsetId, modelId, split)
  rows, the columns collect_split_by_id reads.

Run ``util_scripts/generate_partial_dataset.py -c <config>`` afterwards to
produce the train/val ``slices/`` tree, exactly as a user would for the real
download.

Two visually/parametrically distinct families so cross-category experiments
(merge_different_categories) are meaningful:

* chair (03001627): superellipsoids — gaussian directions normalized under a
  random p-norm (p in [2, 6]: round to boxy), anisotropic axes;
* airplane (02691156): crossed ellipsoids (elongated fuselage + thin wide
  wing lobe).

Usage:
  python util_scripts/make_synthetic_3depn.py <out_dir> [n_chair] [n_airplane] [seed]
"""

from __future__ import annotations

import os
import sys
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyperpocket_tpu.data.plyio import save_ply
from hyperpocket_tpu.data.shapenet_3depn import _AXIS_SWAP

CHAIR, AIRPLANE = "03001627", "02691156"


def _superellipsoid(rng, n):
    axes = rng.uniform(0.12, 0.45, 3)
    p = rng.uniform(2.0, 6.0)
    d = rng.standard_normal((n, 3))
    norm = np.power(np.sum(np.abs(d) ** p, axis=1), 1.0 / p)
    return (axes * d / norm[:, None]).astype(np.float32)


def _airplane(rng, n):
    n_f = n // 2
    fus_axes = np.array([rng.uniform(0.35, 0.45), rng.uniform(0.04, 0.08),
                         rng.uniform(0.04, 0.08)])
    wing_axes = np.array([rng.uniform(0.05, 0.1), rng.uniform(0.01, 0.02),
                          rng.uniform(0.25, 0.4)])
    parts = []
    for axes, m, off in ((fus_axes, n_f, 0.0), (wing_axes, n - n_f,
                                                rng.uniform(-0.1, 0.1))):
        d = rng.standard_normal((m, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        pts = axes * d
        pts[:, 0] += off
        parts.append(pts)
    return np.concatenate(parts).astype(np.float32)


FAMILIES = {CHAIR: _superellipsoid, AIRPLANE: _airplane}


def make_synthetic_3depn(root: str, n_models: dict[str, int], seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    rows = []
    for cat, count in n_models.items():
        pc_dir = join(root, "ShapeNetPointCloud", cat)
        raw_dir = join(root, "shapenet_dim32_sdf_pc", cat)
        os.makedirs(pc_dir, exist_ok=True)
        os.makedirs(raw_dir, exist_ok=True)
        fam = FAMILIES[cat]
        for i in range(count):
            name = f"syn{cat[-3:]}_{i:04d}"
            gt = fam(rng, int(rng.integers(2400, 3600)))
            save_ply(join(pc_dir, name + ".ply"), gt)
            # eight half-space "scans": visible points from a random view
            # direction, jittered, stored in the z-up frame the axis-swap
            # rotation undoes (data/shapenet_3depn.py:29-32)
            inv_swap = np.linalg.inv(_AXIS_SWAP)
            for k in range(8):
                view = rng.standard_normal(3)
                view /= np.linalg.norm(view)
                vis = gt[gt @ view > rng.uniform(-0.05, 0.05)]
                if vis.shape[0] < 32:
                    vis = gt[np.argsort(gt @ view)[-256:]]
                keep = rng.permutation(vis.shape[0])[: int(rng.integers(300, 1500))]
                scan = vis[keep] + rng.normal(0, 0.003, (keep.shape[0], 3))
                scan_zup = (inv_swap @ scan.T).T.astype(np.float32)
                save_ply(join(raw_dir, f"{name}__{k}__.ply"), scan_zup)
            u = rng.uniform()
            split = "train" if u < 0.85 else ("val" if u < 0.9 else "test")
            rows.append((len(rows), cat, name, split))
    with open(join(root, "shapenet-official-split.csv"), "w") as fh:
        fh.write("id,synsetId,modelId,split\n")
        for r in rows:
            fh.write(",".join(map(str, r)) + "\n")
    by = {}
    for _, cat, _, split in rows:
        by[(cat, split)] = by.get((cat, split), 0) + 1
    print(f"{len(rows)} models at {root}: " +
          ", ".join(f"{c[-3:]}:{s}={n}" for (c, s), n in sorted(by.items())))


if __name__ == "__main__":
    out = sys.argv[1]
    n_chair = int(sys.argv[2]) if len(sys.argv) > 2 else 450
    n_air = int(sys.argv[3]) if len(sys.argv) > 3 else 150
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    make_synthetic_3depn(out, {CHAIR: n_chair, AIRPLANE: n_air}, seed)
