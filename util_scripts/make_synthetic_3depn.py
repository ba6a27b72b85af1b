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

``style="v2"`` swaps in structured multi-part families (surface-sampled
box assemblies): chairs with a seat, backrest and four thin legs; airplanes
with a fuselage, main wing, tail fin and horizontal stabilizer. A z-half
scan of a v2 chair routinely removes whole legs, so the completion task has
real structure to recover.

Usage:
  python util_scripts/make_synthetic_3depn.py <out_dir> [n_chair] [n_airplane] [seed] [v1|v2]
"""

from __future__ import annotations

import os
import sys
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyperpocket_tpu.data.plyio import save_ply
from hyperpocket_tpu.data.shapenet_3depn import _AXIS_SWAP

CHAIR, AIRPLANE, TABLE = "03001627", "02691156", "04379243"


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


def _sample_box_surface(rng, n, half, center):
    """n points uniform on the surface of an axis-aligned box (area-weighted
    faces)."""
    hx, hy, hz = half
    areas = np.array([hy * hz, hy * hz, hx * hz, hx * hz, hx * hy, hx * hy])
    face = rng.choice(6, n, p=areas / areas.sum())
    u = rng.uniform(-1, 1, (n, 2))
    pts = np.empty((n, 3))
    for f in range(6):
        m = face == f
        axis, sign = f // 2, 1.0 if f % 2 == 0 else -1.0
        others = [a for a in range(3) if a != axis]
        pts[m, axis] = sign * half[axis]
        pts[m, others[0]] = u[m, 0] * half[others[0]]
        pts[m, others[1]] = u[m, 1] * half[others[1]]
    return pts + center


def _sample_parts(rng, n, parts):
    """Distribute n points over (half, center) boxes by surface area."""
    areas = np.array([8 * (h[0] * h[1] + h[1] * h[2] + h[0] * h[2])
                      for h, _ in parts])
    counts = rng.multinomial(n, areas / areas.sum())
    out = [
        _sample_box_surface(rng, c, np.asarray(h, float), np.asarray(ctr, float))
        for c, (h, ctr) in zip(counts, parts) if c
    ]
    return np.concatenate(out).astype(np.float32)


def _chair_parts(rng, n):
    """Multi-part chair: seat + backrest + 4 thin legs (v2 family).

    Thin legs and the seat/back right angle give the completion task real
    structure to recover (a z-half scan routinely removes entire legs),
    unlike the smooth single-surface superellipsoids of v1.
    """
    seat_w = rng.uniform(0.18, 0.28)          # x half-width
    seat_d = rng.uniform(0.16, 0.26)          # y half-depth
    seat_t = rng.uniform(0.015, 0.03)         # half-thickness
    seat_h = rng.uniform(0.0, 0.08)           # seat center z
    leg_len = rng.uniform(0.16, 0.26)
    leg_r = rng.uniform(0.012, 0.025)
    back_h = rng.uniform(0.18, 0.3)
    back_t = rng.uniform(0.012, 0.025)
    lean = rng.uniform(0.0, 0.06)             # backrest y offset at top
    parts = [((seat_w, seat_d, seat_t), (0, 0, seat_h))]
    for sx in (-1, 1):
        for sy in (-1, 1):
            parts.append((
                (leg_r, leg_r, leg_len / 2),
                (sx * (seat_w - leg_r * 2), sy * (seat_d - leg_r * 2),
                 seat_h - seat_t - leg_len / 2),
            ))
    parts.append((
        (seat_w * rng.uniform(0.85, 1.0), back_t, back_h / 2),
        (0, -(seat_d - back_t) - lean, seat_h + seat_t + back_h / 2),
    ))
    return _sample_parts(rng, n, parts)


def _airplane_parts(rng, n):
    """Fuselage + main wing + tail fin + horizontal stabilizer (v2)."""
    fus_l = rng.uniform(0.3, 0.42)
    fus_r = rng.uniform(0.035, 0.06)
    wing_span = rng.uniform(0.24, 0.38)
    wing_chord = rng.uniform(0.05, 0.09)
    wing_t = rng.uniform(0.008, 0.015)
    wing_x = rng.uniform(-0.08, 0.06)
    fin_h = rng.uniform(0.06, 0.11)
    stab_span = rng.uniform(0.08, 0.14)
    parts = [
        ((fus_l, fus_r, fus_r), (0, 0, 0)),                       # fuselage
        ((wing_chord, wing_span, wing_t), (wing_x, 0, 0)),        # main wing
        ((wing_chord * 0.6, wing_t, fin_h / 2),
         (-fus_l + wing_chord * 0.6, 0, fus_r + fin_h / 2)),      # tail fin
        ((wing_chord * 0.55, stab_span, wing_t),
         (-fus_l + wing_chord * 0.55, 0, 0)),                     # stabilizer
    ]
    return _sample_parts(rng, n, parts)


def _table(rng, n):
    """v1 table: squat boxy superellipsoid (wide x/y, thin z, high p)."""
    axes = np.array([rng.uniform(0.3, 0.45), rng.uniform(0.25, 0.4),
                     rng.uniform(0.04, 0.1)])
    p = rng.uniform(4.0, 8.0)
    d = rng.standard_normal((n, 3))
    norm = np.power(np.sum(np.abs(d) ** p, axis=1), 1.0 / p)
    return (axes * d / norm[:, None]).astype(np.float32)


def _table_parts(rng, n):
    """v2 table: wide thin top slab + 4 long thin legs — taller and wider
    than the chair family, no backrest, so the three v2 categories stay
    parametrically distinct for cross-category experiments."""
    top_w = rng.uniform(0.28, 0.42)
    top_d = rng.uniform(0.2, 0.34)
    top_t = rng.uniform(0.012, 0.025)
    top_h = rng.uniform(0.08, 0.16)
    leg_len = rng.uniform(0.22, 0.34)
    leg_r = rng.uniform(0.012, 0.022)
    parts = [((top_w, top_d, top_t), (0, 0, top_h))]
    for sx in (-1, 1):
        for sy in (-1, 1):
            parts.append((
                (leg_r, leg_r, leg_len / 2),
                (sx * (top_w - leg_r * 2), sy * (top_d - leg_r * 2),
                 top_h - top_t - leg_len / 2),
            ))
    return _sample_parts(rng, n, parts)


FAMILIES = {CHAIR: _superellipsoid, AIRPLANE: _airplane, TABLE: _table}
FAMILIES_V2 = {CHAIR: _chair_parts, AIRPLANE: _airplane_parts,
               TABLE: _table_parts}


def make_synthetic_3depn(root: str, n_models: dict[str, int], seed: int = 0,
                         style: str = "v1") -> None:
    families = {"v1": FAMILIES, "v2": FAMILIES_V2}[style]
    rng = np.random.default_rng(seed)
    rows = []
    for cat, count in n_models.items():
        pc_dir = join(root, "ShapeNetPointCloud", cat)
        raw_dir = join(root, "shapenet_dim32_sdf_pc", cat)
        os.makedirs(pc_dir, exist_ok=True)
        os.makedirs(raw_dir, exist_ok=True)
        fam = families[cat]
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
    style = sys.argv[5] if len(sys.argv) > 5 else "v1"
    n_table = int(sys.argv[6]) if len(sys.argv) > 6 else 0
    if style not in ("v1", "v2"):
        sys.exit(f"style must be v1 or v2, got {style!r}")
    counts = {CHAIR: n_chair, AIRPLANE: n_air}
    if n_table:
        counts[TABLE] = n_table
    make_synthetic_3depn(out, counts, seed, style)
