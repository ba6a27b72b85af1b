"""Offline partial-dataset generator (slicing) — multiprocess CPU fan-out.

Capability parity with reference ``util_scripts/generate_partial_dataset.py``
(Ray replaced by a multiprocessing pool, SURVEY.md §2 "TPU-native mapping"):

* ``shapenet`` branch: for every ``<cat>/<model>.ply`` under the dataset
  root, write ``num_samples`` plane-slices to
  ``slices/{existing,missing}/<cat>/<i>~<model>.ply``.
* ``3depn`` branch: for every train/val model in the official split with
  both a complete cloud and a raw scan present, resample the complete cloud
  to 2048 points into ``slices/gt`` and write ``num_samples`` slices.

Unlike the reference (whose Ray workers inherit unseeded global RNGs, so
every regeneration produces different slices), each model's slices are
drawn from an RNG seeded by ``(config setup.seed, category, model name)``
— regenerating a corpus from the same raw tree and config is bit-identical,
independent of pool scheduling. This extends the framework's determinism
story (CLAUDE.md) to offline preprocessing.

Usage: ``python util_scripts/generate_partial_dataset.py -c settings/<x>.json``
"""

from __future__ import annotations

import csv
import hashlib
import os
import random
import sys
from functools import partial
from multiprocessing import Pool
from os.path import exists, join

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyperpocket_tpu.data.category_mapping import synth_id_to_category
from hyperpocket_tpu.data.plyio import load_ply, save_ply
from hyperpocket_tpu.data.shapenet_3depn import sample_point_cloud_by_n
from hyperpocket_tpu.data.slicer import slice_point_cloud
from hyperpocket_tpu.train.config import parse_config

DEPN_CLASSES = ("02691156", "03001627", "04379243")


def _task_rng(seed: int, cat: str, name: str) -> np.random.Generator:
    """Per-model RNG: stable under pool scheduling and worker count."""
    digest = hashlib.sha256(f"{seed}/{cat}/{name}".encode()).digest()
    return np.random.default_rng(int.from_bytes(digest[:8], "little"))


def generate_one_shapenet(task, dataset_path: str, num_samples: int = 4,
                          seed: int = 0):
    category, filename = task
    rng = _task_rng(seed, category, filename)
    points = load_ply(join(dataset_path, category, filename))
    for i in range(num_samples):
        existing, missing = slice_point_cloud(points, 1024, rng=rng)
        save_ply(join(dataset_path, "slices", "existing", category, f"{i}~{filename}"), existing)
        save_ply(join(dataset_path, "slices", "missing", category, f"{i}~{filename}"), missing)


def generate_one_3depn(task, dataset_path: str, num_samples: int = 4,
                       seed: int = 0):
    cat, name, pc_root = task
    rng = _task_rng(seed, cat, name)
    py_rng = random.Random(int(rng.integers(0, 2**63)))
    pc = load_ply(join(pc_root, name + ".ply")).astype(np.float64)
    pc = sample_point_cloud_by_n(pc, 2048, rng=py_rng).astype(np.float32)
    save_ply(join(dataset_path, "slices", "gt", cat, name + ".ply"), pc)
    for i in range(num_samples):
        existing, missing = slice_point_cloud(pc, 1024, rng=rng)
        save_ply(join(dataset_path, "slices", "existing", cat, f"{i}~{name}.ply"), existing)
        save_ply(join(dataset_path, "slices", "missing", cat, f"{i}~{name}.ply"), missing)


def main(config: dict) -> None:
    dataset_config = config["dataset"]
    dataset_path = dataset_config["path"]
    dataset_name = dataset_config["name"]
    num_samples = dataset_config.get("num_samples", 4)
    seed = config.get("setup", {}).get("seed", 0)

    if dataset_name == "shapenet":
        if not exists(dataset_path):
            raise Exception(
                f"no ShapeNet dataset found at {dataset_path}, "
                f"please run `util_scripts/download_shapenet_2048.py` first"
            )
        tasks = []
        for category in synth_id_to_category:
            cat_dir = join(dataset_path, category)
            if not exists(cat_dir):
                continue
            os.makedirs(join(dataset_path, "slices", "existing", category), exist_ok=True)
            os.makedirs(join(dataset_path, "slices", "missing", category), exist_ok=True)
            tasks.extend((category, f) for f in os.listdir(cat_dir) if f.endswith(".ply"))
        with Pool(os.cpu_count()) as pool:
            pool.map(partial(generate_one_shapenet, dataset_path=dataset_path,
                             num_samples=num_samples, seed=seed), tasks)

    elif dataset_name == "3depn":
        classes = list(DEPN_CLASSES)
        names: dict[str, list[str]] = {c: [] for c in classes}
        with open(join(dataset_path, "shapenet-official-split.csv")) as fh:
            for i, row in enumerate(csv.reader(fh)):
                if i and row[1] in names and row[-1] in ("train", "val"):
                    names[row[1]].append(row[-2])
        tasks = []
        for cat in classes:
            pc_root = join(dataset_path, "ShapeNetPointCloud", cat)
            raw_root = join(dataset_path, "shapenet_dim32_sdf_pc", cat)
            for d in ("existing", "missing", "gt"):
                os.makedirs(join(dataset_path, "slices", d, cat), exist_ok=True)
            for name in names[cat]:
                if exists(join(pc_root, name + ".ply")) and exists(join(raw_root, f"{name}__0__.ply")):
                    tasks.append((cat, name, pc_root))
        print("pc to process:", len(tasks))
        with Pool(os.cpu_count()) as pool:
            pool.map(partial(generate_one_3depn, dataset_path=dataset_path,
                             num_samples=num_samples, seed=seed), tasks)
    else:
        raise ValueError(f"unsupported dataset for slicing: {dataset_name!r}")


if __name__ == "__main__":
    main(parse_config())
