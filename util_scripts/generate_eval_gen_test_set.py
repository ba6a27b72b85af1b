"""Build the gen-test split: test_gen/{left,right,gt} by y-axis 1024/1024 cut.

Capability parity with reference ``util_scripts/generate_eval_gen_test_set.py``
(``div_left_right_min_y``, :52-61): left = 1024 lowest-y points, right = the
rest; gt = the full cloud.
"""

from __future__ import annotations

import os
import sys
from os import makedirs
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyperpocket_tpu.data.plyio import load_ply, save_ply
from hyperpocket_tpu.data.shapenet import PCN_DEFAULT_CLASSES
from hyperpocket_tpu.train.config import parse_config


def div_left_right_min_y(dataset_dir: str, pc_paths: list[str]) -> None:
    for pc_path in pc_paths:
        pc = load_ply(join(dataset_dir, pc_path))
        order = pc.T[1].argsort()
        left, right = pc[order[:1024]], pc[order[1024:]]
        save_ply(join(dataset_dir, "test_gen", "left", pc_path), left)
        save_ply(join(dataset_dir, "test_gen", "right", pc_path), right)
        save_ply(join(dataset_dir, "test_gen", "gt", pc_path), pc)


def main(config: dict) -> None:
    dataset_dir = config["dataset"]["path"]
    with open(join(dataset_dir, "test.list")) as fh:
        pc_paths = [line.strip() + ".ply" for line in fh if line.strip()]
    for cat in PCN_DEFAULT_CLASSES:
        for side in ("left", "right", "gt"):
            makedirs(join(dataset_dir, "test_gen", side, cat), exist_ok=True)
    div_left_right_min_y(dataset_dir, pc_paths)
    short = [p for p in pc_paths
             if load_ply(join(dataset_dir, "test_gen", "left", p)).shape[0] != 1024]
    if short:
        print(f"warning: {len(short)} clouds produced non-1024 left halves")


if __name__ == "__main__":
    main(parse_config())
