"""Round-4 dress rehearsal, experiments stage: ALL SIX experiments on the
trained chair-config weights (best_val epoch) over the synthetic 3D-EPN tree.

Pipeline (run after the 400-epoch training pass of
``results/dress_rehearsal_r4/config.json``):

  make_synthetic_3depn -> generate_partial_dataset -> cli training ->
  THIS SCRIPT (experiments) -> summary.json

``completion3d_submission`` expects a Completion3D-style test dict with an
``"all"`` key (reference core/experiments.py:228-247 is only ever invoked
under config_completion.json.sample); the rehearsal feeds it the
concatenated 3depn test categories under that key so the submission-zip
path runs against real trained weights.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python util_scripts/dress_rehearsal_r4.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIG = "results/dress_rehearsal_r4/config.json"
OUT = "results/dress_rehearsal_r4"


class _ConcatDataset:
    def __init__(self, parts):
        self.parts = list(parts)
        self._len = sum(len(p) for p in self.parts)

    def __len__(self):
        return self._len

    def __getitem__(self, idx):
        for p in self.parts:
            if idx < len(p):
                return p[idx]
            idx -= len(p)
        raise IndexError(idx)


def main():
    from hyperpocket_tpu.data import get_datasets
    from hyperpocket_tpu.eval.experiments import run_experiments
    from hyperpocket_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    config = json.load(open(CONFIG))

    _, _, test_dict = get_datasets(
        {**config["dataset"], "classes": ["03001627", "02691156"]}
    )
    test_dict["all"] = _ConcatDataset(test_dict.values())
    sizes = {k: len(v) for k, v in test_dict.items()}
    print("test datasets:", sizes, flush=True)

    exp_dir = join(OUT, "experiments")
    os.makedirs(exp_dir, exist_ok=True)
    t0 = time.monotonic()
    run_experiments(config, exp_dir, datasets=test_dict)
    wall = time.monotonic() - t0
    print(f"all experiments: {wall:.1f}s", flush=True)

    artifacts = {}
    for name in sorted(os.listdir(exp_dir)):
        p = join(exp_dir, name)
        if os.path.isdir(p):
            artifacts[name] = len(os.listdir(p))
        else:
            artifacts[name] = os.path.getsize(p)
    summary = {
        "stage": "experiments",
        "test_sizes": sizes,
        "experiments_wall_s": round(wall, 1),
        "artifact_counts": artifacts,
    }
    mmd_path = join(exp_dir, "compute_mmd_tmd_uhd")
    for f in os.listdir(mmd_path) if os.path.isdir(mmd_path) else []:
        if f.endswith("res.json"):
            summary["mmd_tmd_uhd"] = json.load(open(join(mmd_path, f)))
    with open(join(OUT, "experiments_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
