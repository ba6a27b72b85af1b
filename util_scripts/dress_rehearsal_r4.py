"""Round-4 dress rehearsal, experiments stage: ALL SIX experiments on the
trained chair-config weights (best_val epoch) over the synthetic 3D-EPN tree.

Pipeline (run after the 400-epoch training pass of
``results/dress_rehearsal_r4/config.json``):

  make_synthetic_3depn -> generate_partial_dataset -> cli training ->
  THIS SCRIPT (experiments) -> experiments_summary.json

The experiments run in three scoped passes, mirroring how a reference user
invokes them (each reference config is per-class; core/main.py:176-188 hands
every registered experiment the same test dict, so the dict must be shaped
for the experiments it feeds):

  1. chair-only dict: fixed, compute_mmd_tmd_uhd (consumes fixed/, requires
     a single category), evaluate_generativity, same_model_different_slices
  2. chair+airplane dict: merge_different_categories (needs both by name)
  3. {"all": concat} dict: completion3d_submission (reference
     core/experiments.py:228-247 is only ever invoked under
     config_completion.json.sample whose test dict has an "all" key; the
     rehearsal feeds it the concatenated 3depn test categories so the
     submission-zip path runs against real trained weights)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python util_scripts/dress_rehearsal_r4.py
"""

from __future__ import annotations

import copy
import json
import os
import sys
import time
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# R4_OUT lets the same driver serve later rehearsal variants (e.g. r4b on
# the v2 structured corpus)
OUT = os.environ.get("R4_OUT", "results/dress_rehearsal_r4")
CONFIG = join(OUT, "config.json")


class _Subset:
    """First-n view of a dataset (rejects negative/oob indices)."""

    def __init__(self, ds, n):
        self.ds, self.n = ds, min(n, len(ds))

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if not 0 <= i < self.n:
            raise IndexError(i)
        return self.ds[i]


# one concat implementation for the whole repo (bounds-checked); kept under
# the old name so the sibling drivers' imports stay stable
from hyperpocket_tpu.data.base import ConcatDataset as _ConcatDataset  # noqa: E402


def _scoped_config(config, names):
    """Config with only ``names`` executing (others keep settings, off).

    ``run_experiments`` executes in config-settings order (reference
    core/main.py:184), and json.dump(sort_keys=True) configs come out
    alphabetical — where ``compute_mmd_tmd_uhd`` precedes the ``fixed``
    pass it consumes. The driver's pass semantics are the ``names`` list's
    order, so reorder the settings dict to match it (executing entries
    first, in ``names`` order; the rest keep their relative order, off).
    """
    out = copy.deepcopy(config)
    settings = out["experiments"]["settings"]
    ordered = {n: settings[n] for n in names if n in settings}
    ordered.update({k: v for k, v in settings.items() if k not in ordered})
    for name, ex_cfg in ordered.items():
        ex_cfg["execute"] = name in names
    out["experiments"]["settings"] = ordered
    return out


def main():
    from hyperpocket_tpu.data import get_datasets
    from hyperpocket_tpu.eval.experiments import run_experiments
    from hyperpocket_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    config = json.load(open(CONFIG))

    _, val_dict, test_dict = get_datasets(
        {**config["dataset"], "classes": ["03001627", "02691156"]}
    )
    sizes = {k: len(v) for k, v in test_dict.items()}
    print("test datasets:", sizes, flush=True)

    chair_only = {"chair": test_dict["chair"]}
    all_concat = {"all": _ConcatDataset(test_dict.values())}
    # 3D-EPN TEST items carry a scalar missing-part placeholder (the
    # reference ships evaluate_generativity execute=false in its 3depn
    # configs for exactly this reason); the VAL split has real missing
    # halves, so generativity exercises trained weights there instead —
    # subsampled to gen-test scale (the metric is O(n^2) completions and
    # O(n^3) EMD pairs; the full 1596-item val split is not its shape)
    chair_val = {"chair": _Subset(val_dict["chair"], 50)}

    exp_dir = join(OUT, "experiments")
    os.makedirs(exp_dir, exist_ok=True)
    passes = [
        (["fixed", "compute_mmd_tmd_uhd", "same_model_different_slices"],
         chair_only),
        (["evaluate_generativity"], chair_val),
        (["merge_different_categories"], test_dict),
        (["completion3d_submission"], all_concat),
    ]
    t0 = time.monotonic()
    wall = {}
    for names, datasets in passes:
        t1 = time.monotonic()
        run_experiments(_scoped_config(config, names), exp_dir, datasets=datasets)
        wall["+".join(names)] = round(time.monotonic() - t1, 1)
        print(f"pass {names}: {wall['+'.join(names)]}s", flush=True)
    # A/B: rerun fixed -> mmd with the empirical latent prior (framework
    # extension, eval/latent_stats.py) into its own directory so the two
    # fixed/ trees never collide — same weights, only the noise draw differs
    exp_dir_emp = join(OUT, "experiments_empirical")
    os.makedirs(exp_dir_emp, exist_ok=True)
    cfg_emp = _scoped_config(config, ["fixed", "compute_mmd_tmd_uhd"])
    cfg_emp["experiments"]["latent_prior"] = {"max_items": 512}
    cfg_emp["experiments"]["settings"]["fixed"]["noise_source"] = "empirical"
    t1 = time.monotonic()
    run_experiments(cfg_emp, exp_dir_emp, datasets=chair_only)
    wall["empirical fixed+mmd"] = round(time.monotonic() - t1, 1)
    print(f"pass empirical fixed+mmd: {wall['empirical fixed+mmd']}s", flush=True)

    total_wall = time.monotonic() - t0
    print(f"all experiments: {total_wall:.1f}s", flush=True)

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
        "experiments_wall_s": round(total_wall, 1),
        "pass_wall_s": wall,
        "artifact_counts": artifacts,
    }
    for base, sub, fname, key in [
        (exp_dir, "compute_mmd_tmd_uhd", "res.json", "mmd_tmd_uhd"),
        (exp_dir, "evaluate_generativity", "eval_gen_by_cat.json", "eval_gen_by_cat"),
        (exp_dir_emp, "compute_mmd_tmd_uhd", "res.json", "mmd_tmd_uhd_empirical"),
    ]:
        d = join(base, sub)
        for f in os.listdir(d) if os.path.isdir(d) else []:
            if f.endswith(fname):
                summary[key] = json.load(open(join(d, f)))
    with open(join(OUT, "experiments_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    from hyperpocket_tpu.utils.chip_lock import chip_lock

    with chip_lock():
        main()
