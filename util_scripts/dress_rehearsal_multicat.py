"""Multi-category dress rehearsal, experiments stage: every experiment on
3-class trained weights over the synthetic v2 3D-EPN tree.

Deepens the single-category r4/r4b rehearsals along the axes only a
multi-category run exercises:

* per-category fixed -> compute_mmd_tmd_uhd -> same_model_different_slices
  passes (three category-scoped result trees, the way a reference user runs
  their per-class configs — but from ONE training run's weights);
* evaluate_generativity over ALL categories in one pass (its internal
  per-category loop, the batched pairwise dispatches and the module-level
  1-NNA jit reuse across categories), with include_1nna=True — the
  framework extension the reference computes but never reports;
* merge_different_categories on two genuinely distinct pairs
  (chair+airplane, chair+table);
* completion3d_submission over the concatenated test categories.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo \
    python util_scripts/dress_rehearsal_multicat.py [out_dir] [--empirical]
(out_dir defaults to results/dress_rehearsal_multicat; expects
 <out_dir>/config.json and a finished training run under its results_root.
 --empirical runs ONLY the per-category fixed+mmd A/B with the empirical
 latent prior fitted on val missing halves — eval/latent_stats.py — into
 <out_dir>/experiments_empirical, for comparison against the normal-prior
 numbers in experiments_summary.json.)
"""

from __future__ import annotations

import json
import os
import sys
import time
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dress_rehearsal_r4 import _ConcatDataset, _scoped_config, _Subset  # noqa: E402

_args = [a for a in sys.argv[1:] if a != "--empirical"]
EMPIRICAL = "--empirical" in sys.argv[1:]
OUT = _args[0] if _args else "results/dress_rehearsal_multicat"
CONFIG = join(OUT, "config.json")
GEN_OBJECTS = 25  # generativity val-slice cap per category (O(n^2) pairs)


def main_empirical():
    """Per-category fixed+mmd with the empirical latent prior (A/B vs the
    normal-prior pass in experiments_summary.json; same weights, only the
    latent draw differs — r4b measured a ~5x completion-CD win single-cat)."""
    from hyperpocket_tpu.data import get_datasets
    from hyperpocket_tpu.eval.experiments import run_experiments
    from hyperpocket_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    config = json.load(open(CONFIG))
    _, _, test_dict = get_datasets(config["dataset"])
    exp_root = join(OUT, "experiments_empirical")
    os.makedirs(exp_root, exist_ok=True)
    t0 = time.monotonic()
    summary = {"stage": "experiments_empirical", "mmd_tmd_uhd_by_cat": {}}
    for cat, ds in sorted(test_dict.items()):
        cfg = _scoped_config(config, ["fixed", "compute_mmd_tmd_uhd"])
        cfg["experiments"]["latent_prior"] = {"max_items": 512}
        cfg["experiments"]["settings"]["fixed"]["noise_source"] = "empirical"
        out_dir = join(exp_root, cat)
        os.makedirs(out_dir, exist_ok=True)
        t1 = time.monotonic()
        run_experiments(cfg, out_dir, datasets={cat: ds})
        print(f"pass {cat}: {time.monotonic() - t1:.1f}s", flush=True)
        d = join(out_dir, "compute_mmd_tmd_uhd")
        for f in sorted(os.listdir(d)) if os.path.isdir(d) else []:
            if f.endswith("res.json"):
                summary["mmd_tmd_uhd_by_cat"][cat] = json.load(open(join(d, f)))
    summary["wall_s"] = round(time.monotonic() - t0, 1)
    with open(join(OUT, "experiments_empirical_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary, indent=1))


def main():
    from hyperpocket_tpu.data import get_datasets
    from hyperpocket_tpu.eval.experiments import run_experiments
    from hyperpocket_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    config = json.load(open(CONFIG))

    _, val_dict, test_dict = get_datasets(config["dataset"])
    sizes = {k: len(v) for k, v in test_dict.items()}
    print("test datasets:", sizes, flush=True)

    exp_root = join(OUT, "experiments")
    os.makedirs(exp_root, exist_ok=True)
    t0 = time.monotonic()
    wall: dict[str, float] = {}

    def run(tag, names, datasets, out_dir, extra=None):
        cfg = _scoped_config(config, names)
        for key, patch in (extra or {}).items():
            cfg["experiments"]["settings"][key].update(patch)
        os.makedirs(out_dir, exist_ok=True)
        t1 = time.monotonic()
        run_experiments(cfg, out_dir, datasets=datasets)
        wall[tag] = round(time.monotonic() - t1, 1)
        print(f"pass {tag}: {wall[tag]}s", flush=True)

    # 1. per-category passes (fixed feeds mmd within each scoped dir)
    for cat, ds in sorted(test_dict.items()):
        run(f"{cat}: fixed+mmd+slices",
            ["fixed", "compute_mmd_tmd_uhd", "same_model_different_slices"],
            {cat: ds}, join(exp_root, cat))

    # 2. generativity across all categories in one pass, with 1-NNA
    # (categories whose val split came up empty are skipped, not crashed on)
    gen_dict = {c: _Subset(d, GEN_OBJECTS)
                for c, d in sorted(val_dict.items()) if len(d)}
    run("evaluate_generativity(all cats, 1-NNA)", ["evaluate_generativity"],
        gen_dict, exp_root,
        extra={"evaluate_generativity": {"include_1nna": True}})

    # 3. two distinct category merges
    run("merge chair+airplane", ["merge_different_categories"], test_dict,
        join(exp_root, "merge_chair_airplane"))
    run("merge chair+table", ["merge_different_categories"], test_dict,
        join(exp_root, "merge_chair_table"),
        extra={"merge_different_categories": {"first_cat": "chair",
                                              "second_cat": "table"}})

    # 4. submission zip over everything
    run("completion3d_submission",
        ["completion3d_submission"],
        {"all": _ConcatDataset(test_dict.values())}, exp_root)

    total_wall = time.monotonic() - t0
    print(f"all experiments: {total_wall:.1f}s", flush=True)

    summary = {
        "stage": "experiments",
        "test_sizes": sizes,
        "experiments_wall_s": round(total_wall, 1),
        "pass_wall_s": wall,
        "mmd_tmd_uhd_by_cat": {},
    }
    for cat in test_dict:
        d = join(exp_root, cat, "compute_mmd_tmd_uhd")
        for f in sorted(os.listdir(d)) if os.path.isdir(d) else []:
            if f.endswith("res.json"):
                summary["mmd_tmd_uhd_by_cat"][cat] = json.load(open(join(d, f)))
    gen_dir = join(exp_root, "evaluate_generativity")
    for f in sorted(os.listdir(gen_dir)) if os.path.isdir(gen_dir) else []:
        if f.endswith("eval_gen_by_cat.json"):
            summary["eval_gen_by_cat"] = json.load(open(join(gen_dir, f)))
    with open(join(OUT, "experiments_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    from hyperpocket_tpu.utils.chip_lock import chip_lock

    with chip_lock():
        main_empirical() if EMPIRICAL else main()
