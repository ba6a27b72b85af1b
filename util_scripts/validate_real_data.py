"""One-command real-data validation harness (VERDICT r3 #5).

Pointed at the official dataset archives (whenever egress opens, or the
files are side-loaded), this runs the full chain the paper results rest on:

  checksum -> ingest (extract + layout check + slice generation) ->
  training at the reference config -> ALL experiments -> MMD/UHD/TMD
  scale diff -> summary.json + exit code.

The reference repo publishes no benchmark numbers (BASELINE.md), so the
default diff checks the REPORTED SCALES (MMD*1000 / UHD*100 / TMD*100 land
in the paper's single/double-digit ballpark) rather than invented point
values; pass ``--expect expected.json`` ({metric: [lo, hi]}) to pin real
bands once the paper numbers are reproduced.

Archive layouts accepted (reference download/instructions):

* 3depn: ``ShapeNetPointCloud/<cat>/*.ply`` + ``shapenet_dim32_sdf_pc/<cat>/
  <model>__{0..7}__.ply`` + ``shapenet-official-split.csv``
  (reference datasets/shapenet_3depn.py:70-123), possibly inside .zip
  archives at --data-root.
* shapenet: the PCN 2048-pt tree ``<cat>/*.ply`` + ``{train,val,test}.list``
  (reference util_scripts/download_shapenet_2048.py:10-40).

Tested end-to-end on the synthetic 3D-EPN tree standing in for the archives
(tests/test_validate_real_data.py).

Usage:
  python util_scripts/validate_real_data.py --data-root /path/to/archives \
      [--dataset 3depn] [--classes 03001627] [--config settings/config_3depn_chair.json] \
      [--work /path/workdir] [--epochs N] [--manifest sha256.json] \
      [--expect expected.json] [--gen-objects 50] [--skip-train]
"""

from __future__ import annotations

import argparse
import copy
import hashlib
import json
import os
import sys
import tarfile
import time
import zipfile
from os.path import basename, exists, isdir, join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dress_rehearsal_r4 import _ConcatDataset, _scoped_config, _Subset  # noqa: E402

# paper-scale sanity bands: the HyperPocket paper reports MMD*1000, UHD*100
# and TMD*100 as single/double-digit values on 3D-EPN; a result outside
# these bands means the pipeline (units, normalization, metric code) broke,
# not that the model is slightly off. Tighten via --expect once real numbers
# are reproduced.
DEFAULT_BANDS = {
    "MMD * 1000": [0.0, 150.0],
    "UHD * 100": [0.0, 150.0],
    "TMD * 100": [0.0, 80.0],
}


def sha256_file(path: str, block: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        while chunk := fh.read(block):
            h.update(chunk)
    return h.hexdigest()


def stage_checksum(data_root: str, manifest_path: str | None) -> dict:
    """sha256 every archive; verify against the manifest when given."""
    manifest = json.load(open(manifest_path)) if manifest_path else {}
    report, failures = {}, []
    # keep in sync with stage_ingest's extraction filter (.tgz included)
    archives = sorted(
        f for f in os.listdir(data_root)
        if f.endswith((".zip", ".tar", ".tar.gz", ".tgz", ".h5"))
    )
    for f in archives:
        digest = sha256_file(join(data_root, f))
        report[f] = digest
        want = manifest.get(f)
        if want is not None and want.lower() != digest:
            failures.append(f"{f}: sha256 {digest} != manifest {want}")
    for f, want in manifest.items():
        if f not in report:
            failures.append(f"{f}: listed in manifest but absent from {data_root}")
    if failures:
        raise SystemExit("checksum stage FAILED:\n  " + "\n  ".join(failures))
    return report


def _check_members(root: str, names: list[str], archive: str) -> None:
    """Refuse archive members that would extract outside ``root``."""
    base = os.path.realpath(root)
    for name in names:
        dest = os.path.realpath(os.path.join(root, name))
        if os.path.isabs(name) or not (dest == base or dest.startswith(base + os.sep)):
            raise SystemExit(
                f"refusing to extract {archive!r}: member {name!r} would "
                f"land outside {root!r} (path traversal)")


def stage_ingest(data_root: str, work: str, dataset: str, classes: list[str],
                 num_samples: int, seed: int = 0) -> str:
    """Extract archives if needed, verify layout, build slices/. Returns the
    dataset root the training config should point at. Idempotent: a workdir
    tree already extracted by a previous run is reused as-is."""
    # already-extracted tree directly at data_root?
    root = data_root if _layout_ok(data_root, dataset, classes) else join(work, "dataset")
    if root != data_root and not _layout_ok(root, dataset, classes):
        os.makedirs(root, exist_ok=True)
        for f in sorted(os.listdir(data_root)):
            path = join(data_root, f)
            # downloaded archives are untrusted input: reject members that
            # would escape root (path traversal / absolute paths / links)
            if f.endswith(".zip"):
                with zipfile.ZipFile(path) as zf:
                    _check_members(root, zf.namelist(), path)
                    zf.extractall(root)
            elif f.endswith((".tar", ".tar.gz", ".tgz")):
                with tarfile.open(path) as tf:
                    try:
                        tf.extractall(root, filter="data")  # Python >= 3.12
                    except TypeError:
                        _check_members(root, tf.getnames(), path)
                        tf.extractall(root)
        # the PCN zip nests everything under shape_net_core_uniform_samples_2048/
        # (reference download_shapenet_2048.py:33-40) — flatten it
        nested = join(root, "shape_net_core_uniform_samples_2048")
        if isdir(nested):
            for d in os.listdir(nested):
                os.replace(join(nested, d), join(root, d))
            os.rmdir(nested)
        if not _layout_ok(root, dataset, classes):
            raise SystemExit(
                f"ingest stage FAILED: extracted tree at {root} does not match the "
                f"{dataset} layout (see module docstring for the expected directories)"
            )
    slices_probe = "gt" if dataset == "3depn" else "existing"
    if not exists(join(root, "slices", slices_probe)):
        print("ingest: building slices/ via generate_partial_dataset ...", flush=True)
        import generate_partial_dataset as gpd

        # thread setup.seed through so a manual `generate_partial_dataset.py
        # -c <config>` regeneration of the same tree is bit-identical
        gpd.main({"dataset": {"name": dataset, "path": root,
                              "num_samples": num_samples},
                  "setup": {"seed": seed}})
    return root


def _layout_ok(root: str, dataset: str, classes: list[str]) -> bool:
    if dataset == "3depn":
        return all(
            exists(p) for p in (
                join(root, "shapenet-official-split.csv"),
                *(join(root, "ShapeNetPointCloud", c) for c in classes),
                *(join(root, "shapenet_dim32_sdf_pc", c) for c in classes),
            )
        )
    return all(exists(join(root, c)) for c in classes) and exists(join(root, "train.list"))


def stage_train(config: dict) -> dict:
    from hyperpocket_tpu.train.trainer import Trainer

    trainer = Trainer(config)
    train_losses, val_losses = trainer.run(plot_samples=False)
    return {
        "epochs": len(train_losses),
        "first_loss": float(train_losses[0][0]),
        "last_loss": float(train_losses[-1][0]),
        "best_val": float(trainer.best_epoch_loss),
    }


def stage_experiments(config: dict, out_dir: str, gen_objects: int) -> dict:
    """All executed experiments in scoped passes (dress_rehearsal structure:
    each reference config is per-class; run_experiments hands every
    experiment the same dict, so the dict must fit the experiments fed)."""
    import numpy as np

    from hyperpocket_tpu.data import get_datasets
    from hyperpocket_tpu.eval.experiments import run_experiments

    settings = config["experiments"]["settings"]
    on = [n for n, c in settings.items() if c.get("execute")]
    merge_cats = []
    if "merge_different_categories" in on:
        merge_cats = [settings["merge_different_categories"].get("first_cat", "chair"),
                      settings["merge_different_categories"].get("second_cat", "airplane")]
    _, val_dict, test_dict = get_datasets(config["dataset"])
    wall = {}

    def run(names, datasets):
        names = [n for n in names if n in on]
        if not names:
            return
        t0 = time.monotonic()
        run_experiments(_scoped_config(config, names), out_dir, datasets=datasets)
        wall["+".join(names)] = round(time.monotonic() - t0, 1)
        print(f"pass {names}: {wall['+'.join(names)]}s", flush=True)

    run(["fixed", "compute_mmd_tmd_uhd", "same_model_different_slices"], test_dict)
    if "evaluate_generativity" in on:
        # 3D-EPN test items carry the reference's scalar missing-part
        # placeholder; generativity needs real missing halves -> val slice
        probe = next(iter(test_dict.values()))[0][1]
        if np.ndim(probe) == 2:
            # test items carry real missing halves — still cap at
            # --gen-objects per category (pairwise metrics are O(N^2))
            gen_dict = {c: _Subset(d, gen_objects) for c, d in test_dict.items()}
        else:
            cat, ds = next(iter(val_dict.items()))
            gen_dict = {cat: _Subset(ds, gen_objects)}
        run(["evaluate_generativity"], gen_dict)
    if merge_cats:
        wide = dict(config["dataset"])
        wide["classes"] = sorted(set(list(config["dataset"].get("classes", [])) + merge_cats))
        try:
            _, _, merge_test = get_datasets(wide)
            run(["merge_different_categories"], merge_test)
        except (FileNotFoundError, ValueError) as err:
            print(f"merge_different_categories SKIPPED: second category not "
                  f"ingested ({err})", flush=True)
    run(["completion3d_submission"], {"all": _ConcatDataset(test_dict.values())})
    return wall


def stage_diff(out_dir: str, bands: dict) -> tuple[dict, list[str]]:
    import glob

    res_files = sorted(glob.glob(join(out_dir, "compute_mmd_tmd_uhd", "*res.json")))
    if not res_files:
        return {}, ["compute_mmd_tmd_uhd produced no res.json"]
    res = json.load(open(res_files[-1]))
    failures = []
    for metric, (lo, hi) in bands.items():
        if metric not in res:
            failures.append(f"{metric}: missing from {basename(res_files[-1])}")
            continue
        v = float(res[metric])
        status = "OK" if lo <= v <= hi else "OUT OF BAND"
        print(f"  {metric}: {v:.4f}  expected [{lo}, {hi}]  {status}")
        if status != "OK":
            failures.append(f"{metric}: {v:.4f} outside [{lo}, {hi}]")
    return res, failures


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data-root", required=True, help="dir with the archives or the extracted tree")
    ap.add_argument("--work", default=None, help="workdir (default <data-root>/_validate)")
    ap.add_argument("--dataset", default="3depn", choices=("3depn", "shapenet"))
    ap.add_argument("--classes", default=None, help="comma list; default from --config")
    ap.add_argument("--config", default=join(os.path.dirname(__file__), "..",
                                             "settings", "config_3depn_chair.json"))
    ap.add_argument("--epochs", type=int, default=None, help="override max_epoch")
    ap.add_argument("--manifest", default=None, help="json {archive: sha256}")
    ap.add_argument("--expect", default=None, help="json {metric: [lo, hi]}")
    ap.add_argument("--gen-objects", type=int, default=50)
    ap.add_argument("--num-samples", type=int, default=None, help="slices per model")
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse existing checkpoints under the workdir")
    args = ap.parse_args(argv)

    work = args.work or join(args.data_root, "_validate")
    os.makedirs(work, exist_ok=True)
    config = json.load(open(args.config))
    classes = (args.classes.split(",") if args.classes
               else list(config["dataset"].get("classes", [])))
    # Directory probes below need synset ids; accept category names here the
    # same way every dataset family does (data/shapenet.py normalize_classes).
    from hyperpocket_tpu.data.category_mapping import normalize_classes

    classes = normalize_classes(classes)
    summary: dict = {"stages": {}}

    print("== stage 1/5: checksum ==", flush=True)
    t0 = time.monotonic()
    summary["stages"]["checksum"] = stage_checksum(args.data_root, args.manifest)
    print(json.dumps(summary["stages"]["checksum"], indent=1), flush=True)

    print("== stage 2/5: ingest ==", flush=True)
    root = stage_ingest(args.data_root, work, args.dataset, classes,
                        args.num_samples or config["dataset"].get("num_samples", 4),
                        seed=config.get("setup", {}).get("seed", 0))
    summary["stages"]["ingest"] = {"dataset_root": root}

    config = copy.deepcopy(config)
    config["dataset"].update({"name": args.dataset, "path": root, "classes": classes})
    config["results_root"] = join(work, "results")
    if args.num_samples:
        config["dataset"]["num_samples"] = args.num_samples
    if args.epochs:
        config["training"]["max_epoch"] = args.epochs

    print("== stage 3/5: training ==", flush=True)
    if args.skip_train:
        summary["stages"]["train"] = "skipped (reusing checkpoints)"
    else:
        summary["stages"]["train"] = stage_train(config)
        print(json.dumps(summary["stages"]["train"], indent=1), flush=True)

    print("== stage 4/5: experiments ==", flush=True)
    exp_dir = join(work, "experiments")
    os.makedirs(exp_dir, exist_ok=True)
    summary["stages"]["experiments"] = stage_experiments(config, exp_dir, args.gen_objects)

    print("== stage 5/5: MMD/UHD/TMD diff ==", flush=True)
    bands = json.load(open(args.expect)) if args.expect else DEFAULT_BANDS
    res, failures = stage_diff(exp_dir, bands)
    summary["stages"]["diff"] = {"values": res, "bands": bands, "failures": failures}
    summary["wall_s"] = round(time.monotonic() - t0, 1)

    with open(join(work, "summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    print(f"summary: {join(work, 'summary.json')} ({summary['wall_s']}s)")
    if failures:
        print("VALIDATION FAILED:\n  " + "\n  ".join(failures))
        return 1
    print("VALIDATION OK")
    return 0


if __name__ == "__main__":
    from hyperpocket_tpu.utils.chip_lock import chip_lock

    with chip_lock():
        raise SystemExit(main())
