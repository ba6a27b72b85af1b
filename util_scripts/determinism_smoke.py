"""Checked-in cross-round determinism smoke (real chip).

Runs `python -m hyperpocket_tpu.cli` for 2 epochs of the flagship
fp32-highest config on the seed-0 parametric-ellipsoid corpus (120 models,
regenerated deterministically if absent) and asserts the recorded golden
values reproduce. Round 3 recorded epoch-1 Loss_ALL 140721296.0 and epoch-1
val 0.05*CD 173.108078 from the Trainer API; the round-3 CLI smoke and the
round-5 smoke on a FRESH corpus regeneration both reproduced them
bit-identically, so any drift here means a change broke cross-round
determinism (key schedule, init order, data walk, or loss aggregation).

The reference has no analogue (no determinism story at all: torch CUDA
nondeterminism + unseeded DataLoader workers, core/setup.py:14-20 seeds
python/torch only); this guards a capability the rebuild added.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python util_scripts/determinism_smoke.py

Exit 0 = both golden values reproduced; 1 = mismatch (prints full-precision
observed values); 2 = run failed. Safe to run on CPU too (values differ from
the chip goldens there — pass --no-golden to just print observations).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from glob import glob
from os.path import dirname, join

import numpy as np

sys.path.insert(0, dirname(dirname(os.path.abspath(__file__))))

from util_scripts.make_synthetic_dataset import make_ellipsoid_dataset  # noqa: E402

ROOT = "/tmp/ell_corpus120"
CAT = "02691156"

# Recorded on the real v5e chip, round 3; reproduced bit-identically in
# round 5 on a fresh seed-0 corpus regeneration (CLAUDE.md snapshots).
GOLDEN_EPOCH1_LOSS_ALL = 140721296.0
GOLDEN_EPOCH1_VAL = 173.108078


def make_config(results_root: str, epochs: int) -> dict:
    """Flagship smoke config — identical to util_scripts/ffwd_converge.py's
    except fp32 (the parity precision) and the epoch count."""
    return {
        "mode": "training",
        "dataset": {"name": "shapenet", "path": ROOT, "classes": [CAT],
                    "is_rotated": False, "num_samples": 1, "gen_test_set": False},
        "training": {
            "optimizer": {"type": "Adam",
                          "hyperparams": {"lr": 0.0001, "weight_decay": 0,
                                          "betas": [0.9, 0.999], "amsgrad": False}},
            "lr_scheduler": {"type": "StepLR",
                             "hyperparams": {"step_size": 3000, "gamma": 0.01}},
            "dataloader": {
                "train": {"batch_size": 32, "shuffle": True, "num_workers": 2,
                          "drop_last": True},
                "val": {"batch_size": 32, "shuffle": False, "num_workers": 2,
                        "drop_last": False},
            },
            "state_save_frequency": 100,
            "loss_coef": 0.05,
            "max_epoch": epochs,
            "matmul_precision": "highest",
        },
        "full_model": {
            "random_encoder": {"output_size": 128, "use_bias": True, "relu_slope": 0.2},
            "real_encoder": {"output_size": 128, "use_bias": True, "relu_slope": 0.2},
            "hyper_network": {"use_bias": True, "relu_slope": 0.2},
            "target_network": {"use_bias": True, "relu_slope": 0.2,
                               "freeze_layers_learning": False,
                               "layer_out_channels": [32, 64, 128, 64]},
            "target_network_input": {"constant": False,
                                     "normalization": {"enable": True,
                                                       "type": "progressive",
                                                       "epoch": 100}},
        },
        "setup": {"seed": 2020, "gpu_id": 0},
        "telegram_logger": {"enable": False, "bot_token": "", "chat_id": ""},
        "results_root": results_root,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--epoch-mode", choices=["step", "scan"], default="step",
                    help="scan must reproduce the SAME goldens (trajectory-"
                         "identical epoch modes, tests/test_trainer_scan.py)")
    ap.add_argument("--no-golden", action="store_true",
                    help="print observed values without asserting goldens")
    args = ap.parse_args()

    if not os.path.exists(join(ROOT, CAT)):
        t0 = time.time()
        make_ellipsoid_dataset(ROOT, n_models=120, seed=0)
        print(f"corpus built in {time.time() - t0:.0f}s", flush=True)

    results_root = f"/tmp/det_smoke_{int(time.time())}"
    cfg = make_config(results_root, args.epochs)
    if args.epoch_mode != "step":
        cfg["training"]["epoch_mode"] = args.epoch_mode
    os.makedirs(results_root, exist_ok=True)
    cfg_path = join(results_root, "config.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=1)

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "hyperpocket_tpu.cli", "--config", cfg_path],
        cwd=dirname(dirname(os.path.abspath(__file__))))
    if proc.returncode != 0:
        print(f"CLI run failed (exit {proc.returncode})", flush=True)
        return 2
    wall = time.time() - t0

    from hyperpocket_tpu.train.config import get_results_dir_path
    metrics_dir = join(get_results_dir_path(cfg, "training"), "metrics")
    trains = sorted(glob(join(metrics_dir, "*_train.npy")))
    vals = sorted(glob(join(metrics_dir, "*_val.npy")))
    if not trains or not vals:
        print(f"no metrics written under {metrics_dir}", flush=True)
        return 2
    train_losses = np.load(trains[-1])
    val_losses = np.load(vals[-1])
    ep1_loss = float(train_losses[0][0])
    ep1_val = float(val_losses[0][0])
    print(f"epoch-1 Loss_ALL {ep1_loss!r}  epoch-1 val {ep1_val!r}  "
          f"({args.epochs} epochs in {wall:.0f}s)", flush=True)

    if args.no_golden:
        return 0
    ok_loss = abs(ep1_loss - GOLDEN_EPOCH1_LOSS_ALL) <= 1e-6 * GOLDEN_EPOCH1_LOSS_ALL
    ok_val = abs(ep1_val - GOLDEN_EPOCH1_VAL) <= 1e-5 * GOLDEN_EPOCH1_VAL
    if ok_loss and ok_val:
        print("PASS: golden values reproduced", flush=True)
        return 0
    print(f"FAIL: golden epoch-1 Loss_ALL {GOLDEN_EPOCH1_LOSS_ALL!r} "
          f"val {GOLDEN_EPOCH1_VAL!r}", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
