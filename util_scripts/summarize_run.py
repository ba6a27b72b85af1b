"""Summarize a training run directory for the precision-ranking writeup.

Usage: python util_scripts/summarize_run.py results/<arm> [epochs...]

Prints best val (0.05*CD total), its epoch, per-category values at best,
val at selected checkpoints (default 50/100/150/200), wall-clock from the
log, and new-best count — the fields the REHEARSALS ranking table uses.
"""

from __future__ import annotations

import json
import os
import re
import sys
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def find_log(arm_dir: str) -> str:
    cfg = json.load(open(join(arm_dir, "config.json")))
    os.environ.setdefault("HPCD_PLATFORM", "cpu")
    from hyperpocket_tpu.train.config import get_results_dir_path

    return join(get_results_dir_path(cfg, "training"), "log.txt")


def parse(log_path: str):
    text = open(log_path).read()
    # epoch blocks: "[e/200] Loss_ALL: x ... Time: t" then val rows
    epochs = []
    blocks = re.split(r"\[(\d+)/\d+\] Loss_ALL: ([0-9.]+).*?Time: ([0-9.]+)s", text)
    # blocks = [pre, e, loss, t, body, e, loss, t, body, ...]
    for i in range(1, len(blocks) - 3, 4):
        e, loss, t, body = int(blocks[i]), float(blocks[i + 1]), float(blocks[i + 2]), blocks[i + 3]
        cats = dict(re.findall(r"(\w+): \[([0-9.]+)\]", body))
        total = float(cats.pop("total")) if "total" in cats else None
        epochs.append({
            "epoch": e, "train_loss": loss, "time_s": t,
            "val_total": total, "val_cats": {k: float(v) for k, v in cats.items()},
            "new_best": "new best epoch" in body,
        })
    return epochs


def main():
    arm = sys.argv[1].rstrip("/")
    marks = [int(a) for a in sys.argv[2:]] or [50, 100, 150, 200]
    log_path = find_log(arm)
    epochs = parse(log_path)
    if not epochs:
        print(f"{arm}: no epochs parsed from {log_path}")
        return
    with_val = [e for e in epochs if e["val_total"] is not None]
    if not with_val:
        print(f"{arm}: {len(epochs)} train epochs but no val rows yet in {log_path}")
        return
    best = min(with_val, key=lambda e: e["val_total"])
    first, last = epochs[0], epochs[-1]
    out = {
        "arm": os.path.basename(arm),
        "epochs_done": last["epoch"],
        "best_val": round(best["val_total"], 2),
        "best_epoch": best["epoch"],
        "best_val_cats": {k: round(v, 1) for k, v in best["val_cats"].items()},
        "val_at": {e["epoch"]: round(e["val_total"], 2)
                   for e in with_val if e["epoch"] in marks},
        "train_loss_first_last": [first["train_loss"], last["train_loss"]],
        "new_best_count": sum(e["new_best"] for e in with_val),
        "epoch1_fingerprint": first["train_loss"],
    }
    # Active wall-clock: sum of inter-timestamp gaps, capping any gap at 30
    # min so a crash-resumed run (the runner's normal recovery mode) does not
    # report client downtime as training cost. Year-less %m-%d stamps: clamp
    # negative gaps (year wrap) to 0.
    stamps = re.findall(r"(\d\d-\d\d \d\d:\d\d:\d\d)", open(log_path).read())
    if len(stamps) >= 2:
        from datetime import datetime

        ts = [datetime.strptime(s, "%m-%d %H:%M:%S") for s in stamps]
        gaps = [(b - a).total_seconds() for a, b in zip(ts, ts[1:])]
        active = sum(min(max(g, 0.0), 1800.0) for g in gaps)
        out["wall_min"] = round(active / 60.0, 1)
        if any(g > 1800.0 or g < 0.0 for g in gaps):
            out["wall_min_note"] = "gaps >30min (crash-resume?) excluded"
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
