"""Interleaved in-process A/B: per-step epoch loop vs scanned epoch.

Emulates exactly what Trainer.train_epoch does in each mode at flagship
shapes (S=23 batches of B=64, N=1024 in / 2048 gt — the r4 rehearsal's
epoch): host numpy batches, per-batch upload + dispatch for "step" vs one
stacked upload + one lax.scan dispatch for "scan"
(training.epoch_mode, train/trainer.py::make_train_epoch_scan). Windows are
interleaved in ONE process (cross-process chip timings swing 2-4x,
CLAUDE.md) and every window ends with a forced host fetch of the epoch's
loss rows, which is also what the Trainer fetches per epoch.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python util_scripts/epoch_scan_ab.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from __graft_entry__ import FLAGSHIP_CONFIG  # noqa: E402
from hyperpocket_tpu.models import FullModel  # noqa: E402
from hyperpocket_tpu.train.optim import make_optimizer  # noqa: E402
from hyperpocket_tpu.train.trainer import (  # noqa: E402
    make_train_epoch_scan,
    make_train_step,
)
from hyperpocket_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

S, B = 23, 64
WINDOWS = 4
EPOCHS_PER_WINDOW = 3


def run_mode(compute_dtype: str, prng_impl: str):
    model = FullModel.from_config({**FLAGSHIP_CONFIG, "compute_dtype": compute_dtype})
    params = model.init(jax.random.key(0))
    tx = make_optimizer({"type": "Adam", "hyperparams": {"lr": 1e-4}})
    step = make_train_step(model, tx, 0.05, prng_impl)
    escan = make_train_epoch_scan(model, tx, 0.05, prng_impl)
    epoch = jnp.asarray(100.0)

    rng = np.random.default_rng(0)
    np_ex = rng.standard_normal((S, B, 1024, 3)).astype(np.float32)
    np_mi = rng.standard_normal((S, B, 1024, 3)).astype(np.float32)
    np_gt = rng.standard_normal((S, B, 2048, 3)).astype(np.float32)

    def fresh():
        return {
            "p": jax.tree_util.tree_map(jnp.copy, params),
            "s": jax.jit(tx.init)(params),
        }

    ctr = {"i": 0}

    def step_epoch(st):
        rows = []
        for i in range(S):
            ctr["i"] += 1
            ex, mi, g = (jnp.asarray(np_ex[i]), jnp.asarray(np_mi[i]),
                         jnp.asarray(np_gt[i]))
            st["p"], st["s"], loss, lr_, lk, _rec = step(
                st["p"], st["s"], ex, mi, g, np.uint32(ctr["i"]), epoch,
                num_points=2048)
            rows.append(jnp.stack([loss, lr_, lk]))
        return np.asarray(jax.device_get(jnp.stack(rows)))

    def scan_epoch(st):
        keys = np.arange(ctr["i"] + 1, ctr["i"] + 1 + S, dtype=np.uint32)
        ctr["i"] += S
        ex, mi, g = (jnp.asarray(np_ex), jnp.asarray(np_mi), jnp.asarray(np_gt))
        st["p"], st["s"], _rec, losses = escan(
            st["p"], st["s"], ex, mi, g, jnp.asarray(keys), epoch,
            num_points=2048)
        return np.asarray(jax.device_get(losses))

    states = {"step": fresh(), "scan": fresh()}
    # compile warmup, both paths, and a numerics cross-check on fresh states
    r_step = step_epoch(states["step"])
    r_scan = scan_epoch(states["scan"])
    # same counters were NOT used (sequential counter); re-check numerics on
    # aligned counters instead: reset and run one epoch each from ctr base
    states = {"step": fresh(), "scan": fresh()}
    ctr["i"] = 1000
    r_step = step_epoch(states["step"])
    ctr["i"] = 1000
    r_scan = scan_epoch(states["scan"])
    err = float(np.max(np.abs(r_step - r_scan) / (np.abs(r_step) + 1e-6)))
    print(f"[{compute_dtype}] loss-row max rel diff step-vs-scan: {err:.2e}", flush=True)

    out = {}
    for mode, fn in (("step", step_epoch), ("scan", scan_epoch)):
        out[mode] = []
    for _ in range(WINDOWS):
        for mode, fn in (("step", step_epoch), ("scan", scan_epoch)):
            st = states[mode]
            t0 = time.monotonic()
            for _ in range(EPOCHS_PER_WINDOW):
                fn(st)
            out[mode].append((time.monotonic() - t0) / EPOCHS_PER_WINDOW)
    res = {m: float(np.median(v)) for m, v in out.items()}
    print(f"[{compute_dtype}] step {res['step']*1e3:.1f} ms/epoch | "
          f"scan {res['scan']*1e3:.1f} ms/epoch | "
          f"speedup {res['step']/res['scan']:.2f}x  (S={S}, B={B})", flush=True)
    return res


def main():
    enable_compile_cache()
    jax.config.update("jax_default_matmul_precision", "highest")
    print(f"devices: {jax.devices()}", flush=True)
    run_mode("float32", "threefry2x32")
    run_mode("bfloat16", "rbg")


if __name__ == "__main__":
    from hyperpocket_tpu.utils.chip_lock import chip_lock

    with chip_lock():
        main()
