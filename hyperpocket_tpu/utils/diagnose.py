"""Backend health diagnostic: ``python -m hyperpocket_tpu.diagnose``.

Operating the axon-tunnelled TPU needs the same three checks over and over
(CLAUDE.md runbook): is the backend initializable at all, what is the
dispatch round-trip latency (healthy ~29 ms; observed degraded to 109 s),
and what is the bulk D2H bandwidth (observed swinging ~2 s to ~115 s for
the same ~470 MB fetch). This module packages them with the safety rules
baked in:

- Every probe is a SHORT-LIVED SUBPROCESS under a timeout: a backend stuck
  in init hangs the probing process indefinitely, and an init-stuck client
  holds no in-flight fetches so killing it is safe (killing a client WITH
  in-flight fetches is what wedges the backend — never do that).
- The diagnostic never takes the single-client chip lock; it REPORTS the
  holder instead, so an operator diagnosing a wedged training run sees the
  pid rather than queueing behind it. Probing while a client owns the chip
  is itself a (small) wedge risk — the holder pid is printed first so the
  operator can choose.

Output: one JSON line. Exit status: 0 healthy, 1 degraded (initializable
but round-trip > ``--degraded-ms``), 2 down (probe failed or timed out).

Usage::

    python -m hyperpocket_tpu.diagnose             # init + latency
    python -m hyperpocket_tpu.diagnose --bulk-mb 64  # + D2H bandwidth
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from typing import Optional

from hyperpocket_tpu.utils.chip_lock import DEFAULT_LOCK_PATH, _pid_alive

# Runs inside the probe subprocess. Prints machine-readable lines; the
# parent only trusts output that arrives before its own deadline.
_PROBE_SRC = r"""
import json, os, sys, time
import jax, jax.numpy as jnp, numpy as np

# The axon sitecustomize imports jax at interpreter start, so the
# JAX_PLATFORMS env var is too late here; the pre-backend-init config
# update still works (same pattern as tests/conftest.py). Used by the
# test suite to point probes at the CPU backend.
_plat = os.environ.get("HPCD_DIAG_PLATFORM")
if _plat:
    jax.config.update("jax_platforms", _plat)

t0 = time.perf_counter()
dev = jax.devices()
init_s = time.perf_counter() - t0
f = jax.jit(lambda a: a * 2 + 1)
x = jnp.ones((8, 8))
np.asarray(jax.device_get(f(x)))  # warm compile, not timed
times = []
for _ in range(3):
    t0 = time.perf_counter()
    np.asarray(jax.device_get(f(x)))
    times.append(time.perf_counter() - t0)
out = {"platform": dev[0].platform, "n_devices": len(dev),
       "init_s": round(init_s, 3),
       "roundtrip_ms": round(min(times) * 1e3, 3)}
bulk_mb = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0
if bulk_mb > 0:
    n = int(bulk_mb * 1024 * 1024 // 4)
    big = jax.jit(lambda: jnp.ones((n,), jnp.float32) * 3)()
    np.asarray(jax.device_get(jnp.sum(big)))  # materialized on device
    t0 = time.perf_counter()
    host = np.asarray(jax.device_get(big))
    dt = time.perf_counter() - t0
    out["bulk_fetch_mb"] = round(host.nbytes / 1e6, 1)
    out["bulk_mb_per_s"] = round(host.nbytes / 1e6 / dt, 1)
print("HPCD_DIAG " + json.dumps(out), flush=True)
"""


def lock_holder(path: str = DEFAULT_LOCK_PATH) -> Optional[int]:
    """Pid of a live chip-lock holder, else None (stale locks ignored)."""
    try:
        with open(path, "r") as f:
            pid = int(f.read().strip() or "0")
    except (OSError, ValueError):
        return None
    return pid if pid and _pid_alive(pid) else None


def run_probe(timeout_s: float, bulk_mb: float = 0.0) -> dict:
    """One bounded subprocess probe; returns the diagnostic dict.

    ``status`` is ``healthy``/``degraded``/``down`` (degraded threshold is
    applied by the caller; here it is only ``down`` vs responsive).
    """
    argv = [sys.executable, "-c", _PROBE_SRC]
    if bulk_mb > 0:
        argv.append(str(bulk_mb))
    t0 = time.monotonic()
    try:
        r = subprocess.run(argv, capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return {"status": "down",
                "error": f"probe hung >{timeout_s:.0f}s (backend init stuck "
                         "or dispatch wedged)"}
    wall = time.monotonic() - t0
    for line in (r.stdout or "").splitlines():
        if line.startswith("HPCD_DIAG "):
            out = json.loads(line[len("HPCD_DIAG "):])
            out["status"] = "up"
            out["probe_wall_s"] = round(wall, 2)
            return out
    tail = ((r.stderr or "") + (r.stdout or "")).strip().splitlines()
    return {"status": "down", "probe_rc": r.returncode,
            "error": tail[-1][:300] if tail else "no output"}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--timeout-s", type=float, default=150.0,
                    help="probe subprocess deadline (default 150)")
    ap.add_argument("--bulk-mb", type=float, default=0.0,
                    help="also time a D2H fetch of this many MB")
    ap.add_argument("--degraded-ms", type=float, default=300.0,
                    help="roundtrip above this is 'degraded' (default 300)")
    ap.add_argument("--wait", action="store_true",
                    help="re-probe every 90 s until healthy (recovery poll)")
    args = ap.parse_args(argv)

    holder = lock_holder()
    if holder is not None and holder != os.getpid():
        print(f"chip lock held by live pid {holder} — probing anyway; "
              "prefer waiting for the client to finish", file=sys.stderr)

    while True:
        out = run_probe(args.timeout_s, args.bulk_mb)
        if holder is not None:
            out["chip_lock_holder"] = holder
        if out["status"] == "up":
            out["status"] = ("healthy" if out["roundtrip_ms"] <= args.degraded_ms
                             else "degraded")
        print(json.dumps(out), flush=True)
        if out["status"] == "healthy" or not args.wait:
            break
        time.sleep(90)
    return {"healthy": 0, "degraded": 1}.get(out["status"], 2)


if __name__ == "__main__":
    sys.exit(main())
