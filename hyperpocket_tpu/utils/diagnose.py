"""Backend health diagnostic: ``python -m hyperpocket_tpu.diagnose``.

Operating the axon-tunnelled TPU needs the same three checks over and over
(CLAUDE.md runbook): is the backend initializable at all, what is the
dispatch round-trip latency (healthy ~29 ms; observed degraded to 109 s),
and what is the bulk D2H bandwidth (observed swinging ~2 s to ~115 s for
the same ~470 MB fetch). This module packages them with the safety rules
baked in:

- Every probe is a SUBPROCESS with staged deadlines. A backend stuck in
  INIT is killed at ``--timeout-s`` — an init-stuck client holds no
  in-flight fetches, so that kill is safe. Once the probe reports init
  complete, it is NEVER killed (killing a client with fetches possibly in
  flight is what wedges the backend): if dispatch exceeds
  ``--dispatch-timeout-s`` the parent reports ``down`` and leaves the
  probe running to finish or hang on its own, printing its pid.
- The diagnostic never takes the single-client chip lock, and REFUSES to
  probe while a live client holds it (a second concurrent axon client is
  the documented wedge trigger). ``--force`` overrides for an operator who
  has decided the risk is right, e.g. diagnosing a client that is itself
  wedged.

Output: one JSON line per probe. Exit status: 0 healthy, 1 degraded
(initializable but round-trip > ``--degraded-ms``), 2 down, 3 refused
(live chip-lock holder and no ``--force``).

Usage::

    python -m hyperpocket_tpu.diagnose              # init + latency
    python -m hyperpocket_tpu.diagnose --bulk-mb 64 # + D2H bandwidth
    python -m hyperpocket_tpu.diagnose --wait       # recovery poll
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time
from typing import Optional

from hyperpocket_tpu.utils.chip_lock import DEFAULT_LOCK_PATH, _pid_alive

# Runs inside the probe subprocess. Prints machine-readable stage lines;
# the parent applies the init deadline until HPCD_DIAG_INIT_OK appears and
# the (kill-free) dispatch deadline after it.
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
print("HPCD_DIAG_INIT_OK %.3f" % init_s, flush=True)
# test hook: simulate a hung/slow dispatch phase
time.sleep(float(os.environ.get("HPCD_DIAG_TEST_DISPATCH_SLEEP", "0")))
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


def run_probe(timeout_s: float, bulk_mb: float = 0.0,
              dispatch_timeout_s: float = 900.0) -> dict:
    """One staged subprocess probe; returns the diagnostic dict.

    ``timeout_s`` bounds backend INIT (an init-stuck probe is killed —
    safe, it holds no fetches). After init the probe is never killed: past
    ``dispatch_timeout_s`` the parent reports ``down`` with the probe's pid
    and leaves it running (killing a mid-fetch client can wedge the
    backend for every future client).
    """
    argv = [sys.executable, "-c", _PROBE_SRC]
    if bulk_mb > 0:
        argv.append(str(bulk_mb))
    proc = subprocess.Popen(argv, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    lines: list[str] = []
    eof = threading.Event()

    def _reader():
        assert proc.stdout is not None
        for line in proc.stdout:
            lines.append(line.rstrip("\n"))
        eof.set()

    threading.Thread(target=_reader, daemon=True).start()

    t0 = time.monotonic()
    while True:
        if eof.wait(0.2) and proc.poll() is not None:
            break
        elapsed = time.monotonic() - t0
        init_ok = any(ln.startswith("HPCD_DIAG_INIT_OK") for ln in lines)
        if not init_ok and elapsed > timeout_s:
            proc.kill()  # init-stuck: holds no in-flight fetches, safe
            proc.wait()
            return {"status": "down",
                    "error": f"backend init unresponsive for {timeout_s:.0f}s "
                             "(init-stuck probe killed; no fetches in flight)"}
        if init_ok and elapsed > dispatch_timeout_s:
            return {"status": "down", "probe_pid": proc.pid,
                    "error": f"dispatch hung >{dispatch_timeout_s:.0f}s after "
                             f"init; probe LEFT RUNNING (pid {proc.pid}) — "
                             "killing a mid-fetch client can wedge the backend"}

    wall = time.monotonic() - t0
    for line in lines:
        if line.startswith("HPCD_DIAG "):
            out = json.loads(line[len("HPCD_DIAG "):])
            out["status"] = "up"
            out["probe_wall_s"] = round(wall, 2)
            return out
    return {"status": "down", "probe_rc": proc.returncode,
            "error": lines[-1][:300] if lines else "no output"}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--timeout-s", type=float, default=150.0,
                    help="backend-init deadline; an init-stuck probe is "
                         "killed (default 150)")
    ap.add_argument("--dispatch-timeout-s", type=float, default=900.0,
                    help="post-init budget; past it the probe is reported "
                         "down but NEVER killed (default 900)")
    ap.add_argument("--bulk-mb", type=float, default=0.0,
                    help="also time a D2H fetch of this many MB")
    ap.add_argument("--degraded-ms", type=float, default=300.0,
                    help="roundtrip above this is 'degraded' (default 300)")
    ap.add_argument("--wait", action="store_true",
                    help="re-probe every 90 s until healthy (recovery poll)")
    ap.add_argument("--force", action="store_true",
                    help="probe even while a live client holds the chip lock "
                         "(concurrent-client wedge risk — see module doc)")
    args = ap.parse_args(argv)

    holder = lock_holder()
    if holder is not None and holder != os.getpid() and not args.force:
        print(json.dumps({
            "status": "refused", "chip_lock_holder": holder,
            "error": "live client holds the chip lock; a concurrent probe "
                     "risks wedging it (use --force to probe anyway)",
        }), flush=True)
        return 3

    while True:
        out = run_probe(args.timeout_s, args.bulk_mb,
                        dispatch_timeout_s=args.dispatch_timeout_s)
        if holder is not None:
            out["chip_lock_holder"] = holder
        if out["status"] == "up":
            out["status"] = ("healthy" if out["roundtrip_ms"] <= args.degraded_ms
                             else "degraded")
        print(json.dumps(out), flush=True)
        if out["status"] == "healthy" or not args.wait:
            break
        if "probe_pid" in out:
            # an abandoned in-flight probe means a live axon client exists;
            # spawning more alongside it is the concurrent-client pattern
            print("aborting --wait: a previous probe is still in flight",
                  file=sys.stderr)
            break
        time.sleep(90)
    return {"healthy": 0, "degraded": 1}.get(out["status"], 2)


if __name__ == "__main__":
    sys.exit(main())
