#!/bin/bash
# Round-4 dress-rehearsal detached runner (CLAUDE.md backend-outage runbook).
#
# Launch DETACHED so it survives session restarts:
#   setsid nohup bash util_scripts/r4_runner.sh > /dev/null 2>&1 &
#
# Stages:
#   1. training  — resume `python -m hyperpocket_tpu.cli -c <config>` until
#      find_latest_resumable_epoch reaches max_epoch. Crash-resume makes the
#      client relaunchable after any outage/kill.
#   2. experiments — util_scripts/dress_rehearsal_r4.py (all six experiments
#      on the best_val weights).
#
# Safety rules baked in (observed-the-hard-way, CLAUDE.md):
#   * one axon client at a time (the cli/chip_lock already serializes; the
#     runner never starts a second stage while one is alive);
#   * never kill a HEALTHY in-flight client — only a WEDGED one (no log
#     writes for WEDGE_S), and then by PID;
#   * after any kill or nonzero exit, re-poll backend health with bounded
#     subprocess probes (python -m hyperpocket_tpu.diagnose) before the next
#     launch;
#   * stop launching new clients after DEADLINE_S so the driver's
#     end-of-round bench is never queued behind a fresh multi-hour client;
#   * touch results/dress_rehearsal_r4/STOP to stop the runner at the next
#     decision point.

set -u
REPO=/root/repo
OUT=${R4_OUT:-$REPO/results/dress_rehearsal_r4}
CONFIG=$OUT/config.json
# experiments driver: override for rehearsal variants, e.g.
#   R4_EXPERIMENTS="util_scripts/dress_rehearsal_multicat.py $OUT"
EXPERIMENTS=${R4_EXPERIMENTS:-util_scripts/dress_rehearsal_r4.py}
export R4_OUT="$OUT"
RLOG=$OUT/runner.log
WEDGE_S=1500          # 25 min of log silence => wedged
DEADLINE_S=$(( $(date +%s) + 9*3600 ))
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_PLATFORMS=axon
cd "$REPO" || exit 1
mkdir -p "$OUT"

note() { echo "$(date -u +%FT%TZ) $*" >> "$RLOG"; }

epochs_done() {
  R4_CONFIG="$CONFIG" PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python - <<'EOF' 2>/dev/null
import json, os, sys
sys.path.insert(0, "/root/repo")
from os.path import join
from hyperpocket_tpu.train.config import get_results_dir_path
from hyperpocket_tpu.train.checkpoint import find_latest_resumable_epoch
cfg = json.load(open(os.environ["R4_CONFIG"]))
rd = get_results_dir_path(cfg, "training")
print(find_latest_resumable_epoch(join(rd, "weights"), join(rd, "metrics")))
EOF
}

wait_healthy() {
  # Bounded subprocess probes; diagnose refuses while a live client holds
  # the chip lock (shouldn't happen here: we only call this with no client).
  local n=0
  while true; do
    if PYTHONPATH=/root/.axon_site:/root/repo python -m hyperpocket_tpu.diagnose \
        >> "$RLOG" 2>&1; then
      note "backend healthy"
      return 0
    fi
    n=$((n + 1))
    note "backend not healthy (probe $n); sleeping 180s"
    [ -f "$OUT/STOP" ] && return 1
    sleep 180
  done
}

# Supervise one client process: launch, then watch its log mtime. Returns
# when the client has exited (normally, or after a wedge kill).
run_stage() { # $1 = stage name, $2... = command
  local stage=$1; shift
  local slog="$OUT/${stage}_$(date +%s).log"
  note "launching $stage -> $slog"
  "$@" > "$slog" 2>&1 &
  local pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    local age=$(( $(date +%s) - $(stat -c %Y "$slog" 2>/dev/null || date +%s) ))
    if [ "$age" -gt "$WEDGE_S" ]; then
      note "$stage pid $pid silent ${age}s: wedged, killing BY PID"
      kill -9 "$pid" 2>/dev/null
      sleep 10
      return 2
    fi
  done
  wait "$pid"
  local rc=$?
  note "$stage exited rc=$rc"
  return "$rc"
}

if [ ! -f "$CONFIG" ]; then
  note "FATAL: no config at $CONFIG — stage a config.json under R4_OUT first"
  exit 1
fi
MAX_EPOCH=$(python -c "import json;print(json.load(open('$CONFIG'))['training']['max_epoch'])")

note "=== runner start (deadline $(date -u -d @$DEADLINE_S +%FT%TZ), max_epoch $MAX_EPOCH) ==="

# ---- stage 1: training to max_epoch ----------------------------------------
while true; do
  [ -f "$OUT/STOP" ] && { note "STOP file: exiting"; exit 0; }
  ep=$(epochs_done); ep=${ep:-0}
  note "resumable epochs: $ep / $MAX_EPOCH"
  if [ "$ep" -ge "$MAX_EPOCH" ]; then break; fi
  if [ "$(date +%s)" -ge "$DEADLINE_S" ]; then
    note "deadline passed with training incomplete; exiting"
    exit 0
  fi
  wait_healthy || { note "STOP during health wait"; exit 0; }
  run_stage training python -m hyperpocket_tpu.cli -c "$CONFIG"
done
note "training complete ($MAX_EPOCH epochs)"

# ---- stage 2: experiments ---------------------------------------------------
while true; do
  [ -f "$OUT/STOP" ] && { note "STOP file: exiting"; exit 0; }
  [ -f "$OUT/experiments_summary.json" ] && break
  if [ "$(date +%s)" -ge "$DEADLINE_S" ]; then
    note "deadline passed with experiments incomplete; exiting"
    exit 0
  fi
  wait_healthy || exit 0
  if run_stage experiments python $EXPERIMENTS; then
    break
  fi
  note "experiments stage failed; retrying after health re-poll"
  sleep 60
done
note "=== runner done ==="
