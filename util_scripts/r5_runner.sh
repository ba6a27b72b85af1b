#!/bin/bash
# Round-5 precision-recipe A/B queue runner (CLAUDE.md backend-outage runbook).
#
# Launch DETACHED so it survives session restarts:
#   setsid nohup bash util_scripts/r5_runner.sh > /dev/null 2>&1 &
#
# Queue (VERDICT r4 items 1+4): five 200-epoch multicat training arms, ALL
# on the regenerated round-5 corpus (util_scripts/make_r5_corpus.sh — the
# round-4 corpus was lost with the VM, so the ranking re-anchors here):
#   1. results/multicat_fp32_base   — fp32-highest baseline anchor
#      (+ full experiments pass)
#   2. results/multicat_fp32high    — matmul_precision=high throughout
#      (+ the full experiments pass, for MMD/UHD/TMD comparability)
#   3. results/precision_switch_e50 — bf16 epochs 1-50, fp32-highest after
#   4. results/composed_fast        — bf16->fp32-high@50 + bf16 Adam moments
#                                     + rbg keys (the composed fast recipe)
#   5. results/multicat_bf16_r5     — bf16 end-to-end re-anchor (last; the
#                                     deadline may cut it)
#
# Safety rules (observed-the-hard-way, CLAUDE.md): one axon client at a time;
# never kill a healthy in-flight client; wedge = log silent >25 min, kill BY
# PID then re-poll backend health with bounded probes; stop launching after
# DEADLINE_S; touch results/R5_STOP to stop at the next decision point.

set -u
REPO=/root/repo
ARMS=(multicat_fp32_base multicat_fp32high precision_switch_e50 composed_fast)
LATE_ARMS=(multicat_bf16_r5)
RLOG=$REPO/results/r5_runner.log
STOP=$REPO/results/R5_STOP
WEDGE_S=1500
DEADLINE_S=$(( $(date +%s) + ${R5_BUDGET_H:-8}*3600 ))
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_PLATFORMS=axon
cd "$REPO" || exit 1

note() { echo "$(date -u +%FT%TZ) $*" >> "$RLOG"; }

epochs_done() { # $1 = config path
  R5_CONFIG="$1" PYTHONPATH=/root/repo HPCD_PLATFORM=cpu JAX_PLATFORMS=cpu python - <<'EOF' 2>/dev/null
import json, os, sys
sys.path.insert(0, "/root/repo")
from os.path import join
from hyperpocket_tpu.train.config import get_results_dir_path
from hyperpocket_tpu.train.checkpoint import find_latest_resumable_epoch
cfg = json.load(open(os.environ["R5_CONFIG"]))
rd = get_results_dir_path(cfg, "training")
print(find_latest_resumable_epoch(join(rd, "weights"), join(rd, "metrics")))
EOF
}

wait_healthy() {
  local n=0
  while true; do
    if PYTHONPATH=/root/.axon_site:/root/repo python -m hyperpocket_tpu.diagnose \
        >> "$RLOG" 2>&1; then
      note "backend healthy"
      return 0
    fi
    n=$((n + 1))
    note "backend not healthy (probe $n); sleeping 180s"
    [ -f "$STOP" ] && return 1
    sleep 180
  done
}

run_stage() { # $1 = stage name, $2... = command
  local stage=$1; shift
  local slog="$REPO/results/${stage}_$(date +%s).log"
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

train_arm() { # $1 = arm name; crash-resume training to max_epoch
  local arm=$1
  local OUT=$REPO/results/$arm
  local CONFIG=$OUT/config.json
  [ -f "$CONFIG" ] || { note "SKIP $arm: no config"; return 0; }
  local MAX_EPOCH
  MAX_EPOCH=$(python -c "import json;print(json.load(open('$CONFIG'))['training']['max_epoch'])")
  while true; do
    [ -f "$STOP" ] && { note "STOP file: exiting"; exit 0; }
    local ep
    ep=$(epochs_done "$CONFIG"); ep=${ep:-0}
    note "$arm resumable epochs: $ep / $MAX_EPOCH"
    if [ "$ep" -ge "$MAX_EPOCH" ]; then break; fi
    if [ "$(date +%s)" -ge "$DEADLINE_S" ]; then
      note "deadline passed with $arm incomplete; exiting"
      exit 0
    fi
    wait_healthy || { note "STOP during health wait"; exit 0; }
    run_stage "${arm}_training" python -m hyperpocket_tpu.cli -c "$CONFIG"
  done
  note "$arm training complete ($MAX_EPOCH epochs)"
  touch "$OUT/TRAINING_DONE"
}

note "=== r5 runner start (deadline $(date -u -d @$DEADLINE_S +%FT%TZ)) ==="

for arm in "${ARMS[@]}"; do
  train_arm "$arm"
done

# experiments passes on the baseline and fp32-high arms (metric
# comparability on the SAME corpus/weights-recipe axis)
for arm in multicat_fp32_base multicat_fp32high; do
  OUT=$REPO/results/$arm
  [ -f "$OUT/TRAINING_DONE" ] || continue
  [ -f "$OUT/experiments_summary.json" ] && continue
  while true; do
    [ -f "$STOP" ] && { note "STOP file: exiting"; exit 0; }
    [ "$(date +%s)" -ge "$DEADLINE_S" ] && { note "deadline before experiments"; exit 0; }
    wait_healthy || exit 0
    if run_stage ${arm}_experiments \
        python util_scripts/dress_rehearsal_multicat.py "results/$arm"; then
      break
    fi
    note "experiments stage failed; retrying after health re-poll"
    sleep 60
  done
done

# bf16 re-anchor arm LAST: lower-value going in (though it ended up
# overturning the r4 plateau claim), so it only gets the remaining budget
for arm in "${LATE_ARMS[@]}"; do
  train_arm "$arm"
done
note "=== r5 runner done ==="
touch $REPO/results/R5_RUNNER_DONE
