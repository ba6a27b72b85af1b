#!/bin/bash
# Full-stack health verification loop (~35 min; CLAUDE.md round-5 recipe).
#
# Stages, in order (each gates the next):
#   1. diagnose  — bounded tunnel-health probe (safe while chip is busy)
#   2. suite     — full CPU test suite (8 virtual devices via conftest)
#   3. dryrun    — 8-device multichip dryrun on virtual CPU mesh
#   4. bench     — bench.py on the real chip (takes the chip lock)
#   5. smoke     — 2-epoch determinism smoke vs recorded goldens (chip lock)
#
# Chip stages are NEVER wrapped in timeouts (a killed in-flight axon client
# can wedge the backend — CLAUDE.md); they serialize on the chip lock and
# exit on their own. Launch detached if the session may restart:
#   setsid nohup bash util_scripts/health_loop.sh > /dev/null 2>&1 &
# Results land in $OUT (default /tmp/health_loop): per-stage logs + one
# summary.json line per stage.

set -u
REPO=$(cd "$(dirname "$0")/.." && pwd)
OUT=${HEALTH_OUT:-/tmp/health_loop}
mkdir -p "$OUT"
# One loop at a time: a second instance would truncate the first's summary
# and race it to the chip stages (observed 2026-08-19). flock is advisory
# but both instances run this script, which is all we need.
exec 9> "$OUT/.lock"
if ! flock -n 9; then
  echo "another health loop owns $OUT/.lock — refusing to run" >&2
  exit 3
fi
SUMMARY="$OUT/summary.json"
: > "$SUMMARY"
export PYTHONPATH=/root/.axon_site:$REPO
cd "$REPO" || exit 1

note() { echo "{\"stage\": \"$1\", \"ok\": $2, \"wall_s\": $3}" >> "$SUMMARY"; }

run_stage() { # name, cmd...
  local name=$1; shift
  local t0=$SECONDS
  echo "=== $name: $*" | tee -a "$OUT/driver.log"
  "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  note "$name" "$([ $rc -eq 0 ] && echo true || echo false)" $((SECONDS - t0))
  echo "=== $name exit=$rc ($((SECONDS - t0))s)" | tee -a "$OUT/driver.log"
  return $rc
}

run_stage diagnose python -m hyperpocket_tpu.diagnose || exit 1
run_stage suite python -m pytest tests/ -q || exit 1
# HPCD_PLATFORM (not just JAX_PLATFORMS): the axon site hook rewrites
# jax_platforms to 'axon,cpu', so env cpu alone would make the PARENT an
# unlocked chip client just to count devices (the subprocess re-exec strips
# the axon site anyway; this keeps the parent off the tunnel entirely).
run_stage dryrun env JAX_PLATFORMS=cpu HPCD_PLATFORM=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -c "import hyperpocket_tpu, __graft_entry__ as g; g.dryrun_multichip(8)" || exit 1
# Chip stages: no timeout wrappers, chip-locked internally.
run_stage bench python bench.py || exit 1
run_stage smoke python util_scripts/determinism_smoke.py || exit 1
echo "health loop complete" | tee -a "$OUT/driver.log"
