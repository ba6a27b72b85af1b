#!/bin/bash
# Regenerate the round-5 multicat rehearsal corpus EXACTLY.
#
# Both steps are fully seeded (make_synthetic_3depn consumes one
# np.random.default_rng(seed) stream; generate_partial_dataset derives a
# per-model RNG from (config seed, category, model name)), so re-running
# this script reproduces the corpus bit-for-bit on any host.
#
# Provenance rule learned the hard way (round 5): the round-4 corpus'
# generation args were never recorded; when the build VM was recycled the
# corpus — and with it the comparability of every recorded convergence
# number — was unrecoverable (six epoch-1 fingerprint probes against
# candidate regenerations all failed; results/REHEARSALS.md). Every corpus
# an experiment depends on must be regenerable from a checked-in command.
set -eu
cd "$(dirname "$0")/.."
OUT=${1:-/root/data/3depn_multicat}
python util_scripts/make_synthetic_3depn.py "$OUT" 200 150 1856 v2 167
# slicing reads dataset.path from a config: derive one pointing at $OUT so a
# custom output dir slices the corpus it just generated (the slicer's
# per-model RNG is (setup.seed, category, model)-keyed — path-independent)
SLICE_CFG=$(mktemp --suffix=.json)
python - "$OUT" "$SLICE_CFG" <<'EOF'
import json, sys
cfg = json.load(open("results/multicat_fp32_base/config.json"))
cfg["dataset"]["path"] = sys.argv[1]
json.dump(cfg, open(sys.argv[2], "w"))
EOF
python util_scripts/generate_partial_dataset.py -c "$SLICE_CFG"
rm -f "$SLICE_CFG"
echo "corpus at $OUT: 517 models (chair 200 / airplane 150 / table 167), v2"
