#!/bin/bash
# Post-mint TPU measurements (run AFTER the other TPU runners — the TPU
# is exclusive).  Waits for the given PID to exit, then records:
#   1. the notebook-budget eval pass under the fused cross-Gram kernel
#      (RESULTS.md still carries the pre-kernel 99 ms figure),
#   2. chain-reload T x T analysis wall times (VERDICT r3 weak #2 asked
#      for these in RESULTS.md),
#   3. a fresh flagship bench line.
# NOTE: /usr/bin/time does not exist in this image — step timing uses
# bash SECONDS (wall).
set -u
cd "$(dirname "$0")/.."
L=/tmp/r4s
mkdir -p "$L"
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

step() {
  name=$1; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S)) ==="
  local t0=$SECONDS
  "$@" > "$L/$name.log" 2>&1
  echo "=== $name exit $? wall=$((SECONDS - t0))s ==="
}

step bench_eval python scripts/bench_eval.py
step an_sdigits python -m vargp_tpu analyze_sdigits --log_dir=results/sdigits_r4 \
    --out_json=/tmp/r4s/sdigits_analysis.json
step an_smnist python -m vargp_tpu analyze_smnist --log_dir=results/smnist_r4 \
    --out_json=/tmp/r4s/smnist_analysis.json
step bench python bench.py

echo "=== post-measure complete ==="
