#!/bin/bash
# Fresh eval-semantics A/B (VERDICT r3 #9): every arm re-run on the SAME
# platform (the tunneled TPU) under the current shipped defaults.
# Waits for the given PID (the post-measure runner) before touching the
# exclusive TPU.
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
rm -f results/eval_ab.json
rm -rf results/eval_ab
python scripts/eval_ab.py > /tmp/r4s/evalab_fresh.log 2>&1
echo "=== evalab_fresh exit $? ==="
