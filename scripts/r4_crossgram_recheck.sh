#!/bin/bash
# Re-run the cross-Gram A/B with the symmetric-tracing fix (both arms
# trace z) to re-verify the ROADMAP round-4 speedup claim.
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
python scripts/bench_crossgram.py > /tmp/r4s/crossgram_recheck.log 2>&1
echo "=== crossgram_recheck exit $? ==="
