#!/bin/bash
# One-shot TPU measurement session: runs every hardware-gated measurement
# in priority order (headline first, in case the tunnel dies again — see
# the tpu-tunnel-outages note).  The TPU is EXCLUSIVE: steps are strictly
# serialized and bounded.  Idempotent via $OUT/<name>.ok markers, so a
# re-run after a mid-session tunnel death skips what already finished.
#
# Usage: bash scripts/tpu_session.sh   (logs + markers under /tmp/tpusess)
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpusess
mkdir -p "$OUT"

step() {
  local name=$1 tmo=$2; shift 2
  if [ -f "$OUT/$name.ok" ]; then echo "== $name: already done"; return 0; fi
  echo "== $name (timeout ${tmo}s)"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  if [ $rc -eq 0 ]; then
    touch "$OUT/$name.ok"; echo "   ok"
  else
    echo "   FAILED rc=$rc (log: $OUT/$name.log)"
  fi
  return $rc
}

step bench        900  python bench.py
step scale        1500 python scripts/bench_scale.py
step scale_tribwd 1500 env VARGP_TPU_TRI_BWD=1 python scripts/bench_scale.py
step symgram      1800 python scripts/bench_symgram.py
step trace_m1024  900  python scripts/trace_scale.py m1024
step trace_s1000  900  python scripts/trace_scale.py s1000
step trace_flag   900  python scripts/trace_step.py
echo "session complete; logs in $OUT"
