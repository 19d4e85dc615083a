#!/bin/bash
# Tunnel watcher: probe the axon TPU tunnel every 5 min (bounded probe —
# jax.devices() HANGS when the tunnel is down, so the probe runs in a
# timeout'd subprocess; see the tpu-tunnel-outages memory note).  When a
# probe sees a real TPU device, run the idempotent measurement session
# (scripts/tpu_session.sh) once and exit.  Total watch bounded to ~10 h.
set -u
cd "$(dirname "$0")/.."
for i in $(seq 1 120); do
  if timeout 90 python -c "
import jax
ds = jax.devices()
assert any('cpu' not in str(d).lower() for d in ds), ds
print('tpu alive:', ds)
" 2>/dev/null; then
    echo "== tunnel alive at attempt $i ($(date -u)) — running session"
    bash scripts/tpu_session.sh
    echo "== session done ($(date -u))"
    exit 0
  fi
  echo "probe $i: tunnel down ($(date -u))"
  sleep 300
done
echo "== gave up after 120 probes"
exit 1
