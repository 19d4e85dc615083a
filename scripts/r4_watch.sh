#!/bin/bash
# Bounded tunnel watcher for the round-4 continuation mint session.
set -u
cd "$(dirname "$0")/.."
for i in $(seq 1 120); do
  if timeout 90 python -c "
import jax
ds = jax.devices()
assert any('cpu' not in str(d).lower() for d in ds), ds
import jax.numpy as jnp
assert float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()) == 512.0
print('tpu alive:', ds)
" 2>/dev/null; then
    echo "== tunnel alive at attempt $i ($(date -u)) — running continuation"
    bash scripts/r4_mint_continue.sh
    echo "== continuation done ($(date -u))"
    exit 0
  fi
  echo "probe $i: tunnel down ($(date -u))"
  sleep 300
done
echo "== gave up after 120 probes"
exit 1
