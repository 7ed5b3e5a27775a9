#!/bin/bash
# Batch 33 (chained after batch 32): the two post-bisect levers the sg
# sweep can't reach —
#   sort-L2: exact 2-operand lax.sort replaces the level-2 approx_max_k
#     (7.41 ms of the 31 ms wall at [1024, 8192]->128; sort1 at [1024,
#     2048] costs 0.49 ms, so even the 4x-wider slab should undercut it).
#   group=128: halves NG and with it the in-kernel transpose tile, the
#     sgmax re-read, the childgather, and the sort2 width; collision loss
#     doubles but stays ~0.06% at 8M (argpack containment analysis).
cd /root/repo

for dep in /tmp/batch32.pid /tmp/batch30.pid /tmp/batch29.pid /tmp/batch28.pid; do
  if [ -f "$dep" ]; then
    while kill -0 "$(cat $dep)" 2>/dev/null; do
      echo "[batch33] waiting for $dep $(date -u +%H:%M:%S)"; sleep 120
    done
  fi
done

probe() {
  for i in $(seq 1 60); do
    echo "[batch33] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch33] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch33] argpack sort-L2 + group=128 sweep $(date -u +%H:%M:%S)"
export TUNE_CASES="argpack,128,24,64,64,sort;argpack,128,24,32,64,sort;argpack,512,24,64,64,sort;argpack,128,24,32,128,approx;argpack,128,24,32,128,sort"
timeout 7200 python scripts/tune_argpack.py 2>&1 | tail -8
unset TUNE_CASES
echo "[batch33] done $(date -u +%H:%M:%S)"
