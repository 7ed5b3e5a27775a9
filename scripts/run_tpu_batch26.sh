#!/bin/bash
# Batch 26: the argpack flat-tail bisect (queued in batches 17/21, wiped by
# the VM restarts, dropped from the batch-24 consolidation). This is the
# measurement VERDICT item 3 needs: which stage of the packed-select +
# exact-refine tail eats the 17 ms after gmax(12.3)+select(4) at B=1024.
cd /root/repo

for dep in /tmp/batch24.pid; do
  if [ -f "$dep" ]; then
    while kill -0 "$(cat $dep)" 2>/dev/null; do
      echo "[batch26] waiting for $dep $(date -u +%H:%M:%S)"; sleep 120
    done
  fi
done

probe() {
  for i in $(seq 1 60); do
    echo "[batch26] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch26] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch26] argpack stage bisect $(date -u +%H:%M:%S)"
timeout 5400 python scripts/bisect_argpack.py 2>&1 | tail -20
echo "[batch26] done $(date -u +%H:%M:%S)"
