#!/bin/bash
# Round-3 batch 4 (chained after batch12): tiered 16-generation scale bench
# + pStable ceiling sweep (easy corpus grid, then one hard-corpus config).
cd /root/repo
if [ -f /tmp/batch12.pid ]; then
  while kill -0 "$(cat /tmp/batch12.pid)" 2>/dev/null; do sleep 60; done
fi
for i in $(seq 1 40); do
  echo "[batch13] probe attempt $i $(date -u +%H:%M:%S)"
  if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
    echo "[batch13] tunnel up"; break
  fi
  sleep 180
done
echo "[batch13] tiered scale start $(date -u +%H:%M:%S)"
timeout 5400 python scripts/bench_tiered_scale.py 2>&1 | tail -25
echo "[batch13] pstable sweep start $(date -u +%H:%M:%S)"
export PSTABLE_STEPS1_ONLY=1
timeout 7200 python scripts/bench_pstable.py 2>&1 | tail -15
echo "[batch13] pstable hard-corpus point $(date -u +%H:%M:%S)"
export PSTABLE_CORPUS=hard
export PSTABLE_POINTS="10,3,32768;12,3,32768;10,2,32768"
timeout 5400 python scripts/bench_pstable.py 2>&1 | tail -8
echo "[batch13] done $(date -u +%H:%M:%S)"
