#!/bin/bash
# Round-3 batch 7 (chained after batch15): Deep-8M window-adjacency stats
# (the data for the DMA run-coalescing kernel design).
cd /root/repo
if [ -f /tmp/batch15.pid ]; then
  while kill -0 "$(cat /tmp/batch15.pid)" 2>/dev/null; do sleep 60; done
fi
for i in $(seq 1 40); do
  echo "[batch16] probe attempt $i $(date -u +%H:%M:%S)"
  if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
    echo "[batch16] tunnel up"; break
  fi
  sleep 180
done
echo "[batch16] analyze_windows start $(date -u +%H:%M:%S)"
timeout 5400 python scripts/analyze_windows.py 2>&1 | tail -12
echo "[batch16] done $(date -u +%H:%M:%S)"
