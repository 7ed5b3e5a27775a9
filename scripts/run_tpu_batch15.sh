#!/bin/bash
# Round-3 batch 6 (chained after batch14): D=784 point (all three engines).
cd /root/repo
if [ -f /tmp/batch14.pid ]; then
  while kill -0 "$(cat /tmp/batch14.pid)" 2>/dev/null; do sleep 60; done
fi
for i in $(seq 1 40); do
  echo "[batch15] probe attempt $i $(date -u +%H:%M:%S)"
  if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
    echo "[batch15] tunnel up"; break
  fi
  sleep 180
done
echo "[batch15] d784 start $(date -u +%H:%M:%S)"
timeout 7200 python scripts/bench_d784.py 2>&1 | tail -20
echo "[batch15] done $(date -u +%H:%M:%S)"
