#!/bin/bash
# Round-3 batch 3 (chained after batch11): sparse forest stage attribution.
cd /root/repo
if [ -f /tmp/batch11.pid ]; then
  while kill -0 "$(cat /tmp/batch11.pid)" 2>/dev/null; do sleep 60; done
fi
for i in $(seq 1 40); do
  echo "[batch12] probe attempt $i $(date -u +%H:%M:%S)"
  if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
    echo "[batch12] tunnel up"; break
  fi
  sleep 180
done
echo "[batch12] attrib_sparse start $(date -u +%H:%M:%S)"
timeout 5400 python scripts/attrib_sparse.py 2>&1 | tail -25
echo "[batch12] done $(date -u +%H:%M:%S)"
