#!/bin/bash
# Round-3 batch 8 (chained after batch16): argpack pipeline bisect.
cd /root/repo
if [ -f /tmp/batch16.pid ]; then
  while kill -0 "$(cat /tmp/batch16.pid)" 2>/dev/null; do sleep 60; done
fi
for i in $(seq 1 40); do
  echo "[batch17] probe attempt $i $(date -u +%H:%M:%S)"
  if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
    echo "[batch17] tunnel up"; break
  fi
  sleep 180
done
echo "[batch17] bisect_argpack start $(date -u +%H:%M:%S)"
timeout 5400 python scripts/bisect_argpack.py 2>&1 | tail -20
echo "[batch17] done $(date -u +%H:%M:%S)"
