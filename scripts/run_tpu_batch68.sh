#!/bin/bash
# Batch 68: smoke frontier edges (faster >=0.98 points if any).
cd /root/repo
while kill -0 $(cat /tmp/b67.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
probe() {
  for i in $(seq 1 10); do
    echo "[batch68] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch68] tunnel up"; return 0
    fi
    sleep 120
  done
  return 1
}
probe || exit 1
echo "[batch68] leg 1: smoke frontier edges $(date -u +%H:%M:%S)"
export SMOKE_FITS="lane,32,500"
export SMOKE_POINTS="1024,0,margin,16,384,-1,4096,8,0;1024,0,margin,12,512,-1,4096,8,0;1024,0,margin,16,512,-1,3072,8,0;1024,0,margin,24,512,-1,4096,8,0;1024,1,margin,8,512,-1,4096,8,0"
timeout 3600 python scripts/tune_smoke_forest.py > /tmp/b68_leg1.log 2>&1
echo "[batch68] leg1 rc=$? $(date -u +%H:%M:%S)"
unset SMOKE_FITS SMOKE_POINTS
echo "[batch68] done $(date -u +%H:%M:%S)"
