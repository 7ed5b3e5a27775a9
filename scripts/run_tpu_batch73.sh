#!/bin/bash
# Batch 73 (final): budget-12 high-recall stage2 points.
cd /root/repo
probe() {
  for i in $(seq 1 5); do
    echo "[batch73] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch73] tunnel up"; return 0
    fi
    sleep 60
  done
  return 1
}
probe || exit 1
export DEEP_LAYOUT=folded DEEP_OVERFLOW=2000 DEEP_QB=128
export DEEP_POINTS="1,12,24576,512,262144,0,16,0,1,6144;1,12,28672,512,262144,0,16,0,1,8192"
timeout 3300 python scripts/bench_deep8m_coarse.py > /tmp/b73_leg1.log 2>&1
echo "[batch73] leg1 rc=$? $(date -u +%H:%M:%S)"
echo "[batch73] done $(date -u +%H:%M:%S)"
