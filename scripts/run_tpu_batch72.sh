#!/bin/bash
# Batch 72: probe-budget-12 x stage2 on deep8m — descriptors/lookup scale
# with probed ranges, and budget 20 already measured WORSE recall than 16
# at fixed m_cap (truncation), so the frontier may sit below 16.
cd /root/repo
probe() {
  for i in $(seq 1 15); do
    echo "[batch72] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch72] tunnel up"; return 0
    fi
    sleep 120
  done
  return 1
}
probe || exit 1
echo "[batch72] leg 1: deep8m budget-12 stage2 $(date -u +%H:%M:%S)"
export DEEP_LAYOUT=folded DEEP_OVERFLOW=2000 DEEP_QB=128
export DEEP_POINTS="1,12,14336,512,262144,0,8,0,1,4096;1,12,16384,512,262144,0,8,0,1,4096;1,12,20480,512,262144,0,16,0,1,4096;1,14,16384,512,262144,0,8,0,1,4096"
timeout 7200 python scripts/bench_deep8m_coarse.py > /tmp/b72_leg1.log 2>&1
echo "[batch72] leg1 rc=$? $(date -u +%H:%M:%S)"
unset DEEP_POINTS DEEP_QB DEEP_LAYOUT DEEP_OVERFLOW
echo "[batch72] done $(date -u +%H:%M:%S)"
