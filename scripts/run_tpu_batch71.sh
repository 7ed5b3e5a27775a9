#!/bin/bash
# Batch 70: deep8m latency re-run (qb128 chunk matches the shipped
# operating point; B>=64 curve was 2.4x below the bench at chunk 64) and
# a hard8m stage2 frontier point.
cd /root/repo
while kill -0 $(cat /tmp/b70.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
# skip if batch 70 actually ran its legs
if [ -s /tmp/b70_leg2.log ]; then echo "[batch71] batch70 completed; nothing to do"; exit 0; fi
probe() {
  for i in $(seq 1 30); do
    echo "[batch71] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch71] tunnel up"; return 0
    fi
    sleep 120
  done
  return 1
}
probe || exit 1
echo "[batch71] leg 1: deep8m latency (qb128) $(date -u +%H:%M:%S)"
timeout 7200 python scripts/bench_latency.py deep8m > /tmp/b71_leg1.log 2>&1
echo "[batch71] leg1 rc=$? $(date -u +%H:%M:%S)"
echo "[batch71] leg 2: hard8m stage2 points $(date -u +%H:%M:%S)"
export DEEP_CORPUS=hard DEEP_LAYOUT=folded DEEP_OVERFLOW=2000 DEEP_QB=128
export DEEP_POINTS="1,16,14336,512,262144,0,8,0,1,4096;1,16,20480,512,262144,0,16,0,1,4096;1,16,14336,512,262144,0,8,0,1,0"
timeout 7200 python scripts/bench_deep8m_coarse.py > /tmp/b71_leg2.log 2>&1
echo "[batch71] leg2 rc=$? $(date -u +%H:%M:%S)"
unset DEEP_CORPUS DEEP_POINTS DEEP_QB DEEP_LAYOUT DEEP_OVERFLOW
echo "[batch71] done $(date -u +%H:%M:%S)"
