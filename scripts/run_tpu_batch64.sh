#!/bin/bash
# Batch 64 (round 5): gsl16/32 x stage2 synergy on deep8m (stage2 makes
# coarser selection groups acceptable: the slot rescore sees every slot
# of a selected group, so group-argmax granularity only gates group
# choice — while idgather/select costs halve with gsl).
cd /root/repo
while kill -0 $(cat /tmp/b63.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
probe() {
  for i in $(seq 1 20); do
    echo "[batch64] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch64] tunnel up"; return 0
    fi
    sleep 120
  done
  return 1
}
probe || exit 1
echo "[batch64] leg 1: deep8m gsl16/32 stage2 $(date -u +%H:%M:%S)"
export DEEP_LAYOUT=folded DEEP_OVERFLOW=2000 DEEP_QB=128
export DEEP_POINTS="1,16,16384,512,262144,0,16,0,1,4096;1,16,20480,512,262144,0,16,0,1,4096;1,16,16384,512,262144,0,16,0,1,5120;1,16,24576,512,262144,0,16,0,1,6144;1,16,16384,512,262144,0,32,0,1,4096;1,16,28672,512,262144,0,16,0,1,8192"
timeout 7200 python scripts/bench_deep8m_coarse.py > /tmp/b64_leg1.log 2>&1
echo "[batch64] leg1 rc=$? $(date -u +%H:%M:%S)"
unset DEEP_POINTS DEEP_QB DEEP_LAYOUT DEEP_OVERFLOW
echo "[batch64] done $(date -u +%H:%M:%S)"
