#!/bin/bash
# Batch 56 (round 4): push the 0.93 frontier past 1574 — rf14336/smult1
# (~0.930 at ~1700?) and budget-20 smult1.
cd /root/repo
if [ -f /tmp/batch55.pid ]; then
  while kill -0 "$(cat /tmp/batch55.pid)" 2>/dev/null; do
    echo "[batch56] waiting for batch55 $(date -u +%H:%M:%S)"; sleep 120
  done
fi
probe() {
  for i in $(seq 1 60); do
    echo "[batch56] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch56] tunnel up"; return 0
    fi
    sleep 120
  done
  echo "[batch56] probe exhausted; aborting" >&2
  return 1
}
probe || exit 1
echo "[batch56] leg 1: deep8m 0.93-frontier points $(date -u +%H:%M:%S)"
export DEEP_LAYOUT=folded DEEP_OVERFLOW=2000
export DEEP_POINTS="1,16,14336,512,262144,0,8,0,1;1,20,12288,512,262144,0,8,0,1;1,16,16384,512,262144,0,8,0,1"
timeout 9000 python scripts/bench_deep8m_coarse.py > /tmp/b56_leg1.log 2>&1
echo "[batch56] leg1 rc=$? $(date -u +%H:%M:%S)"
unset DEEP_POINTS DEEP_LAYOUT DEEP_OVERFLOW
echo "[batch56] done $(date -u +%H:%M:%S)"
