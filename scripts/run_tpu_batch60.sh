#!/bin/bash
# Batch 60 (round 4, final): complete the QB=128 frontier at high recall.
cd /root/repo
probe() {
  for i in $(seq 1 20); do
    echo "[batch60] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch60] tunnel up"; return 0
    fi
    sleep 120
  done
  echo "[batch60] probe exhausted; aborting" >&2
  return 1
}
probe || exit 1
echo "[batch60] leg 1: deep8m QB=128 high-recall points $(date -u +%H:%M:%S)"
export DEEP_LAYOUT=folded DEEP_OVERFLOW=2000 DEEP_QB=128
export DEEP_POINTS="1,16,16384,512,262144,0,8,0,1;1,16,15360,512,262144,0,8,0,1"
timeout 5400 python scripts/bench_deep8m_coarse.py > /tmp/b60_leg1.log 2>&1
echo "[batch60] leg1 rc=$? $(date -u +%H:%M:%S)"
unset DEEP_POINTS DEEP_QB DEEP_LAYOUT DEEP_OVERFLOW
echo "[batch60] done $(date -u +%H:%M:%S)"
