#!/bin/bash
# Batch 59 (round 4, last): DEEP_QB=128 chunk A/B at the best point.
cd /root/repo
if [ -f /tmp/batch58.pid ]; then
  while kill -0 "$(cat /tmp/batch58.pid)" 2>/dev/null; do
    echo "[batch59] waiting for batch58 $(date -u +%H:%M:%S)"; sleep 120
  done
fi
probe() {
  for i in $(seq 1 60); do
    echo "[batch59] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch59] tunnel up"; return 0
    fi
    sleep 120
  done
  echo "[batch59] probe exhausted; aborting" >&2
  return 1
}
probe || exit 1
echo "[batch59] leg 1: deep8m QB=128 A/B $(date -u +%H:%M:%S)"
export DEEP_LAYOUT=folded DEEP_OVERFLOW=2000 DEEP_QB=128
export DEEP_POINTS="1,16,14336,512,262144,0,8,0,1;1,16,12288,512,262144,0,8,0,1"
timeout 9000 python scripts/bench_deep8m_coarse.py > /tmp/b59_leg1.log 2>&1
echo "[batch59] leg1 rc=$? $(date -u +%H:%M:%S)"
unset DEEP_POINTS DEEP_QB DEEP_LAYOUT DEEP_OVERFLOW
echo "[batch59] done $(date -u +%H:%M:%S)"
