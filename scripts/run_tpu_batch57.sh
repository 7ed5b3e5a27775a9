#!/bin/bash
# Batch 57 (round 4): ivf deep8m latency, streamed build (third attempt).
cd /root/repo
if [ -f /tmp/batch56.pid ]; then
  while kill -0 "$(cat /tmp/batch56.pid)" 2>/dev/null; do
    echo "[batch57] waiting for batch56 $(date -u +%H:%M:%S)"; sleep 120
  done
fi
probe() {
  for i in $(seq 1 60); do
    echo "[batch57] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch57] tunnel up"; return 0
    fi
    sleep 120
  done
  echo "[batch57] probe exhausted; aborting" >&2
  return 1
}
probe || exit 1
echo "[batch57] leg 1: deep8m ivf latency streamed $(date -u +%H:%M:%S)"
export LAT_ENGINES=ivf
timeout 7200 python scripts/bench_latency.py deep8m > /tmp/b57_leg1.log 2>&1
echo "[batch57] leg1 rc=$? $(date -u +%H:%M:%S)"
unset LAT_ENGINES
echo "[batch57] done $(date -u +%H:%M:%S)"
