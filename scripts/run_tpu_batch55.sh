#!/bin/bash
# Batch 55 (round 4): deep8m IVF latency, second retry (flat arrays now
# gated off in ivf-only mode).
cd /root/repo
if [ -f /tmp/batch54.pid ]; then
  while kill -0 "$(cat /tmp/batch54.pid)" 2>/dev/null; do
    echo "[batch55] waiting for batch54 $(date -u +%H:%M:%S)"; sleep 120
  done
fi
probe() {
  for i in $(seq 1 60); do
    echo "[batch55] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch55] tunnel up"; return 0
    fi
    sleep 120
  done
  echo "[batch55] probe exhausted; aborting" >&2
  return 1
}
probe || exit 1
echo "[batch55] leg 1: deep8m ivf latency retry2 $(date -u +%H:%M:%S)"
export LAT_ENGINES=ivf
timeout 7200 python scripts/bench_latency.py deep8m > /tmp/b55_leg1.log 2>&1
echo "[batch55] leg1 rc=$? $(date -u +%H:%M:%S)"
unset LAT_ENGINES
echo "[batch55] done $(date -u +%H:%M:%S)"
