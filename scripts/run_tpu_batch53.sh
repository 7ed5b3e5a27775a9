#!/bin/bash
# Batch 53 (round 4): deep8m IVF-only latency retry (the crashed engine).
cd /root/repo

if [ -f /tmp/batch52.pid ]; then
  while kill -0 "$(cat /tmp/batch52.pid)" 2>/dev/null; do
    echo "[batch53] waiting for batch52 $(date -u +%H:%M:%S)"; sleep 120
  done
fi

probe() {
  for i in $(seq 1 60); do
    echo "[batch53] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch53] tunnel up"; return 0
    fi
    sleep 120
  done
  echo "[batch53] probe exhausted; aborting" >&2
  return 1
}

probe || exit 1
echo "[batch53] leg 1: deep8m ivf latency $(date -u +%H:%M:%S)"
export LAT_ENGINES=ivf
timeout 7200 python scripts/bench_latency.py deep8m > /tmp/b53_leg1.log 2>&1
echo "[batch53] leg1 rc=$? $(date -u +%H:%M:%S)"
unset LAT_ENGINES

echo "[batch53] done $(date -u +%H:%M:%S)"
