#!/bin/bash
# Batch 54 (round 4): final fill-ins — the in-band sparse point and a
# bench.py confirmation with all landed defaults.
cd /root/repo

if [ -f /tmp/batch53.pid ]; then
  while kill -0 "$(cat /tmp/batch53.pid)" 2>/dev/null; do
    echo "[batch54] waiting for batch53 $(date -u +%H:%M:%S)"; sleep 120
  done
fi

probe() {
  for i in $(seq 1 60); do
    echo "[batch54] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch54] tunnel up"; return 0
    fi
    sleep 120
  done
  echo "[batch54] probe exhausted; aborting" >&2
  return 1
}

probe || exit 1
echo "[batch54] leg 1: sparse in-band point $(date -u +%H:%M:%S)"
export SPARSE_POINTS="0,2048;0,3072;0,3584;0,4096;0,5120;0,6144;1,4096;1,8192"
timeout 7200 python scripts/bench_sparse_1m.py > /tmp/b54_leg1.log 2>&1
echo "[batch54] leg1 rc=$? $(date -u +%H:%M:%S)"
unset SPARSE_POINTS

probe || exit 1
echo "[batch54] leg 2: bench.py confirmation $(date -u +%H:%M:%S)"
timeout 3600 python bench.py > /tmp/b54_leg2.log 2>&1
echo "[batch54] leg2 rc=$? $(date -u +%H:%M:%S)"

echo "[batch54] done $(date -u +%H:%M:%S)"
