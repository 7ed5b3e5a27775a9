#!/bin/bash
# Batch 47: stage bisect of the folded pipeline AT THE SHIPPED OPERATING
# POINT (gsl8/win512/mcap262144/rf12288/budget16) — batch 45 leg 1 OOM'd
# on the old narrow-reshape idgather model; the bisect now mirrors the
# landed packed-select + lane-full row fetch (commit 556b32f).
# Chained behind batch 46 (one TPU client at a time).
cd /root/repo

if [ -f /tmp/batch46.pid ]; then
  while kill -0 "$(cat /tmp/batch46.pid)" 2>/dev/null; do
    echo "[batch47] waiting for batch46 $(date -u +%H:%M:%S)"; sleep 120
  done
fi

probe() {
  for i in $(seq 1 40); do
    echo "[batch47] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch47] tunnel up"; return 0
    fi
    sleep 120
  done
  echo "probe exhausted; aborting leg" >&2
  return 1
}
probe || exit 1

echo "[batch47] gsl8 shipped-point bisect $(date -u +%H:%M:%S)"
export FOLD_WIN=512 FOLD_MCAP=262144 FOLD_REFINE=12288 FOLD_BUDGET=16 FOLD_GSL=8
export BISECT_STAGES="hash,lookup,kernel,select,idgather,score,full"
export BISECT_OUT=results/bisect_fold_gsl8.json
timeout 5400 python scripts/bisect_fold.py 2>&1 | tail -20
echo "[batch47] done $(date -u +%H:%M:%S)"
