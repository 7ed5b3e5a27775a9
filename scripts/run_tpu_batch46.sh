#!/bin/bash
# Batch 46: deep8m folded re-points on the single-operand packed sorts
# (select + dedup) and the fit-time ids128 cache (commit 1afad97).
# f32 exact tail (batch 45 measured bf16 a wash: gathers are per-op bound).
#  leg 1: deep8m folded gsl8/win512 — smult {1,2} at rf12288 (the 0.93
#         operating point), budget-12 A/B, rf16384 high-recall point.
# Baselines to beat (batch 45): smult1 1309@0.928, smult2 1153@0.9305,
# rf16384/smult2 999@0.9425.
cd /root/repo

probe() {
  for i in $(seq 1 40); do
    echo "[batch46] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch46] tunnel up"; return 0
    fi
    sleep 120
  done
  echo "probe exhausted; aborting leg" >&2
  return 1
}
probe || exit 1

echo "[batch46] leg 1: deep8m folded packed-sort re-points $(date -u +%H:%M:%S)"
export DEEP_LAYOUT=folded
export DEEP_OVERFLOW=2000
export DEEP_POINTS="1,16,12288,512,262144,0,8,0,1;1,16,12288,512,262144,0,8,0,2;1,12,12288,512,262144,0,8,0,2;1,16,16384,512,262144,0,8,0,2"
timeout 7200 python scripts/bench_deep8m_coarse.py 2>&1 | tail -40

echo "[batch46] done $(date -u +%H:%M:%S)"
