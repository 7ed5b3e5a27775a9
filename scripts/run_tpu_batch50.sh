#!/bin/bash
# Batch 50 (round 4): slot-level rerank points + capstone shard leg +
# deep8m latency + flat roofline attribution.
#  leg 1: deep8m folded rows_keep {1,2} at gsl8 — the exact-stage attack
#         (results/bisect_fold_gsl8.json: exact rerank = 60% of chunk):
#         rk2 reranks top-2 slots/group (4x group coverage per refine),
#         rk1 argmax-only (8x coverage)
#  leg 2: deep100m capstone shard leg (6.25M hard rows, IVF sweep) + compose
#  leg 3: latency curve deep8m
#  leg 4: attrib_flat_r05 (per-stage roofline fields)
cd /root/repo

if [ -f /tmp/batch49.pid ]; then
  while kill -0 "$(cat /tmp/batch49.pid)" 2>/dev/null; do
    echo "[batch50] waiting for batch49 $(date -u +%H:%M:%S)"; sleep 120
  done
fi

probe() {
  for i in $(seq 1 60); do
    echo "[batch50] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch50] tunnel up"; return 0
    fi
    sleep 120
  done
  echo "[batch50] probe exhausted; aborting" >&2
  return 1
}

probe || exit 1
echo "[batch50] leg 1: deep8m folded slot-keep points $(date -u +%H:%M:%S)"
export DEEP_LAYOUT=folded DEEP_OVERFLOW=2000 FOLD_MAX_RUN=8
export DEEP_POINTS="1,16,8192,512,262144,0,8,2,1;1,16,12288,512,262144,0,8,2,1;1,16,16384,512,262144,0,8,2,1;1,16,12288,512,262144,0,8,1,1;1,16,24576,512,262144,0,8,1,1"
timeout 9000 python scripts/bench_deep8m_coarse.py > /tmp/b50_leg1.log 2>&1
echo "[batch50] leg1 rc=$? $(date -u +%H:%M:%S)"
unset DEEP_POINTS FOLD_MAX_RUN DEEP_LAYOUT DEEP_OVERFLOW

probe || exit 1
echo "[batch50] leg 2: deep100m shard leg $(date -u +%H:%M:%S)"
timeout 7200 python scripts/deep100m_capstone.py shard_leg > /tmp/b50_leg2.log 2>&1
echo "[batch50] leg2 rc=$? $(date -u +%H:%M:%S)"
python scripts/deep100m_capstone.py compose >> /tmp/b50_leg2.log 2>&1

probe || exit 1
echo "[batch50] leg 3: latency curve deep8m $(date -u +%H:%M:%S)"
timeout 9000 python scripts/bench_latency.py deep8m > /tmp/b50_leg3.log 2>&1
echo "[batch50] leg3 rc=$? $(date -u +%H:%M:%S)"

probe || exit 1
echo "[batch50] leg 4: attrib_flat_r05 $(date -u +%H:%M:%S)"
timeout 5400 python scripts/attrib_flat_r05.py > /tmp/b50_leg4.log 2>&1
echo "[batch50] leg4 rc=$? $(date -u +%H:%M:%S)"

echo "[batch50] done $(date -u +%H:%M:%S)"
