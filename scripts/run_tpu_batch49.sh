#!/bin/bash
# Batch 49 (round 4): driver-bench validation + deep8m folded re-points.
#  leg 1: bench.py — validates the device-resident steady-state build
#         metric (expect build_vectors_per_sec >> 59k) at unchanged
#         qps/recall
#  leg 2: deep8m folded, FOLD_MAX_RUN=8 (run-coalesced fold DMA) at the
#         shipped operating points — A/B vs r3's max_run=1 numbers
#         (1287@0.928 smult1, 1139@0.9305 smult2)
#  leg 3: deep8m folded, win1024 at matched slots (descriptor halving)
#         + smult3/rf8192 (dedup-widened refine)
# Chained behind batch 48 (one TPU client at a time).
cd /root/repo

if [ -f /tmp/batch48.pid ]; then
  while kill -0 "$(cat /tmp/batch48.pid)" 2>/dev/null; do
    echo "[batch49] waiting for batch48 $(date -u +%H:%M:%S)"; sleep 120
  done
fi

probe() {
  for i in $(seq 1 60); do
    echo "[batch49] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch49] tunnel up"; return 0
    fi
    sleep 120
  done
  echo "[batch49] probe exhausted; aborting" >&2
  return 1
}

probe || exit 1
echo "[batch49] leg 1: bench.py $(date -u +%H:%M:%S)"
timeout 3600 python bench.py > /tmp/b49_leg1.log 2>&1
echo "[batch49] leg1 rc=$? $(date -u +%H:%M:%S)"

probe || exit 1
echo "[batch49] leg 2: deep8m folded max_run=8 A/B $(date -u +%H:%M:%S)"
export DEEP_LAYOUT=folded DEEP_OVERFLOW=2000 FOLD_MAX_RUN=8
export DEEP_POINTS="1,16,12288,512,262144,0,8,0,1;1,16,12288,512,262144,0,8,0,2;1,16,16384,512,262144,0,8,0,2"
timeout 7200 python scripts/bench_deep8m_coarse.py > /tmp/b49_leg2.log 2>&1
echo "[batch49] leg2 rc=$? $(date -u +%H:%M:%S)"
unset DEEP_POINTS

probe || exit 1
echo "[batch49] leg 3: deep8m folded win1024 + smult3 $(date -u +%H:%M:%S)"
export DEEP_POINTS="1,16,12288,1024,262144,0,8,0,2;1,16,16384,1024,393216,0,8,0,2;1,16,8192,512,262144,0,8,0,3"
timeout 7200 python scripts/bench_deep8m_coarse.py > /tmp/b49_leg3.log 2>&1
echo "[batch49] leg3 rc=$? $(date -u +%H:%M:%S)"
unset DEEP_POINTS FOLD_MAX_RUN DEEP_LAYOUT DEEP_OVERFLOW

echo "[batch49] done $(date -u +%H:%M:%S)"
