#!/bin/bash
# Batch 43: folded groupmax tuning — the batch-42 sweep showed the recall
# ceiling (~0.88) is GROUP-GRANULAR SELECTION, not window coverage: lane
# w1024->w512 at m262144 only moves recall 0.9415->0.9544 (~1pp/halving),
# so folded w2048 should sit ~0.93 from coverage alone, yet measured
# 0.8605 at the same refine — the 64-slot group select is the ~7pp.
#  leg 1: bisect_fold at the measured operating point (w2048, m262144,
#         rf12288, gsl=64) — where do the 890 us/query go?
#  leg 2: gsl in {8,16} x win {512,1024,2048} x refine {8192..16384}:
#         finer selection granularity at the same refine budget; includes
#         the exact lane-frontier structures (w1024/m262144/rf12288 =
#         752 qps @ 0.9415; w512 = 579 @ 0.9544) for apples-to-apples.
cd /root/repo

probe() {
  for i in $(seq 1 60); do
    echo "[batch43] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch43] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch43] leg 0: kernel parity incl. gsl 8/16 shapes $(date -u +%H:%M:%S)"
timeout 1800 python -c "
import sys; sys.path.insert(0, 'scripts')
from check_coarse_fold import check_parity
check_parity()
" 2>&1 | tail -8

echo "[batch43] leg 1: bisect_fold @ w2048 m262144 rf12288 gsl64 $(date -u +%H:%M:%S)"
export FOLD_WIN=2048 FOLD_MCAP=262144 FOLD_REFINE=12288 FOLD_BUDGET=16 FOLD_GSL=64
timeout 5400 python scripts/bisect_fold.py 2>&1 | tail -20
unset FOLD_WIN FOLD_MCAP FOLD_REFINE FOLD_BUDGET FOLD_GSL

probe
echo "[batch43] leg 2: deep8m folded gsl sweep $(date -u +%H:%M:%S)"
export DEEP_LAYOUT=folded
export DEEP_OVERFLOW=2000
export DEEP_POINTS="1,16,12288,1024,262144,0,16,0;1,16,12288,2048,262144,0,16,0;1,16,12288,1024,262144,0,8,0;1,16,8192,2048,262144,0,16,0;1,16,12288,512,262144,0,8,0;1,16,16384,2048,524288,0,16,0;1,16,8192,1024,262144,0,16,0;1,20,12288,2048,262144,0,16,0"
timeout 10800 python scripts/bench_deep8m_coarse.py 2>&1 | tail -30

echo "[batch43] done $(date -u +%H:%M:%S)"
