#!/bin/bash
# Batch 51 (round 4): follow-ups on the coalescing win.
#  leg 1: deep8m folded, DEEP_OVERFLOW=4000 + FOLD_MAX_RUN=16 — longer
#         bucket ranges make 8-window runs (win512), halving descriptors
#         again at a superset candidate contract; plus the best batch-50
#         slot-keep point re-run at overflow 4000
#  leg 2: sparse mid-curve: the missing 0.85-0.93 band point (steps0
#         rf3072, rf5120)
#  leg 3: check_smoke_regress build floor + full points (driver guard)
cd /root/repo

if [ -f /tmp/batch50.pid ]; then
  while kill -0 "$(cat /tmp/batch50.pid)" 2>/dev/null; do
    echo "[batch51] waiting for batch50 $(date -u +%H:%M:%S)"; sleep 120
  done
fi

probe() {
  for i in $(seq 1 60); do
    echo "[batch51] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch51] tunnel up"; return 0
    fi
    sleep 120
  done
  echo "[batch51] probe exhausted; aborting" >&2
  return 1
}

probe || exit 1
echo "[batch51] leg 1: deep8m overflow-4000 max_run16 $(date -u +%H:%M:%S)"
export DEEP_LAYOUT=folded DEEP_OVERFLOW=4000 FOLD_MAX_RUN=16
export DEEP_POINTS="1,16,12288,512,262144,0,8,0,1;1,16,12288,512,262144,0,8,0,2;1,16,16384,512,262144,0,8,0,2"
timeout 9000 python scripts/bench_deep8m_coarse.py > /tmp/b51_leg1.log 2>&1
echo "[batch51] leg1 rc=$? $(date -u +%H:%M:%S)"
unset DEEP_POINTS FOLD_MAX_RUN DEEP_LAYOUT DEEP_OVERFLOW

probe || exit 1
echo "[batch51] leg 2: sparse band points $(date -u +%H:%M:%S)"
export SPARSE_POINTS="0,2048;0,3072;0,4096;0,5120;0,6144;1,4096;1,8192"
timeout 7200 python scripts/bench_sparse_1m.py > /tmp/b51_leg2.log 2>&1
echo "[batch51] leg2 rc=$? $(date -u +%H:%M:%S)"
unset SPARSE_POINTS

probe || exit 1
echo "[batch51] leg 3: smoke regress + build floor $(date -u +%H:%M:%S)"
timeout 3600 python scripts/check_smoke_regress.py > /tmp/b51_leg3.log 2>&1
echo "[batch51] leg3 rc=$? $(date -u +%H:%M:%S)"

echo "[batch51] done $(date -u +%H:%M:%S)"
