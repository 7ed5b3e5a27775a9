#!/bin/bash
# Batch 45: select_mult dedup + bf16 two-stage tail at deep8m (both knobs
# landed after batch 44 was queued), plus a FULL-LOG rerun of the gsl8
# bisect that batch 44 truncated to its last 20 lines (suspected HBM OOM —
# the buffer-assignment dump head was cut off).
#  leg 1: gsl8 bisect, untruncated, JAX_TRACEBACK_FILTERING=off
#  leg 2: 200k e2e guard for select_mult>=2 and rerank_dtype=bfloat16
#  leg 3: deep8m folded, f32 tail, smult in {2,3} (isolates the dedup win)
#  leg 4: deep8m folded, bf16 tail, smult in {1,2} (combined operating pts)
# Points for legs 3/4 can be adjusted AFTER launch by writing
# /tmp/batch45_points_f32 / /tmp/batch45_points_bf16 (read at leg start).
cd /root/repo

# one TPU client at a time: wait out batch 44
if [ -f /tmp/batch44.pid ]; then
  while kill -0 "$(cat /tmp/batch44.pid)" 2>/dev/null; do
    echo "[batch45] waiting for batch44 $(date -u +%H:%M:%S)"; sleep 120
  done
fi

probe() {
  for i in $(seq 1 60); do
    echo "[batch45] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch45] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch45] leg 1: gsl8 bisect full-log $(date -u +%H:%M:%S)"
export JAX_TRACEBACK_FILTERING=off
export FOLD_WIN=512 FOLD_MCAP=262144 FOLD_REFINE=12288 FOLD_BUDGET=16 FOLD_GSL=8
export BISECT_OUT=results/bisect_fold_gsl8.json
timeout 5400 python scripts/bisect_fold.py
unset FOLD_WIN FOLD_MCAP FOLD_REFINE FOLD_BUDGET FOLD_GSL BISECT_OUT
unset JAX_TRACEBACK_FILTERING

probe
echo "[batch45] leg 2: 200k e2e smult/bf16 guard $(date -u +%H:%M:%S)"
CHECK_FOLD_EXTRA=1 timeout 3600 python scripts/check_coarse_fold.py 2>&1 | tail -14
if [ ${PIPESTATUS[0]} -ne 0 ]; then
  echo "[batch45] ABORT: smult/bf16 e2e guard failed"; exit 1
fi

probe
echo "[batch45] leg 3: deep8m f32 smult A/B $(date -u +%H:%M:%S)"
export DEEP_LAYOUT=folded
export DEEP_OVERFLOW=2000
if [ -f /tmp/batch45_points_f32 ]; then
  export DEEP_POINTS="$(cat /tmp/batch45_points_f32)"
else
  export DEEP_POINTS="1,16,12288,512,262144,0,8,0,1;1,16,12288,512,262144,0,8,0,2;1,16,8192,512,262144,0,8,0,2;1,16,8192,512,262144,0,8,0,3;1,16,16384,512,262144,0,8,0,2"
fi
timeout 10800 python scripts/bench_deep8m_coarse.py 2>&1 | tail -30

probe
echo "[batch45] leg 4: deep8m bf16 tail $(date -u +%H:%M:%S)"
export DEEP_RERANK_DTYPE=bfloat16
if [ -f /tmp/batch45_points_bf16 ]; then
  export DEEP_POINTS="$(cat /tmp/batch45_points_bf16)"
else
  export DEEP_POINTS="1,16,12288,512,262144,0,8,0,1;1,16,12288,512,262144,0,8,0,2;1,16,8192,512,262144,0,8,0,2;1,16,16384,512,262144,0,8,0,2"
fi
timeout 10800 python scripts/bench_deep8m_coarse.py 2>&1 | tail -30

echo "[batch45] done $(date -u +%H:%M:%S)"
