#!/bin/bash
# Batch 48 (round 4): first TPU sweep after the tunnel outage.
#  leg 0: wait for the fit-bisect job (launched separately) to finish
#  leg 1: folded-path stage bisect at the SHIPPED deep8m operating point
#         (gsl8/win512/rf12288/budget16) with the fit-time ids128 cache
#         mirrored correctly (advisor r3 fix) — the batch-47 redo
#  leg 2: gmax roofline variants (MXU/VPU floors, i16/i8 trees)
#  leg 3: sparse 1M mid-curve sweep (VERDICT item 7)
#  leg 4: latency curve on glove-1.2M (VERDICT item 5)
cd /root/repo

if [ -f /tmp/run_fitbisect.pid ]; then
  while kill -0 "$(cat /tmp/run_fitbisect.pid)" 2>/dev/null; do
    echo "[batch48] waiting for fit-bisect $(date -u +%H:%M:%S)"; sleep 120
  done
fi

probe() {
  for i in $(seq 1 60); do
    echo "[batch48] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch48] tunnel up"; return 0
    fi
    sleep 120
  done
  echo "[batch48] probe exhausted; aborting" >&2
  return 1
}

probe || exit 1
echo "[batch48] leg 1: bisect_fold shipped point $(date -u +%H:%M:%S)"
export FOLD_WIN=512 FOLD_MCAP=262144 FOLD_REFINE=12288 FOLD_BUDGET=16 FOLD_GSL=8
export BISECT_STAGES="hash,lookup,blocks,kernel,select,idgather,score,full"
export BISECT_OUT=results/bisect_fold_gsl8.json
timeout 5400 python scripts/bisect_fold.py > /tmp/b48_leg1.log 2>&1
echo "[batch48] leg1 rc=$? $(date -u +%H:%M:%S)"
unset FOLD_WIN FOLD_MCAP FOLD_REFINE FOLD_BUDGET FOLD_GSL BISECT_STAGES BISECT_OUT

probe || exit 1
echo "[batch48] leg 2: gmax floor $(date -u +%H:%M:%S)"
timeout 3600 python scripts/tune_gmax_floor.py > /tmp/b48_leg2.log 2>&1
echo "[batch48] leg2 rc=$? $(date -u +%H:%M:%S)"

probe || exit 1
echo "[batch48] leg 3: sparse mid-curve $(date -u +%H:%M:%S)"
export SPARSE_POINTS="0,2048;0,4096;0,6144;0,8192;1,2048;1,3072;1,4096;1,8192"
timeout 7200 python scripts/bench_sparse_1m.py > /tmp/b48_leg3.log 2>&1
echo "[batch48] leg3 rc=$? $(date -u +%H:%M:%S)"
unset SPARSE_POINTS

probe || exit 1
echo "[batch48] leg 4: latency curve glove $(date -u +%H:%M:%S)"
timeout 7200 python scripts/bench_latency.py glove > /tmp/b48_leg4.log 2>&1
echo "[batch48] leg4 rc=$? $(date -u +%H:%M:%S)"

echo "[batch48] done $(date -u +%H:%M:%S)"
