#!/bin/bash
# Batch 58 (round 4, final): B=1 fallback validation + post-coalescing
# stage bisect at the new best operating point.
cd /root/repo
if [ -f /tmp/batch57.pid ]; then
  while kill -0 "$(cat /tmp/batch57.pid)" 2>/dev/null; do
    echo "[batch58] waiting for batch57 $(date -u +%H:%M:%S)"; sleep 120
  done
fi
probe() {
  for i in $(seq 1 60); do
    echo "[batch58] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch58] tunnel up"; return 0
    fi
    sleep 120
  done
  echo "[batch58] probe exhausted; aborting" >&2
  return 1
}
probe || exit 1
echo "[batch58] leg 1: glove B=1 fallback points $(date -u +%H:%M:%S)"
export LAT_ENGINES=forest,ivf LAT_BATCHES=1
timeout 5400 python scripts/bench_latency.py glove > /tmp/b58_leg1.log 2>&1
echo "[batch58] leg1 rc=$? $(date -u +%H:%M:%S)"
unset LAT_ENGINES LAT_BATCHES

probe || exit 1
echo "[batch58] leg 2: post-coalescing shipped-point bisect $(date -u +%H:%M:%S)"
export FOLD_WIN=512 FOLD_MCAP=262144 FOLD_REFINE=14336 FOLD_BUDGET=16 FOLD_GSL=8
export BISECT_STAGES="hash,lookup,blocks,kernel,select,idgather,score,full"
export BISECT_OUT=results/bisect_fold_gsl8_coalesced.json
timeout 5400 python scripts/bisect_fold.py > /tmp/b58_leg2.log 2>&1
echo "[batch58] leg2 rc=$? $(date -u +%H:%M:%S)"
echo "[batch58] done $(date -u +%H:%M:%S)"
