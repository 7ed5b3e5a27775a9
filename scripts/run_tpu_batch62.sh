#!/bin/bash
# Batch 62 (round 5): stage2 frontier refinement + stage2 bisect + smoke
# bisect + folded smoke retry (grp-floor fix) + gmax narrow-dtype variants.
cd /root/repo
# wait for batch 61 to release the chip
while kill -0 $(cat /tmp/b61.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
probe() {
  for i in $(seq 1 20); do
    echo "[batch62] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch62] tunnel up"; return 0
    fi
    sleep 120
  done
  echo "[batch62] probe exhausted; aborting" >&2
  return 1
}
probe || exit 1

echo "[batch62] leg 1: smoke bisect (margin16 lane) $(date -u +%H:%M:%S)"
timeout 2700 python scripts/bisect_smoke.py > /tmp/b62_leg1.log 2>&1
echo "[batch62] leg1 rc=$? $(date -u +%H:%M:%S)"

echo "[batch62] leg 2: folded smoke retry + stage2 points $(date -u +%H:%M:%S)"
export SMOKE_FITS="folded,16,500;folded,32,500"
export SMOKE_POINTS="1024,0,margin,16,1024,64,4096,8,0;1024,0,margin,16,2048,64,4096,8,0;1024,0,margin,16,2048,64,4096,8,512;1024,0,margin,8,1024,64,4096,8,0;1024,0,reference,8,1024,64,4096,8,0;1024,0,margin,16,1024,64,2048,8,0"
timeout 5400 python scripts/tune_smoke_forest.py > /tmp/b62_leg2.log 2>&1
echo "[batch62] leg2 rc=$? $(date -u +%H:%M:%S)"
unset SMOKE_FITS SMOKE_POINTS

echo "[batch62] leg 3: deep8m stage2 frontier refinement $(date -u +%H:%M:%S)"
export DEEP_LAYOUT=folded DEEP_OVERFLOW=2000 DEEP_QB=128
export DEEP_POINTS="1,16,14336,512,262144,0,8,0,1,5120;1,16,16384,512,262144,0,8,0,1,5120;1,16,18432,512,262144,0,8,0,1,4096;1,16,28672,512,262144,0,8,0,1,8192;1,16,24576,512,262144,0,8,0,1,8192;1,16,16384,512,262144,0,8,0,1,4096"
timeout 7200 python scripts/bench_deep8m_coarse.py > /tmp/b62_leg3.log 2>&1
echo "[batch62] leg3 rc=$? $(date -u +%H:%M:%S)"
unset DEEP_POINTS DEEP_QB DEEP_LAYOUT DEEP_OVERFLOW

echo "[batch62] leg 4: stage2 chunk bisect $(date -u +%H:%M:%S)"
env FOLD_B=128 FOLD_WIN=512 FOLD_MCAP=262144 FOLD_REFINE=14336 FOLD_GSL=8 FOLD_STAGE2=4096 BISECT_OUT=results/bisect_fold_stage2.json timeout 3600 python scripts/bisect_fold.py 8000000 96 > /tmp/b62_leg4.log 2>&1
echo "[batch62] leg4 rc=$? $(date -u +%H:%M:%S)"

echo "[batch62] leg 5: gmax narrow-dtype variants $(date -u +%H:%M:%S)"
env GMAX_VARIANTS=tree_i32,tree_bf16,tree_i16_out32,tree_i16_lateconv timeout 3600 python scripts/tune_gmax_floor.py > /tmp/b62_leg5.log 2>&1
echo "[batch62] leg5 rc=$? $(date -u +%H:%M:%S)"
echo "[batch62] done $(date -u +%H:%M:%S)"
