#!/bin/bash
# Batch 61 (round 5, first): smoke-shape forest sweep (VERDICT item 3),
# deep8m staged-rerank (stage2) sweep (VERDICT item 1), query/build floors
# (VERDICT item 4).
cd /root/repo
probe() {
  for i in $(seq 1 20); do
    echo "[batch61] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch61] tunnel up"; return 0
    fi
    sleep 120
  done
  echo "[batch61] probe exhausted; aborting" >&2
  return 1
}
probe || exit 1
echo "[batch61] leg 1: smoke forest sweep $(date -u +%H:%M:%S)"
timeout 5400 python scripts/tune_smoke_forest.py > /tmp/b61_leg1.log 2>&1
echo "[batch61] leg1 rc=$? $(date -u +%H:%M:%S)"

echo "[batch61] leg 2: deep8m stage2 sweep $(date -u +%H:%M:%S)"
export DEEP_LAYOUT=folded DEEP_OVERFLOW=2000 DEEP_QB=128
# (steps,budget,refine,win,m_cap,keep,gsl,rkeep,smult,stage2)
export DEEP_POINTS="1,16,14336,512,262144,0,8,0,1,0;1,16,14336,512,262144,0,8,0,1,4096;1,16,14336,512,262144,0,8,0,1,6144;1,16,20480,512,262144,0,8,0,1,6144;1,16,24576,512,262144,0,8,0,1,6144;1,16,20480,512,262144,0,8,0,1,4096"
timeout 7200 python scripts/bench_deep8m_coarse.py > /tmp/b61_leg2.log 2>&1
echo "[batch61] leg2 rc=$? $(date -u +%H:%M:%S)"
unset DEEP_POINTS DEEP_QB DEEP_LAYOUT DEEP_OVERFLOW

echo "[batch61] leg 3: query/build floors $(date -u +%H:%M:%S)"
timeout 3600 python scripts/check_smoke_regress.py floors > /tmp/b61_leg3.log 2>&1
echo "[batch61] leg3 rc=$? $(date -u +%H:%M:%S)"
echo "[batch61] done $(date -u +%H:%M:%S)"
