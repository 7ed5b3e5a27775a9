#!/bin/bash
# Batch 41 (chained after batch 40): land the 45k bar officially and
# validate the emit_sg kernel fix (static lane-slice folding replaces the
# Mosaic-unsupported lane-splitting reshape, batch-39 capture).
#  leg 1: tune_argpack — emit_sg=16 at rf{32,48,128} (fused level-1 tier
#         A/B: expect ~6 ms off the rf32 21 ms wall if it compiles) plus
#         refine-down probes rf{24,16} (recall held 1.000 down to rf32).
#  leg 2: official results/flat.json re-point: deep8m at refine 32
#         (48,641 qps @ recall 1.000 in the batch-39 sweep — VERDICT r2
#         item 3's >=45k @ >=0.986 done-bar, measured in flat.json).
cd /root/repo

for dep in /tmp/batch40.pid; do
  if [ -f "$dep" ]; then
    while kill -0 "$(cat $dep)" 2>/dev/null; do
      echo "[batch41] waiting for $dep $(date -u +%H:%M:%S)"; sleep 120
    done
  fi
done

probe() {
  for i in $(seq 1 60); do
    echo "[batch41] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch41] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch41] emit_sg A/B + refine-down probes $(date -u +%H:%M:%S)"
export JAX_TRACEBACK_FILTERING=off
export TUNE_CASES="argpack,32,24,32,64,sort,1,16;argpack,48,24,32,64,sort,1,16;argpack,128,24,32,64,sort,1,16;argpack,24,24,32,64,sort,1,0;argpack,16,24,32,64,sort,1,0"
timeout 7200 python scripts/tune_argpack.py 2>&1 | tail -40
unset TUNE_CASES JAX_TRACEBACK_FILTERING

probe
echo "[batch41] official flat.json re-point deep8m @ refine 32 $(date -u +%H:%M:%S)"
FLAT_BENCH_REFINE=32 timeout 7200 python scripts/bench_flat.py deep 2>&1 | tail -6

echo "[batch41] done $(date -u +%H:%M:%S)"
