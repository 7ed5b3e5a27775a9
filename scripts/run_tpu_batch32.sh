#!/bin/bash
# Batch 32 (replaces batch 31; chained after batch 30): act on the argpack
# bisect (results/bisect_argpack.json — rf128 wall 31.1 ms: gmax 14.05,
# sgmax 3.22, sort1 0.49, childgather 3.58, sort2 7.41, refine 2.34).
#   1. select_sg sweep: sg 16/32 shrink the childgather ([B, rg, sg]) and
#      the sort2 approx_max_k width (rg*sg) together — a pure parameter
#      sweep. One sg=131072 point records the direct single-approx branch
#      (predicted much worse: approx_max_k is compute-bound, ~0.9 us/k
#      elements, so [B, 131072] costs ~16x sort2's [B, 8192]).
#   2. sparse_1m rf4096 frontier point (full point list re-run so the
#      artifact keeps all operating points; GT cached).
cd /root/repo

for dep in /tmp/batch30.pid /tmp/batch29.pid /tmp/batch28.pid; do
  if [ -f "$dep" ]; then
    while kill -0 "$(cat $dep)" 2>/dev/null; do
      echo "[batch32] waiting for $dep $(date -u +%H:%M:%S)"; sleep 120
    done
  fi
done

probe() {
  for i in $(seq 1 60); do
    echo "[batch32] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch32] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch32] argpack select_sg sweep $(date -u +%H:%M:%S)"
export TUNE_CASES="argpack,128,24,64;argpack,128,24,32;argpack,128,24,16;argpack,512,24,32;argpack,128,24,131072"
timeout 7200 python scripts/tune_argpack.py 2>&1 | tail -8
unset TUNE_CASES

probe
echo "[batch32] sparse_1m rf4096 point $(date -u +%H:%M:%S)"
export SPARSE_POINTS="0,2048;1,2048;1,4096;1,8192"
timeout 7200 python scripts/bench_sparse_1m.py 2>&1 | tail -8
unset SPARSE_POINTS
echo "[batch32] done $(date -u +%H:%M:%S)"
