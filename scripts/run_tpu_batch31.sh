#!/bin/bash
# Batch 31 (chained after batch 30):
#   1. argpack direct-select A/B: FLAT_SELECT-style sg=131072 forces the
#      single approx_max_k over the packed [B, NG] output (no two-level
#      select). k=128 at width 131072 is far from approx_max_k's
#      degenerate regime; if the two-level pipeline (sgmax + sort1 +
#      childgather + sort2) is the argpack tail, this collapses it to one
#      fused PartialReduce over the gmax output.
#   2. sparse_1m rf4096 frontier point (full point list re-run so the
#      artifact keeps all operating points; GT + warm fits are cached).
cd /root/repo

for dep in /tmp/batch30.pid /tmp/batch29.pid /tmp/batch28.pid; do
  if [ -f "$dep" ]; then
    while kill -0 "$(cat $dep)" 2>/dev/null; do
      echo "[batch31] waiting for $dep $(date -u +%H:%M:%S)"; sleep 120
    done
  fi
done

probe() {
  for i in $(seq 1 60); do
    echo "[batch31] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch31] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch31] argpack direct-select A/B $(date -u +%H:%M:%S)"
export TUNE_CASES="argpack,128,24,64;argpack,128,24,131072;argpack,512,24,131072;argpack,128,24,128"
timeout 7200 python scripts/tune_argpack.py 2>&1 | tail -8
unset TUNE_CASES

probe
echo "[batch31] sparse_1m rf4096 point $(date -u +%H:%M:%S)"
export SPARSE_POINTS="0,2048;1,2048;1,4096;1,8192"
timeout 7200 python scripts/bench_sparse_1m.py 2>&1 | tail -8
unset SPARSE_POINTS
echo "[batch31] done $(date -u +%H:%M:%S)"
