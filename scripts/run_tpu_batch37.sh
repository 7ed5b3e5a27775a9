#!/bin/bash
# Batch 37 (chained after batch 36): measure the fused level-1 tier
# (qlane emit_sg=16 — the kernel emits supergroup maxima while the gmax
# tile is in VMEM, deleting the select's [B, NG] HBM re-read, 3.22 ms of
# the 31.1 ms argpack wall per results/bisect_argpack.json). Stacked with
# the sort-L2 lever, at select_sg 16 (exact fused width) and 32 (folded
# in XLA), plus an in-process unfused control point for a clean A/B.
cd /root/repo

for dep in /tmp/batch36.pid /tmp/batch35.pid /tmp/batch34.pid; do
  if [ -f "$dep" ]; then
    while kill -0 "$(cat $dep)" 2>/dev/null; do
      echo "[batch37] waiting for $dep $(date -u +%H:%M:%S)"; sleep 120
    done
  fi
done

probe() {
  for i in $(seq 1 60); do
    echo "[batch37] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch37] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch37] qlane emit_sg sweep $(date -u +%H:%M:%S)"
export TUNE_CASES="argpack,128,24,32,64,sort,1,0;argpack,128,24,32,64,sort,1,16;argpack,128,24,16,64,sort,1,16;argpack,128,24,32,64,approx,1,16"
timeout 7200 python scripts/tune_argpack.py 2>&1 | tail -8
unset TUNE_CASES

echo "[batch37] done $(date -u +%H:%M:%S)"
