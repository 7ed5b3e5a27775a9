#!/bin/bash
# Batch 35 (chained after batch 34): measure the qlane gmax kernel (the
# no-transpose lane-reduction variant, commit 34c74f7) in the argpack
# pipeline, alone and stacked with the sort-L2 and sg=32 levers.
cd /root/repo

for dep in /tmp/batch34.pid /tmp/batch33.pid /tmp/batch32.pid /tmp/batch30.pid /tmp/batch29.pid /tmp/batch28.pid; do
  if [ -f "$dep" ]; then
    while kill -0 "$(cat $dep)" 2>/dev/null; do
      echo "[batch35] waiting for $dep $(date -u +%H:%M:%S)"; sleep 120
    done
  fi
done

probe() {
  for i in $(seq 1 60); do
    echo "[batch35] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch35] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch35] qlane gmax sweep $(date -u +%H:%M:%S)"
export TUNE_CASES="argpack,128,24,64,64,approx,1;argpack,128,24,64,64,sort,1;argpack,128,24,32,64,sort,1"
timeout 7200 python scripts/tune_argpack.py 2>&1 | tail -8
unset TUNE_CASES
echo "[batch35] done $(date -u +%H:%M:%S)"
