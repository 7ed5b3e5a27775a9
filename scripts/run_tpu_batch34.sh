#!/bin/bash
# Batch 34 (chained after batch 33): deep8m-only flat re-point in a fresh
# process. The batch-28 "both" run measured deep8m grouped at 19,045 qps —
# 38% below batch-24's 29.1k on near-identical code — with two glove fits,
# a glove query pass, and an 8 GB scan-mode score tile allocated in-process
# beforehand (the documented HBM-allocator process-state effect). GT is
# cached; this run isolates the deep8m point.
cd /root/repo

for dep in /tmp/batch33.pid /tmp/batch32.pid /tmp/batch30.pid /tmp/batch29.pid /tmp/batch28.pid; do
  if [ -f "$dep" ]; then
    while kill -0 "$(cat $dep)" 2>/dev/null; do
      echo "[batch34] waiting for $dep $(date -u +%H:%M:%S)"; sleep 120
    done
  fi
done

probe() {
  for i in $(seq 1 60); do
    echo "[batch34] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch34] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch34] deep8m-only flat re-point $(date -u +%H:%M:%S)"
timeout 7200 python scripts/bench_flat.py deep 2>&1 | tail -6
echo "[batch34] done $(date -u +%H:%M:%S)"
