#!/bin/bash
# Batch 36 (chained after batch 35): d784 re-run on the D-aware gmax vmem
# plan (_gmax_tile_plan routes dpad>256 to the transposed-output kernel
# with a 2048-row tile; grouped_vmem_safe_batch subtracts the streamed
# sketch tile from the promoted-output budget). The batch-29 flat leg
# OOMed scoped vmem at 25.27M (14.7 MB double-buffered [8192, 896] sketch
# tile + 9.8 MB promoted [384, 3200] output); the new plan's frame is
# ~12.6 MB. Re-runs all three engines in one process so the artifact's
# points share process state.
cd /root/repo

for dep in /tmp/batch35.pid /tmp/batch34.pid /tmp/batch33.pid; do
  if [ -f "$dep" ]; then
    while kill -0 "$(cat $dep)" 2>/dev/null; do
      echo "[batch36] waiting for $dep $(date -u +%H:%M:%S)"; sleep 120
    done
  fi
done

probe() {
  for i in $(seq 1 60); do
    echo "[batch36] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch36] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch36] d784 rerun (D-aware gmax vmem plan) $(date -u +%H:%M:%S)"
timeout 7200 python scripts/bench_d784.py 2>&1 | tail -12

echo "[batch36] done $(date -u +%H:%M:%S)"
