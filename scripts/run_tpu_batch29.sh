#!/bin/bash
# Batch 29 (chained after batch 28): rerun the d784 leg. Batch 28's attempt
# died at the flat engine's COMPILE — XLA VMEM-promoted the gmax kernel's
# full [B=1024, NG=3200] output (25.4 MB > the 16 MB scoped limit). Fixed
# by grouped_vmem_safe_batch (caps the query chunk at small NG); this rerun
# exercises the fix on hardware.
cd /root/repo

for dep in /tmp/batch28.pid; do
  if [ -f "$dep" ]; then
    while kill -0 "$(cat $dep)" 2>/dev/null; do
      echo "[batch29] waiting for $dep $(date -u +%H:%M:%S)"; sleep 120
    done
  fi
done

probe() {
  for i in $(seq 1 60); do
    echo "[batch29] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch29] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch29] d784 rerun (vmem-guard fix) $(date -u +%H:%M:%S)"
timeout 7200 python scripts/bench_d784.py 2>&1 | tail -14
echo "[batch29] done $(date -u +%H:%M:%S)"
