#!/bin/bash
# Batch 69: 1.2M glove regression check (select-policy default change kept
# the boundary shape on approx — verify the measured curve holds).
cd /root/repo
probe() {
  for i in $(seq 1 10); do
    echo "[batch69] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch69] tunnel up"; return 0
    fi
    sleep 120
  done
  return 1
}
probe || exit 1
echo "[batch69] leg 1: bench_large glove $(date -u +%H:%M:%S)"
timeout 5400 python scripts/bench_large.py glove > /tmp/b69_leg1.log 2>&1
echo "[batch69] leg1 rc=$? $(date -u +%H:%M:%S)"
echo "[batch69] done $(date -u +%H:%M:%S)"
