#!/bin/bash
# Serial TPU measurement batch (ONE TPU client at a time — CLAUDE.md):
# probe the tunnel until it answers, then run the flat-engine attribution
# (two-level select + block_b sweep) and the gmax nsub pipeline tuner.
# Results land in results/attrib_flat_r03.json / results/tune_gmax_nsub.json.
cd /root/repo
for i in $(seq 1 40); do
  echo "[batch1] probe attempt $i $(date -u +%H:%M:%S)"
  if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
    echo "[batch1] tunnel up"
    break
  fi
  sleep 180
done
echo "[batch1] attrib_flat_r03 start $(date -u +%H:%M:%S)"
timeout 3600 python scripts/attrib_flat_r03.py 2>&1 | tail -30
echo "[batch1] tune_gmax_nsub start $(date -u +%H:%M:%S)"
timeout 3600 python scripts/tune_gmax_nsub.py 2>&1 | tail -30
echo "[batch1] done $(date -u +%H:%M:%S)"
