#!/bin/bash
# Round-3 continuation batch (after the driver restart wiped /tmp: GT
# caches and the batch18 legs that had not yet committed artifacts).
# Order: flat deep8m re-point (regenerates /tmp/deep8m_gt.npz, measures
# the post-bisect argpack auto mode) -> tune_argpack rerun -> deep8m
# coarse coalesced re-point (VERDICT item 5) -> d784 -> attrib_sparse +
# sparse_1m exact-GT -> deep30m (longest last).
cd /root/repo
probe() {
  for i in $(seq 1 60); do
    echo "[batch19] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch19] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch19] flat re-point both corpora (regens GT) $(date -u +%H:%M:%S)"
timeout 10800 python scripts/bench_flat.py both 2>&1 | tail -8

probe
echo "[batch19] tune_argpack rerun (post-bisect code) $(date -u +%H:%M:%S)"
timeout 5400 python scripts/tune_argpack.py 2>&1 | tail -10

probe
echo "[batch19] deep8m coarse coalesced re-point $(date -u +%H:%M:%S)"
export DEEP_OVERFLOW=2000
export DEEP_POINTS="1,12,8192,1024,262144;1,16,12288,1024,262144;1,16,12288,512,262144;1,20,16384,1024,524288;1,16,12288,2048,524288"
timeout 7200 python scripts/bench_deep8m_coarse.py 2>&1 | tail -12
unset DEEP_POINTS DEEP_OVERFLOW

probe
echo "[batch19] d784 $(date -u +%H:%M:%S)"
timeout 7200 python scripts/bench_d784.py 2>&1 | tail -14

probe
echo "[batch19] attrib_sparse $(date -u +%H:%M:%S)"
timeout 5400 python scripts/attrib_sparse.py 2>&1 | tail -20

probe
echo "[batch19] sparse_1m exact-GT bench $(date -u +%H:%M:%S)"
timeout 7200 python scripts/bench_sparse_1m.py 2>&1 | tail -10

probe
echo "[batch19] deep30m $(date -u +%H:%M:%S)"
timeout 10800 python scripts/bench_deep30m.py 2>&1 | tail -20
echo "[batch19] done $(date -u +%H:%M:%S)"
