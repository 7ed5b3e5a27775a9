#!/bin/bash
# Round-3 rerun after the VM restart wiped /tmp (GT caches + batches 19/20
# that never landed). Priority order: prune bisect (no GT dep) -> flat
# re-point both corpora (regens /tmp GT caches, VERDICT item 3) -> deep8m
# coarse two-phase prune sweep (item 5) -> tune_argpack -> sparse exact-GT
# (item 4) -> d784 (item 8) -> deep30m (item 2, longest last).
cd /root/repo
probe() {
  for i in $(seq 1 60); do
    echo "[batch21] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch21] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch21] bisect_prune (keep=128 of 512 windows) $(date -u +%H:%M:%S)"
DEEP_OVERFLOW=2000 timeout 5400 python scripts/bisect_prune.py 2>&1 | tail -14

probe
echo "[batch21] flat re-point both corpora (regens GT) $(date -u +%H:%M:%S)"
timeout 10800 python scripts/bench_flat.py both 2>&1 | tail -8

probe
echo "[batch21] deep8m coarse prune sweep $(date -u +%H:%M:%S)"
export DEEP_OVERFLOW=2000 DEEP_HEAD_POOL=64
export DEEP_POINTS="1,16,12288,512,262144,128;1,16,12288,512,262144,192;1,16,12288,512,524288,192;1,16,12288,1024,524288,128;1,20,16384,512,524288,256;1,16,12288,512,262144"
timeout 10800 python scripts/bench_deep8m_coarse.py 2>&1 | tail -14
unset DEEP_POINTS DEEP_OVERFLOW DEEP_HEAD_POOL

probe
echo "[batch21] tune_argpack rerun $(date -u +%H:%M:%S)"
timeout 5400 python scripts/tune_argpack.py 2>&1 | tail -10

probe
echo "[batch21] attrib_sparse $(date -u +%H:%M:%S)"
timeout 5400 python scripts/attrib_sparse.py 2>&1 | tail -20

probe
echo "[batch21] sparse_1m exact-GT bench $(date -u +%H:%M:%S)"
timeout 7200 python scripts/bench_sparse_1m.py 2>&1 | tail -10

probe
echo "[batch21] d784 $(date -u +%H:%M:%S)"
timeout 7200 python scripts/bench_d784.py 2>&1 | tail -14

probe
echo "[batch21] deep30m $(date -u +%H:%M:%S)"
timeout 10800 python scripts/bench_deep30m.py 2>&1 | tail -20
echo "[batch21] done $(date -u +%H:%M:%S)"
