#!/bin/bash
# Round-3: two-phase window pruning on TPU (after batch19 finishes).
# bisect first (attribution of phase1 cost + pruned coarse/select), then
# the deep8m coarse sweep with keep points (DEEP_POINTS 6th field).
cd /root/repo
if [ -f /tmp/batch19.pid ]; then
  while kill -0 "$(cat /tmp/batch19.pid)" 2>/dev/null; do sleep 60; done
fi
probe() {
  for i in $(seq 1 60); do
    echo "[batch20] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch20] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch20] bisect_prune (keep=128 of 512 windows) $(date -u +%H:%M:%S)"
DEEP_OVERFLOW=2000 timeout 5400 python scripts/bisect_prune.py 2>&1 | tail -12

probe
echo "[batch20] deep8m coarse prune sweep $(date -u +%H:%M:%S)"
export DEEP_OVERFLOW=2000 DEEP_HEAD_POOL=64
export DEEP_POINTS="1,16,12288,512,262144,128;1,16,12288,512,262144,192;1,16,12288,512,524288,192;1,16,12288,1024,524288,128;1,20,16384,512,524288,256;1,16,12288,512,262144"
timeout 10800 python scripts/bench_deep8m_coarse.py 2>&1 | tail -14
unset DEEP_POINTS DEEP_OVERFLOW DEEP_HEAD_POOL
echo "[batch20] done $(date -u +%H:%M:%S)"
