#!/bin/bash
# Round-3: hard-corpus forest prune sweep, chained after batch22. Two-phase
# pruning halves the Deep-8M chunk (results/bisect_prune.json); on the hard
# corpus it should buy the frontier deeper probing (steps 2-3, budget 32)
# at the old wall. GT is regenerated first (VM restart wiped /tmp).
cd /root/repo
if [ -f /tmp/batch22.pid ]; then
  while kill -0 "$(cat /tmp/batch22.pid)" 2>/dev/null; do sleep 60; done
fi
probe() {
  for i in $(seq 1 60); do
    echo "[batch23] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch23] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch23] hard8m GT regen $(date -u +%H:%M:%S)"
timeout 3600 python - <<'PYEOF' 2>&1 | tail -3
import sys, time
import numpy as np
sys.path.insert(0, ".")
from similaritysearchbyrdf_tpu.ops.exact import exact_search
from similaritysearchbyrdf_tpu.utils.datasets import hard_clustered
x, q = hard_clustered(8_000_000, 96, n_queries=1024, seed=7)
t0 = time.perf_counter()
gt, _ = exact_search(x, q, k=10, exclude_self=False)
np.savez("/tmp/hard8m_gt.npz", gt=gt)
print(f"GT done: {time.perf_counter()-t0:.1f}s")
PYEOF

probe
echo "[batch23] hard8m forest prune sweep $(date -u +%H:%M:%S)"
export DEEP_CORPUS=hard DEEP_OVERFLOW=2000 DEEP_HEAD_POOL=64
export DEEP_POINTS="1,16,12288,512,262144,128;2,16,16384,512,262144,128;2,32,16384,512,524288,192;3,32,16384,512,524288,192;2,16,16384,512,262144"
timeout 10800 python scripts/bench_deep8m_coarse.py 2>&1 | tail -12
unset DEEP_POINTS DEEP_CORPUS DEEP_OVERFLOW DEEP_HEAD_POOL
echo "[batch23] done $(date -u +%H:%M:%S)"
