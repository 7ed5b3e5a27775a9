#!/bin/bash
# Round-3 consolidated rerun: the VM restart killed batches 21-23 before
# their legs landed. Priority order (highest-value VERDICT items first):
#   1. flat re-point both corpora (item 3; regens /tmp GT incl. deep8m_gt)
#   2. deep8m forest two-phase-prune sweep at B=256 (item 5; bisect_prune
#      measured 123 -> 66.7 ms per 64-query chunk — the bench points that
#      prove it at the operating level never landed)
#   3. hard-corpus forest prune sweep (binding-recall frontier, item 1;
#      GT regen first — /tmp was wiped)
#   4. sparse_1m exact-GT bench (item 4)
#   5. d784 (item 8)
#   6. deep30m (item 2, longest last)
cd /root/repo
probe() {
  for i in $(seq 1 60); do
    echo "[batch24] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch24] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch24] flat re-point both corpora (regens GT) $(date -u +%H:%M:%S)"
timeout 10800 python scripts/bench_flat.py both 2>&1 | tail -8

probe
echo "[batch24] deep8m coarse prune sweep, B=256 $(date -u +%H:%M:%S)"
export DEEP_OVERFLOW=2000 DEEP_HEAD_POOL=64 DEEP_QB=256
# keep sweep at the 512-window point (phase-1 costs 4.4 ms of 66.7 —
# dropping keep is nearly free until recall pays); refine=8192 rides the
# strided-tournament select with a halved idgather/exact tail.
export DEEP_POINTS="1,16,8192,512,262144,96;1,16,8192,512,262144,128;1,16,12288,512,262144,128;1,16,12288,512,262144,192;1,16,12288,512,524288,192;1,16,12288,512,262144"
timeout 10800 python scripts/bench_deep8m_coarse.py 2>&1 | tail -10
unset DEEP_POINTS DEEP_QB

probe
echo "[batch24] hard8m GT regen $(date -u +%H:%M:%S)"
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
echo "[batch24] hard8m forest prune sweep $(date -u +%H:%M:%S)"
export DEEP_CORPUS=hard DEEP_QB=256
export DEEP_POINTS="1,16,12288,512,262144,128;2,16,16384,512,262144,128;2,32,16384,512,524288,192;3,32,16384,512,524288,192;2,16,16384,512,262144"
timeout 10800 python scripts/bench_deep8m_coarse.py 2>&1 | tail -12
unset DEEP_POINTS DEEP_CORPUS DEEP_OVERFLOW DEEP_HEAD_POOL DEEP_QB

probe
echo "[batch24] sparse_1m exact-GT bench $(date -u +%H:%M:%S)"
timeout 7200 python scripts/bench_sparse_1m.py 2>&1 | tail -10

probe
echo "[batch24] d784 $(date -u +%H:%M:%S)"
timeout 7200 python scripts/bench_d784.py 2>&1 | tail -14

probe
echo "[batch24] deep30m $(date -u +%H:%M:%S)"
timeout 10800 python scripts/bench_deep30m.py 2>&1 | tail -20
echo "[batch24] done $(date -u +%H:%M:%S)"
