#!/bin/bash
# Round-3 batch 4 (chained after batch12): tiered 16-generation scale bench
# + pStable ceiling sweep (easy corpus grid, then one hard-corpus config).
cd /root/repo
if [ -f /tmp/batch12.pid ]; then
  while kill -0 "$(cat /tmp/batch12.pid)" 2>/dev/null; do sleep 60; done
fi
for i in $(seq 1 40); do
  echo "[batch13] probe attempt $i $(date -u +%H:%M:%S)"
  if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
    echo "[batch13] tunnel up"; break
  fi
  sleep 180
done
echo "[batch13] on-TPU coalesced-kernel parity gate $(date -u +%H:%M:%S)"
# the run-coalescing default changed — prove on-chip exactness before any
# bench that depends on it (batch14 deep30m runs IVF through this kernel)
timeout 1800 python scripts/check_pallas_coarse.py 2>&1 | tail -4
timeout 1800 python - <<'PYEOF' 2>&1 | tail -3
import sys, numpy as np, jax, jax.numpy as jnp
sys.path.insert(0, ".")
from similaritysearchbyrdf_tpu.ops.ivf import build_ivf, ivf_topk, ivf_window_budget
rng = np.random.default_rng(0)
n, d, nq = 200_000, 96, 256
x = rng.normal(size=(n, d)).astype(np.float32)
x /= np.linalg.norm(x, axis=1, keepdims=True)
st = build_ivf(x, np.arange(n, dtype=np.int32), target_cluster=256, iters=3)
qd = jnp.asarray(x[:nq]); qids = jnp.arange(nq, dtype=jnp.int32)
wb = ivf_window_budget(st.starts, st.ends, 8, 64)
a = (st.sketch, st.corpus, st.row_ids, st.centroids, st.starts, st.ends, qd, qids, 10)
kw = dict(nprobe=8, win=64, wb=wb, refine=256)
i1, s1 = ivf_topk(*a, **kw, use_pallas=True)
i2, s2 = ivf_topk(*a, **kw, use_pallas=False)
np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
print("IVF coalesced pallas == XLA: OK")
PYEOF
echo "[batch13] tiered scale start $(date -u +%H:%M:%S)"
timeout 5400 python scripts/bench_tiered_scale.py 2>&1 | tail -25
echo "[batch13] pstable sweep start $(date -u +%H:%M:%S)"
export PSTABLE_STEPS1_ONLY=1
timeout 7200 python scripts/bench_pstable.py 2>&1 | tail -15
echo "[batch13] pstable hard-corpus point $(date -u +%H:%M:%S)"
export PSTABLE_CORPUS=hard
export PSTABLE_POINTS="10,3,32768;12,3,32768;10,2,32768"
timeout 5400 python scripts/bench_pstable.py 2>&1 | tail -8
echo "[batch13] done $(date -u +%H:%M:%S)"
