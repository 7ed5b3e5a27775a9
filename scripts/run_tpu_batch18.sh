#!/bin/bash
# Round-3 consolidated chain (replaces killed batches 14-17; chained after
# batch13). Order: coalesce parity gate -> deep8m coarse re-point (item 5)
# -> argpack bisect -> window adjacency stats -> d784 -> deep30m ->
# sparse query attribution rerun + sparse_1m exact-GT bench.
cd /root/repo
if [ -f /tmp/batch13.pid ]; then
  while kill -0 "$(cat /tmp/batch13.pid)" 2>/dev/null; do sleep 60; done
fi
probe() {
  for i in $(seq 1 60); do
    echo "[batch18] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch18] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch18] coalesce parity gate $(date -u +%H:%M:%S)"
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

probe
echo "[batch18] deep8m coarse with coalescing (item 5) $(date -u +%H:%M:%S)"
export DEEP_OVERFLOW=2000
export DEEP_POINTS="1,12,8192,1024,262144;1,16,12288,1024,262144;1,16,12288,512,262144;1,20,16384,1024,524288;1,16,12288,2048,524288"
timeout 7200 python scripts/bench_deep8m_coarse.py 2>&1 | tail -12
unset DEEP_POINTS DEEP_OVERFLOW

probe
echo "[batch18] bisect_argpack $(date -u +%H:%M:%S)"
timeout 5400 python scripts/bisect_argpack.py 2>&1 | tail -18

probe
echo "[batch18] analyze_windows $(date -u +%H:%M:%S)"
timeout 5400 python scripts/analyze_windows.py 2>&1 | tail -8

probe
echo "[batch18] d784 $(date -u +%H:%M:%S)"
timeout 7200 python scripts/bench_d784.py 2>&1 | tail -14

probe
echo "[batch18] deep30m $(date -u +%H:%M:%S)"
timeout 10800 python scripts/bench_deep30m.py 2>&1 | tail -20

probe
echo "[batch18] attrib_sparse rerun $(date -u +%H:%M:%S)"
timeout 5400 python scripts/attrib_sparse.py 2>&1 | tail -20

probe
echo "[batch18] sparse_1m exact-GT bench $(date -u +%H:%M:%S)"
timeout 7200 python scripts/bench_sparse_1m.py 2>&1 | tail -10
echo "[batch18] done $(date -u +%H:%M:%S)"
