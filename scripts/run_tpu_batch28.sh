#!/bin/bash
# Batch 28: consolidated remainder of the round-3 TPU queue, in value order.
# Replaces batches 24-27, whose wrapper scripts were corrupted by in-place
# edits while running (bash reads scripts incrementally by byte offset —
# never edit a running script). Already landed: flat re-point (kept as
# results/flat_repoint_batch24.json), hard8m forest prune sweep, hard8m GT,
# sparse_1m exact-GT.
# Legs:
#   1. d784 high-dimensional point (VERDICT item 8; CPU-smoked at 20k)
#   2. argpack flat-tail stage bisect (the item-3 measurement)
#   3. clean flat re-point (cached GT, fresh process — no GT contamination)
#   4. deep8m prune sweep retry at B=256 with B=128 fallback (item 5;
#      batch24's leg died on a TPU worker crash at the first B=256 point)
#   5. deep30m dress rehearsal (item 2; GT-path lane-pad fix CPU-smoked)
#   6. hard8m IVF prune sweep + deep8m IVF prune points (frontier)
cd /root/repo

probe() {
  for i in $(seq 1 60); do
    echo "[batch28] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch28] tunnel up"; return 0
    fi
    sleep 180
  done
}

probe
echo "[batch28] d784 $(date -u +%H:%M:%S)"
timeout 7200 python scripts/bench_d784.py 2>&1 | tail -14

probe
echo "[batch28] argpack stage bisect $(date -u +%H:%M:%S)"
timeout 5400 python scripts/bisect_argpack.py 2>&1 | tail -20

probe
echo "[batch28] clean flat re-point (cached GT) $(date -u +%H:%M:%S)"
timeout 10800 python scripts/bench_flat.py both 2>&1 | tail -8

probe
echo "[batch28] deep8m prune sweep B=256 retry $(date -u +%H:%M:%S)"
export DEEP_OVERFLOW=2000 DEEP_HEAD_POOL=64 DEEP_QB=256
export DEEP_POINTS="1,16,8192,512,262144,96;1,16,8192,512,262144,128;1,16,12288,512,262144,128;1,16,12288,512,262144,192;1,16,12288,512,524288,192;1,16,12288,512,262144"
if ! timeout 10800 python scripts/bench_deep8m_coarse.py 2>&1 | tail -10; then
  echo "[batch28] B=256 leg failed; falling back to B=128 $(date -u +%H:%M:%S)"
  probe
  export DEEP_QB=128
  timeout 10800 python scripts/bench_deep8m_coarse.py 2>&1 | tail -10
fi
unset DEEP_POINTS DEEP_QB DEEP_OVERFLOW DEEP_HEAD_POOL

probe
echo "[batch28] deep30m $(date -u +%H:%M:%S)"
timeout 10800 python scripts/bench_deep30m.py 2>&1 | tail -20

probe
echo "[batch28] hard8m IVF prune sweep $(date -u +%H:%M:%S)"
export IVF_POINTS="16,64,128,64,96;32,64,128,64,128;32,64,128,64,192;64,64,128,64,128;64,64,128,64,192;64,64,128,64,256;128,64,128,64,192;128,64,128,64,256;128,64,128,64,384;256,64,128,64,256;256,64,128,64,384"
timeout 10800 python scripts/bench_hard8m.py ivf 2>&1 | tail -16
unset IVF_POINTS

probe
echo "[batch28] deep8m IVF prune points $(date -u +%H:%M:%S)"
export IVF_POINTS="8,64,128,64,64;16,64,128,64,96;4,128,128,64,32"
timeout 7200 python scripts/bench_ivf.py 2>&1 | tail -8
unset IVF_POINTS
echo "[batch28] done $(date -u +%H:%M:%S)"
