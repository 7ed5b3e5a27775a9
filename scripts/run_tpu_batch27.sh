#!/bin/bash
# Batch 27 (chained after batch 26):
#   1. clean flat re-point — batch24's flat leg regenerated GT in-process
#      immediately before the timed region (the documented ~25% process-state
#      qps degradation), so its numbers landed in
#      results/flat_repoint_batch24.json instead of flat.json. /tmp GT caches
#      now exist, so this leg measures the argpack-era code in a fresh
#      process with no GT contamination.
#   2. requeue the deep8m two-phase-prune sweep (VERDICT item 5): batch24's
#      leg died with "TPU worker process crashed or restarted" on the first
#      B=256 point. Retry at B=256; if the worker crashes again, fall back
#      to B=128 (the bisect's 123 -> 66.7 ms/64-query-chunk evidence was
#      measured at B=64, so even B=128 should carry the operating points).
cd /root/repo

for dep in /tmp/batch26.pid /tmp/batch24.pid; do
  if [ -f "$dep" ]; then
    while kill -0 "$(cat $dep)" 2>/dev/null; do
      echo "[batch27] waiting for $dep $(date -u +%H:%M:%S)"; sleep 120
    done
  fi
done

probe() {
  for i in $(seq 1 60); do
    echo "[batch27] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch27] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch27] clean flat re-point (cached GT) $(date -u +%H:%M:%S)"
timeout 10800 python scripts/bench_flat.py both 2>&1 | tail -8

probe
echo "[batch27] deep8m prune sweep B=256 retry $(date -u +%H:%M:%S)"
export DEEP_OVERFLOW=2000 DEEP_HEAD_POOL=64 DEEP_QB=256
export DEEP_POINTS="1,16,8192,512,262144,96;1,16,8192,512,262144,128;1,16,12288,512,262144,128;1,16,12288,512,262144,192;1,16,12288,512,524288,192;1,16,12288,512,262144"
if ! timeout 10800 python scripts/bench_deep8m_coarse.py 2>&1 | tail -10; then
  echo "[batch27] B=256 leg failed; falling back to B=128 $(date -u +%H:%M:%S)"
  probe
  export DEEP_QB=128
  timeout 10800 python scripts/bench_deep8m_coarse.py 2>&1 | tail -10
fi
unset DEEP_POINTS DEEP_QB DEEP_OVERFLOW DEEP_HEAD_POOL
echo "[batch27] done $(date -u +%H:%M:%S)"
