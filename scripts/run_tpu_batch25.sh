#!/bin/bash
# Batch 25: IVF two-phase window pruning sweep (chained after batch 24).
# The hard-corpus IVF frontier pays linearly in probed windows (wb 205/397/
# 781 at nprobe 16/32/64 -> 11.9k/6.9k/3.8k qps); phase-1 head pruning caps
# the DMA + select cost at `keep` windows, so high-nprobe (high-recall)
# points should move up-left. Also probes NEW higher-recall points
# (nprobe 128/256) that were unaffordable unpruned, and two deep8m points
# for the record (recall there is sketch-bound at 0.9861).
cd /root/repo

for dep in /tmp/batch27.pid /tmp/batch26.pid /tmp/batch24.pid; do
  if [ -f "$dep" ]; then
    while kill -0 "$(cat $dep)" 2>/dev/null; do
      echo "[batch25] waiting for $dep $(date -u +%H:%M:%S)"; sleep 120
    done
  fi
done

probe() {
  for i in $(seq 1 60); do
    echo "[batch25] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch25] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch25] hard8m IVF prune sweep $(date -u +%H:%M:%S)"
# nprobe,win,refine,head_pool,keep — unpruned anchors re-run implicitly via
# the prior-point merge; keep sweeps at the measured wb tiers (205/397/781/
# ~1550) plus the new nprobe-128/256 frontier extension
export IVF_POINTS="16,64,128,64,96;32,64,128,64,128;32,64,128,64,192;64,64,128,64,128;64,64,128,64,192;64,64,128,64,256;128,64,128,64,192;128,64,128,64,256;128,64,128,64,384;256,64,128,64,256;256,64,128,64,384"
timeout 10800 python scripts/bench_hard8m.py ivf 2>&1 | tail -16
unset IVF_POINTS

probe
echo "[batch25] deep8m IVF prune points $(date -u +%H:%M:%S)"
export IVF_POINTS="8,64,128,64,64;16,64,128,64,96;4,128,128,64,32"
timeout 7200 python scripts/bench_ivf.py 2>&1 | tail -8
unset IVF_POINTS
echo "[batch25] done $(date -u +%H:%M:%S)"
