#!/bin/bash
# Batch 40 (chained after batch 39): re-anchor stale-precision recall
# labels on corrected (Precision.HIGHEST) ground truth. CPU emulation
# bounds the old labels' skew at <= ~1.2pp (README "Measurement
# integrity"); these legs replace estimates with measurements on the two
# headline hard/forest surfaces.
#  leg 1: hard8m — regen GT, re-score the IVF ladder anchors
#         (nprobe 1/4/16/64) and the flat points (now on the shipped
#         qlane default via the strided copy).
#  leg 2: forest deep8m — re-score the three committed operating points
#         (758 @ 0.9326 / 582 @ 0.9445 / 423 @ 0.9531 configs) on the
#         fresh deep8m GT cache (batch 38).
cd /root/repo

for dep in /tmp/batch39.pid; do
  if [ -f "$dep" ]; then
    while kill -0 "$(cat $dep)" 2>/dev/null; do
      echo "[batch40] waiting for $dep $(date -u +%H:%M:%S)"; sleep 120
    done
  fi
done

probe() {
  for i in $(seq 1 60); do
    echo "[batch40] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch40] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

rm -f /tmp/hard8m_gt.npz
echo "[batch40] hard8m IVF anchors on fresh GT $(date -u +%H:%M:%S)"
export IVF_POINTS="1,64,128;4,64,128;16,64,128;64,64,128"
timeout 10800 python scripts/bench_hard8m.py ivf 2>&1 | tail -10
unset IVF_POINTS

probe
echo "[batch40] hard8m flat (qlane defaults) on fresh GT $(date -u +%H:%M:%S)"
timeout 7200 python scripts/bench_hard8m.py flat 2>&1 | tail -8

probe
echo "[batch40] forest deep8m re-points on corrected GT $(date -u +%H:%M:%S)"
export DEEP_OVERFLOW=2000
export DEEP_POINTS="1,16,12288,1024,262144;1,16,12288,512,262144;1,16,16384,1024,524288"
timeout 10800 python scripts/bench_deep8m_coarse.py 2>&1 | tail -10
unset DEEP_POINTS DEEP_OVERFLOW

echo "[batch40] done $(date -u +%H:%M:%S)"
