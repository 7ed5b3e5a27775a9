#!/bin/bash
# Batch 38 (chained after batch 37): re-measure the deep8m/glove flat and
# deep8m IVF points with the exact tier and ground truth both at
# Precision.HIGHEST (the MXU's default f32 matmul truncates operands to
# bf16; near-tie flips capped deep8m recall at 0.9861 across every
# engine/knob — a measurement floor, not candidate saturation; CPU
# emulation: 0.9875 top-10 agreement between truncated scores and true-f32
# GT). Stale default-precision GT caches are removed so bench_flat
# regenerates them; bench_ivf then reuses the fresh deep8m cache.
cd /root/repo

for dep in /tmp/batch37.pid /tmp/batch36.pid /tmp/batch35.pid; do
  if [ -f "$dep" ]; then
    while kill -0 "$(cat $dep)" 2>/dev/null; do
      echo "[batch38] waiting for $dep $(date -u +%H:%M:%S)"; sleep 120
    done
  fi
done

probe() {
  for i in $(seq 1 60); do
    echo "[batch38] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch38] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

rm -f /tmp/deep8m_gt.npz /tmp/flat_gt_1p2m.npz
echo "[batch38] flat re-point, HIGHEST exact tier + fresh GT $(date -u +%H:%M:%S)"
timeout 10800 python scripts/bench_flat.py both 2>&1 | tail -8

probe
echo "[batch38] IVF deep8m ladder on fresh GT $(date -u +%H:%M:%S)"
export IVF_POINTS="2,64,128;8,64,128;32,64,128"
timeout 7200 python scripts/bench_ivf.py 2>&1 | tail -8
unset IVF_POINTS

echo "[batch38] done $(date -u +%H:%M:%S)"
