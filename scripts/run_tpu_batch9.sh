#!/bin/bash
# Chained after run_tpu_batch8.sh (ONE TPU client at a time). IVF window
# sweep: at nprobe=2/win=64 the engine issues ~26 descriptors/query; wider
# windows cut descriptor count per probed cluster (window bytes stay small
# at low nprobe: B*wb*win*128 = ~0.4-0.9 GB/batch at win 128-256).
cd /root/repo
if [ -f /tmp/batch8.pid ]; then
  while kill -0 "$(cat /tmp/batch8.pid)" 2>/dev/null; do sleep 60; done
fi
for i in $(seq 1 40); do
  echo "[batch9] probe attempt $i $(date -u +%H:%M:%S)"
  if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
    echo "[batch9] tunnel up"; break
  fi
  sleep 180
done
echo "[batch9] ivf window sweep start $(date -u +%H:%M:%S)"
export IVF_POINTS="2,128,128;2,256,128;4,128,128;4,256,128;8,128,128;2,64,128"
timeout 7200 python scripts/bench_ivf.py 2>&1 | tail -12
echo "[batch9] done $(date -u +%H:%M:%S)"
