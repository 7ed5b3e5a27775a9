#!/bin/bash
# Batch 63 (round 5): smoke decision points (select fix + folded m8192),
# IVF build bisect, latency curves with RTT isolation + stage2 config.
cd /root/repo
while kill -0 $(cat /tmp/b62.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
probe() {
  for i in $(seq 1 20); do
    echo "[batch63] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch63] tunnel up"; return 0
    fi
    sleep 120
  done
  echo "[batch63] probe exhausted; aborting" >&2
  return 1
}
probe || exit 1

echo "[batch63] leg 1: smoke decision points $(date -u +%H:%M:%S)"
export SMOKE_FITS="lane,32,500;folded,32,500"
export SMOKE_POINTS="1024,0,margin,16,512,-1,4096,8,0;1024,0,margin,16,256,-1,4096,8,0;1024,0,margin,16,1024,64,8192,8,0;1024,0,margin,16,2048,64,8192,8,512;1024,0,margin,8,1024,64,8192,8,0;1024,0,margin,16,1024,128,8192,8,0"
timeout 5400 python scripts/tune_smoke_forest.py > /tmp/b63_leg1.log 2>&1
echo "[batch63] leg1 rc=$? $(date -u +%H:%M:%S)"
unset SMOKE_FITS SMOKE_POINTS

echo "[batch63] leg 2: IVF build bisect $(date -u +%H:%M:%S)"
timeout 5400 python scripts/bisect_ivf_build.py > /tmp/b63_leg2.log 2>&1
echo "[batch63] leg2 rc=$? $(date -u +%H:%M:%S)"

echo "[batch63] leg 3: latency curve glove $(date -u +%H:%M:%S)"
timeout 5400 python scripts/bench_latency.py glove > /tmp/b63_leg3.log 2>&1
echo "[batch63] leg3 rc=$? $(date -u +%H:%M:%S)"

echo "[batch63] leg 4: latency curve deep8m $(date -u +%H:%M:%S)"
timeout 7200 python scripts/bench_latency.py deep8m > /tmp/b63_leg4.log 2>&1
echo "[batch63] leg4 rc=$? $(date -u +%H:%M:%S)"
echo "[batch63] done $(date -u +%H:%M:%S)"
