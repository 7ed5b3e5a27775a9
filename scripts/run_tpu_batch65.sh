#!/bin/bash
# Batch 65 (round 5; replaces the killed batch-64 waiter): deep8m gsl16/32
# stage2 synergy + the IVF build bisect re-run as three processes.
cd /root/repo
while kill -0 $(cat /tmp/b63.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
probe() {
  for i in $(seq 1 20); do
    echo "[batch65] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch65] tunnel up"; return 0
    fi
    sleep 120
  done
  return 1
}
probe || exit 1
echo "[batch65] leg 1: deep8m gsl16/32 stage2 $(date -u +%H:%M:%S)"
export DEEP_LAYOUT=folded DEEP_OVERFLOW=2000 DEEP_QB=128
export DEEP_POINTS="1,16,16384,512,262144,0,16,0,1,4096;1,16,20480,512,262144,0,16,0,1,4096;1,16,16384,512,262144,0,16,0,1,5120;1,16,24576,512,262144,0,16,0,1,6144;1,16,16384,512,262144,0,32,0,1,4096;1,16,28672,512,262144,0,16,0,1,8192"
timeout 7200 python scripts/bench_deep8m_coarse.py > /tmp/b65_leg1.log 2>&1
echo "[batch65] leg1 rc=$? $(date -u +%H:%M:%S)"
unset DEEP_POINTS DEEP_QB DEEP_LAYOUT DEEP_OVERFLOW

echo "[batch65] leg 2: IVF bisect sampled build $(date -u +%H:%M:%S)"
timeout 3600 python scripts/bisect_ivf_build.py sampled > /tmp/b65_leg2.log 2>&1
echo "[batch65] leg2 rc=$? $(date -u +%H:%M:%S)"
echo "[batch65] leg 3: IVF bisect full build $(date -u +%H:%M:%S)"
timeout 3600 python scripts/bisect_ivf_build.py full > /tmp/b65_leg3.log 2>&1
echo "[batch65] leg3 rc=$? $(date -u +%H:%M:%S)"
echo "[batch65] done $(date -u +%H:%M:%S)"
