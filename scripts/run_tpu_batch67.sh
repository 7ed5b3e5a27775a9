#!/bin/bash
# Batch 67: rerun the sampled IVF A/B leg with the memory fix.
cd /root/repo
for pidf in /tmp/b65.pid /tmp/b66.pid; do
  while kill -0 $(cat $pidf 2>/dev/null) 2>/dev/null; do sleep 60; done
done
probe() {
  for i in $(seq 1 20); do
    echo "[batch67] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch67] tunnel up"; return 0
    fi
    sleep 120
  done
  return 1
}
probe || exit 1
echo "[batch67] leg 1: IVF sampled build (memory fix) $(date -u +%H:%M:%S)"
timeout 5400 python scripts/bisect_ivf_build.py sampled > /tmp/b67_leg1.log 2>&1
echo "[batch67] leg1 rc=$? $(date -u +%H:%M:%S)"
echo "[batch67] done $(date -u +%H:%M:%S)"
