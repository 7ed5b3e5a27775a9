#!/bin/bash
# Batch 52 (round 4): corrected 100M shard leg (hard_clustered corpus) +
# compose; then a bench.py confirmation run with FOLD defaults landed.
cd /root/repo

if [ -f /tmp/batch51.pid ]; then
  while kill -0 "$(cat /tmp/batch51.pid)" 2>/dev/null; do
    echo "[batch52] waiting for batch51 $(date -u +%H:%M:%S)"; sleep 120
  done
fi

probe() {
  for i in $(seq 1 60); do
    echo "[batch52] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch52] tunnel up"; return 0
    fi
    sleep 120
  done
  echo "[batch52] probe exhausted; aborting" >&2
  return 1
}

probe || exit 1
echo "[batch52] leg 1: corrected 100M shard leg $(date -u +%H:%M:%S)"
timeout 9000 python scripts/deep100m_capstone.py shard_leg > /tmp/b52_leg1.log 2>&1
echo "[batch52] leg1 rc=$? $(date -u +%H:%M:%S)"
python scripts/deep100m_capstone.py compose >> /tmp/b52_leg1.log 2>&1

echo "[batch52] done $(date -u +%H:%M:%S)"
