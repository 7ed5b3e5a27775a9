#!/bin/bash
# Round-3 batch 5 (chained after batch13): Deep-30M single-chip dress
# rehearsal (streamed bf16-residency IVF build + nprobe ladder).
cd /root/repo
if [ -f /tmp/batch13.pid ]; then
  while kill -0 "$(cat /tmp/batch13.pid)" 2>/dev/null; do sleep 60; done
fi
for i in $(seq 1 40); do
  echo "[batch14] probe attempt $i $(date -u +%H:%M:%S)"
  if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
    echo "[batch14] tunnel up"; break
  fi
  sleep 180
done
echo "[batch14] deep30m start $(date -u +%H:%M:%S)"
timeout 10800 python scripts/bench_deep30m.py 2>&1 | tail -30
echo "[batch14] done $(date -u +%H:%M:%S)"
