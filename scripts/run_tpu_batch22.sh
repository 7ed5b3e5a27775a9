#!/bin/bash
# Round-3 follow-up, chained after batch21: A/B the slot-order prune fix
# (89552d3 — pruned windows back in address order so the DMA run-coalescer
# can form runs; batch21's bisect_prune ran the score-order code), then
# sweep the query chunk size at the pruned operating points (the 4x
# smaller select slab unlocks B > 64).
cd /root/repo
if [ -f /tmp/batch21.pid ]; then
  while kill -0 "$(cat /tmp/batch21.pid)" 2>/dev/null; do sleep 60; done
fi
probe() {
  for i in $(seq 1 60); do
    echo "[batch22] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch22] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch22] bisect_prune rerun (slot-order fix) $(date -u +%H:%M:%S)"
DEEP_OVERFLOW=2000 timeout 5400 python scripts/bisect_prune.py 2>&1 | tail -14

probe
echo "[batch22] deep8m coarse prune sweep at B=256 $(date -u +%H:%M:%S)"
export DEEP_OVERFLOW=2000 DEEP_HEAD_POOL=64 DEEP_QB=256
# phase-1 is 4.4 ms of a 66.7 ms chunk (results/bisect_prune.json) — keep
# can afford to drop: sweep keep 64..192 at the 512-window point.
# refine=8192 points ride the strided-tournament select (m2*8 <= keep*win
# fires at keep >= 128) and halve the idgather/exact tail vs refine 12288.
export DEEP_POINTS="1,16,8192,512,262144,64;1,16,8192,512,262144,96;1,16,8192,512,262144,128;1,16,12288,512,262144,128;1,16,12288,512,262144,192;1,16,8192,512,524288,192"
timeout 10800 python scripts/bench_deep8m_coarse.py 2>&1 | tail -10
unset DEEP_POINTS DEEP_OVERFLOW DEEP_HEAD_POOL DEEP_QB
echo "[batch22] done $(date -u +%H:%M:%S)"
