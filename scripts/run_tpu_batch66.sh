#!/bin/bash
# Batch 66 (round 5): RTT re-measure + glove artifact patch, floors at the
# raised forest floor, and a bench.py verification run.
cd /root/repo
while kill -0 $(cat /tmp/b65.pid 2>/dev/null) 2>/dev/null; do sleep 60; done
probe() {
  for i in $(seq 1 20); do
    echo "[batch66] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch66] tunnel up"; return 0
    fi
    sleep 120
  done
  return 1
}
probe || exit 1
echo "[batch66] leg 1: RTT patch $(date -u +%H:%M:%S)"
timeout 1200 python scripts/fix_glove_rtt.py > /tmp/b66_leg1.log 2>&1
echo "[batch66] leg1 rc=$? $(date -u +%H:%M:%S)"
echo "[batch66] leg 2: floors (forest floor 24k) $(date -u +%H:%M:%S)"
timeout 3600 python scripts/check_smoke_regress.py floors > /tmp/b66_leg2.log 2>&1
echo "[batch66] leg2 rc=$? $(date -u +%H:%M:%S)"
echo "[batch66] leg 3: bench.py verification $(date -u +%H:%M:%S)"
timeout 3600 python bench.py > /tmp/b66_leg3.log 2>&1
echo "[batch66] leg3 rc=$? $(date -u +%H:%M:%S)"
echo "[batch66] done $(date -u +%H:%M:%S)"
