#!/bin/bash
# Batch 42: the SLOT-FOLDED coarse tier (ops/pallas/coarse_fold.py) on TPU —
# VERDICT r2 item 5's forest Deep-8M >=1.5k qps @ >=0.93 attack.
#  leg 0: driver entry() compile check (forest.py changed this round).
#  leg 1: scripts/check_coarse_fold.py — kernel bit-parity vs the XLA
#         fallback + 200k e2e lane-vs-folded at equal descriptor budget.
#  leg 2: deep8m folded sweep (bench_deep8m_coarse.py DEEP_LAYOUT=folded):
#         win {2048,4096} x m_cap {262144..1048576} x refine/budget/rkeep.
cd /root/repo

probe() {
  for i in $(seq 1 60); do
    echo "[batch42] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch42] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch42] leg 0: entry() compile check $(date -u +%H:%M:%S)"
timeout 900 python -c "import __graft_entry__ as g; fn,args=g.entry(); import jax; print('entry OK', jax.jit(fn)(*args)[0].shape)" 2>&1 | tail -3

echo "[batch42] leg 1: coarse_fold parity + e2e $(date -u +%H:%M:%S)"
timeout 3600 python scripts/check_coarse_fold.py 2>&1 | tail -20
if [ ${PIPESTATUS[0]} -ne 0 ]; then
  echo "[batch42] ABORT: coarse_fold check failed"; exit 1
fi

probe
echo "[batch42] leg 2: deep8m folded sweep $(date -u +%H:%M:%S)"
export DEEP_LAYOUT=folded
export DEEP_OVERFLOW=2000
export DEEP_POINTS="1,16,12288,2048,262144,0,64,0;1,16,12288,2048,524288,0,64,0;1,16,12288,4096,1048576,0,64,0;1,16,16384,4096,1048576,0,64,0;1,12,12288,4096,1048576,0,64,0;1,16,8192,2048,524288,0,64,0;1,16,4096,4096,1048576,0,64,1;1,16,12288,4096,524288,0,64,0"
timeout 10800 python scripts/bench_deep8m_coarse.py 2>&1 | tail -30

echo "[batch42] done $(date -u +%H:%M:%S)"
