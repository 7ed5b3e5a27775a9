#!/bin/bash
# Round-3 batch 1: the HARD corpus frontier (VERDICT r2 item 1).
#   1. exact GT for hard8m (cached /tmp/hard8m_gt.npz)
#   2. IVF nprobe x refine sweep + tune_nprobe demo  -> results/ivf_hard8m.json
#   3. flat grouped/scan points                      -> results/flat_hard8m.json
#   4. forest coarse steps/budget sweep              -> results/hard8m_coarse.json
# ONE TPU client at a time; probe the tunnel first (CLAUDE.md outage windows).
cd /root/repo
for i in $(seq 1 40); do
  echo "[batch10] probe attempt $i $(date -u +%H:%M:%S)"
  if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
    echo "[batch10] tunnel up"; break
  fi
  sleep 180
done
echo "[batch10] hard8m ivf+flat start $(date -u +%H:%M:%S)"
timeout 7200 python scripts/bench_hard8m.py all 2>&1 | tail -40
echo "[batch10] forest coarse steps/budget sweep $(date -u +%H:%M:%S)"
export DEEP_CORPUS=hard
# steps,budget,refine,window,m_cap — vary steps (0/1/2) and probe budget
# (4/16) at the round-2 operating point's window/refine so the recall column
# must move if the knobs bind
export DEEP_POINTS="0,4,12288,512,262144;0,16,12288,512,262144;1,4,12288,512,262144;1,16,12288,512,262144;2,16,16384,512,262144"
timeout 7200 python scripts/bench_deep8m_coarse.py 2>&1 | tail -20
echo "[batch10] done $(date -u +%H:%M:%S)"
