#!/bin/bash
# Batch 44: folded path with PER-INDEX gathers (commit 9798d8e) — the stage
# bisect showed idgather was 17.8 ms of the 47.5 ms chunk as per-candidate
# element gathers; the group-row reformulation fetches refine/gsl rows
# instead. The span-row rank also removes 6 serial gather steps from
# lookup_ranges.
#  leg 0: entry() compile check (deferred /verify leg) + kernel parity
#  leg 1: bisect_fold with the new lookup/score sub-stages at the
#         batch-43 operating point — A/B of the idgather collapse
#  leg 2: deep8m folded re-points with the new gathers at the best
#         batch-43 leg-2 configs (DEEP_POINTS filled from results)
cd /root/repo

probe() {
  for i in $(seq 1 60); do
    echo "[batch44] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch44] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch44] leg 0: entry() compile + coarse_fold parity/e2e $(date -u +%H:%M:%S)"
timeout 900 python -c "
import __graft_entry__ as g; fn, args = g.entry()
import jax; print('entry OK', jax.jit(fn)(*args)[0].shape)
" 2>&1 | tail -2
timeout 3600 python scripts/check_coarse_fold.py 2>&1 | tail -12
if [ ${PIPESTATUS[0]} -ne 0 ]; then
  echo "[batch44] ABORT: coarse_fold check failed"; exit 1
fi

probe
echo "[batch44] leg 1: bisect_fold new-gather A/B $(date -u +%H:%M:%S)"
export FOLD_WIN=2048 FOLD_MCAP=262144 FOLD_REFINE=12288 FOLD_BUDGET=16 FOLD_GSL=64
timeout 5400 python scripts/bisect_fold.py 2>&1 | tail -20
# fine-gsl shape: select width m_cap/gsl = 32768 — is the select sort a
# cost yet, and how far does idgather drop at rgg = refine/8 groups?
export FOLD_WIN=512 FOLD_MCAP=262144 FOLD_REFINE=12288 FOLD_GSL=8
export BISECT_OUT=results/bisect_fold_gsl8.json
timeout 5400 python scripts/bisect_fold.py 2>&1 | tail -20
unset BISECT_OUT
unset FOLD_WIN FOLD_MCAP FOLD_REFINE FOLD_BUDGET FOLD_GSL

probe
echo "[batch44] leg 2: deep8m folded re-points (new gathers) $(date -u +%H:%M:%S)"
export DEEP_LAYOUT=folded
export DEEP_OVERFLOW=2000
# FILL FROM BATCH-43 LEG-2 RESULTS before launching:
export DEEP_POINTS="${DEEP_POINTS_OVERRIDE:?set DEEP_POINTS_OVERRIDE}"
timeout 10800 python scripts/bench_deep8m_coarse.py 2>&1 | tail -30

echo "[batch44] done $(date -u +%H:%M:%S)"
