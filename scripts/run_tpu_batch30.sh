#!/bin/bash
# Batch 30 (chained after batch 29): bf16 exact-tier A/B for the flat
# engine at deep8m (FLAT_CORPUS_DTYPE=bfloat16 -> results/flat_bfloat16.json).
# At deep8m the recall is int8-sketch-bound (0.9861 at every committed
# operating point), so halving the refine-gather traffic should cost ~zero
# recall here; measures what the Deep-100M residency model pays at the
# operating level. GT is cached in /tmp by earlier legs.
cd /root/repo

for dep in /tmp/batch29.pid /tmp/batch28.pid; do
  if [ -f "$dep" ]; then
    while kill -0 "$(cat $dep)" 2>/dev/null; do
      echo "[batch30] waiting for $dep $(date -u +%H:%M:%S)"; sleep 120
    done
  fi
done

probe() {
  for i in $(seq 1 60); do
    echo "[batch30] probe attempt $i $(date -u +%H:%M:%S)"
    if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
      echo "[batch30] tunnel up"; return 0
    fi
    sleep 180
  done
}
probe

echo "[batch30] flat bf16 exact-tier A/B (deep8m) $(date -u +%H:%M:%S)"
FLAT_CORPUS_DTYPE=bfloat16 timeout 7200 python scripts/bench_flat.py deep 2>&1 | tail -6
echo "[batch30] done $(date -u +%H:%M:%S)"
