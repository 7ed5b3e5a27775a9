#!/bin/bash
# Chained after run_tpu_batch7.sh (ONE TPU client at a time). Deep-8M
# forest: the coarse stage is DMA-descriptor-bound (results/
# bisect_deep8m_window.json: 57 ms of 123 at w=512), and batch4 showed
# w 512->1024 buys 582->758 qps. Sweep w=2048 / larger m_cap at the
# bucket_overflow=2000 winner, then fold the best points into
# results/deep8m.json (the artifact VERDICT r1 item 3 names).
cd /root/repo
if [ -f /tmp/batch7.pid ]; then
  while kill -0 "$(cat /tmp/batch7.pid)" 2>/dev/null; do sleep 60; done
fi
for i in $(seq 1 40); do
  echo "[batch8] probe attempt $i $(date -u +%H:%M:%S)"
  if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
    echo "[batch8] tunnel up"; break
  fi
  sleep 180
done
echo "[batch8] deep w2048 sweep start $(date -u +%H:%M:%S)"
export DEEP_OVERFLOW=2000
export DEEP_POINTS="1,16,12288,2048,393216;1,16,16384,2048,524288;1,16,12288,1024,393216;1,20,16384,1024,524288;1,12,8192,2048,262144"
timeout 7200 python scripts/bench_deep8m_coarse.py 2>&1 | tail -12

python - <<'EOF'
import json

with open("results/deep8m_coarse.json") as f:
    coarse = json.load(f)
with open("results/deep8m.json") as f:
    deep = json.load(f)

# fold the coarse tier's best operating points (pareto at recall >= 0.90)
pts = [p for p in coarse.get("points", []) if p.get("recall@10", 0) >= 0.90]
pts.sort(key=lambda p: -p["qps"])
pareto, best_rec = [], 0.0
for p in sorted(pts, key=lambda p: -p["recall@10"]):
    if not pareto or p["qps"] > max(q["qps"] for q in pareto):
        pareto.append(p)
pareto = sorted(pareto, key=lambda p: p["qps"])
base = [p for p in deep.get("points", []) if "coarse_refine" not in p]
deep["points"] = base + [dict(p, tier="lane-packed-coarse") for p in pareto]
deep["note"] = (
    "synthetic clustered corpus; exact GT; per-chip slice of the Deep-100M "
    "sharded plan. tier=lane-packed-coarse points run through the cd=16 "
    "int8 coarse tier (bucket_overflow in the point where != 500); "
    "full sweep in results/deep8m_coarse.json")
with open("results/deep8m.json", "w") as f:
    json.dump(deep, f, indent=1)
print("deep8m.json coarse points:", len(pareto))
EOF
echo "[batch8] done $(date -u +%H:%M:%S)"
