#!/bin/bash
# Chained after run_tpu_batch4.sh (ONE TPU client at a time). Re-runs the
# group-select shootout (batch3's run OOM'd building the sketch on-device
# and had a float-index crash in the gmax verify — both fixed), then
# refreshes the flat headline with the winning select schedule.
cd /root/repo
if [ -f /tmp/batch4.pid ]; then
  while kill -0 "$(cat /tmp/batch4.pid)" 2>/dev/null; do sleep 60; done
fi
for i in $(seq 1 40); do
  echo "[batch5] probe attempt $i $(date -u +%H:%M:%S)"
  if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
    echo "[batch5] tunnel up"; break
  fi
  sleep 180
done
echo "[batch5] tune_select start $(date -u +%H:%M:%S)"
timeout 3600 python scripts/tune_select_r03.py 2>&1 | tail -15
eval "$(python - <<'EOF'
import json
mode, sg = "exact2", 64
try:
    t = json.load(open("results/tune_select_r03.json"))
    best = None
    for k, v in t.items():
        if not k.endswith("_ms") or k == "gmax_ms":
            continue
        name = k[:-3]
        if t.get(name + "_verify") == "FAILED":
            continue
        exact = name.startswith("exact2") or name == "topk"
        if not exact:
            continue
        if best is None or v < best[0]:
            best = (v, name)
    # allow approx only if >1.3x faster than the best exact variant
    av = t.get("approx_ms")
    if best and av is not None and av * 1.3 < best[0]:
        best = (av, "approx")
    if best:
        name = best[1]
        if name.startswith("exact2_row_sg"):
            mode, sg = "exact2", int(name[len("exact2_row_sg"):])
        elif name.startswith("exact2_flat_sg"):
            mode, sg = "exact2", int(name[len("exact2_flat_sg"):])
        elif name == "topk":
            mode = "topk"
        elif name == "approx":
            mode = "approx"
except Exception as e:
    print(f"# tuner parse failed: {e}")
print(f"export FLAT_SELECT_MODE={mode} FLAT_SELECT_SG={sg}")
EOF
)"
echo "[batch5] select schedule: mode=$FLAT_SELECT_MODE sg=$FLAT_SELECT_SG"
export FLAT_GMAX_BLOCK_B=512 FLAT_GMAX_NSUB=1
echo "[batch5] bench_flat refresh start $(date -u +%H:%M:%S)"
timeout 7200 python scripts/bench_flat.py 2>&1 | tail -8
echo "[batch5] done $(date -u +%H:%M:%S)"
