#!/bin/bash
# Chained after run_tpu_batch6.sh (ONE TPU client at a time). Re-runs the
# fixed select tuner (batch5's run died on a 1 GB HLO constant — HTTP 413),
# then attributes the post-halved pipeline stages, then refreshes the flat
# headline with ALL measured winners.
cd /root/repo
if [ -f /tmp/batch6.pid ]; then
  while kill -0 "$(cat /tmp/batch6.pid)" 2>/dev/null; do sleep 60; done
fi
for i in $(seq 1 40); do
  echo "[batch7] probe attempt $i $(date -u +%H:%M:%S)"
  if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
    echo "[batch7] tunnel up"; break
  fi
  sleep 180
done

# gmax winners from batch6's tuner
eval "$(python - <<'EOF'
import json
halved, bb, nsub = 0, 512, 1
try:
    t = json.load(open("results/tune_gmax_halved.json"))
    best_plain = min((v, k) for k, v in t.items()
                     if k.startswith("plain_") and k.endswith("_ms"))
    hal = [(v, k) for k, v in t.items()
           if k.startswith("halved_") and k.endswith("_ms")]
    if hal and not any(k.startswith("halved_") and k.endswith("_verify")
                       for k in t):
        best_h = min(hal)
        if best_h[0] + 0.5 < best_plain[0]:
            halved = 1
            parts = best_h[1].split("_")
            bb, nsub = int(parts[1][2:]), int(parts[2][4:])
        else:
            bb = int(best_plain[1].split("_")[1][2:])
except Exception as e:
    print(f"# gmax tuner parse failed: {e}")
print(f"export FLAT_GMAX_HALVED={halved} FLAT_GMAX_BLOCK_B={bb} "
      f"FLAT_GMAX_NSUB={nsub}")
EOF
)"
echo "[batch7] gmax: halved=$FLAT_GMAX_HALVED bb=$FLAT_GMAX_BLOCK_B nsub=$FLAT_GMAX_NSUB"

echo "[batch7] tune_select (fixed) start $(date -u +%H:%M:%S)"
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
        if not (name.startswith("exact2") or name == "topk"):
            continue
        if best is None or v < best[0]:
            best = (v, name)
    av = t.get("approx_ms")
    if best and av is not None and av * 1.3 < best[0]:
        best = (av, "approx")
    if best:
        name = best[1]
        if name.startswith("exact2_row_sg") or name.startswith("exact2_flat_sg"):
            mode, sg = "exact2", int(name.rsplit("sg", 1)[1])
        elif name in ("topk", "approx"):
            mode = name
except Exception as e:
    print(f"# select tuner parse failed: {e}")
print(f"export FLAT_SELECT_MODE={mode} FLAT_SELECT_SG={sg}")
EOF
)"
echo "[batch7] select: mode=$FLAT_SELECT_MODE sg=$FLAT_SELECT_SG"

echo "[batch7] attrib_flat_r04 start $(date -u +%H:%M:%S)"
timeout 5400 python scripts/attrib_flat_r04.py 2>&1 | tail -10

echo "[batch7] bench_flat final refresh start $(date -u +%H:%M:%S)"
timeout 7200 python scripts/bench_flat.py 2>&1 | tail -8
echo "[batch7] done $(date -u +%H:%M:%S)"
