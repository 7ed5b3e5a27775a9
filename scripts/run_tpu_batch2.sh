#!/bin/bash
# Bench-refresh batch, chained after run_tpu_batch1.sh (ONE TPU client at a
# time). Applies the measured gmax schedule (results/tune_gmax_nsub.json /
# attrib_flat_r03.json) via the FLAT_GMAX_* env knobs, then refreshes the
# three headline artifacts in VERDICT-priority order.
cd /root/repo
# wait for batch1 to exit
if [ -f /tmp/batch1.pid ]; then
  while kill -0 "$(cat /tmp/batch1.pid)" 2>/dev/null; do sleep 60; done
fi
eval "$(python - <<'EOF'
import json
nsub, bb = 1, 128
try:
    t = json.load(open("results/tune_gmax_nsub.json"))
    best = min((v, k) for k, v in t.items() if k.startswith("nsub"))
    nsub = int(best[1][len("nsub"):-len("_ms")])
except Exception:
    pass
try:
    a = json.load(open("results/attrib_flat_r03.json"))
    pts = {128: a.get("upto_gmax", 1e9)}
    for k, v in a.items():
        if k.startswith("gmax_bb"):
            pts[int(k[len("gmax_bb"):])] = v
    bb = min(pts, key=pts.get)
except Exception:
    pass
print(f"export FLAT_GMAX_NSUB={nsub} FLAT_GMAX_BLOCK_B={bb}")
EOF
)"
echo "[batch2] gmax schedule: nsub=$FLAT_GMAX_NSUB block_b=$FLAT_GMAX_BLOCK_B"
echo "[batch2] bench_flat start $(date -u +%H:%M:%S)"
timeout 5400 python scripts/bench_flat.py 2>&1 | tail -20
echo "[batch2] bench_deep8m_coarse start $(date -u +%H:%M:%S)"
timeout 5400 python scripts/bench_deep8m_coarse.py 2>&1 | tail -25
echo "[batch2] select-factor A/B (sort vs approx at the Deep headline point) $(date -u +%H:%M:%S)"
FOREST_SELECT_APPROX_FACTOR=32 DEEP_POINTS="1,16,12288,1024,262144" \
  timeout 3600 python scripts/bench_deep8m_coarse.py 2>&1 | tail -8
echo "[batch2] bench_ivf start $(date -u +%H:%M:%S)"
IVF_TRAIN_SAMPLE=2000000 timeout 5400 python scripts/bench_ivf.py 2>&1 | tail -25
echo "[batch2] done $(date -u +%H:%M:%S)"
