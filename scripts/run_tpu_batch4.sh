#!/bin/bash
# Chained after run_tpu_batch3.sh (ONE TPU client at a time).
# 1) Re-run the IVF Deep-8M sweep: nprobe>=8 crashed on the ragged-wb
#    Mosaic lowering bug (fixed in ops/pallas/coarse_gather.py) and wiped
#    all but one point of results/ivf_deep8m.json.
# 2) Deep-8M forest bucket_overflow sweep: the window kernel is DMA-
#    descriptor-bound and the descriptor floor is the probed RANGE count;
#    a larger overflow gives fewer, longer ranges (superset candidates per
#    probe key) — aiming at VERDICT #3 (>=600 qps @ recall >=0.92).
cd /root/repo
if [ -f /tmp/batch3.pid ]; then
  while kill -0 "$(cat /tmp/batch3.pid)" 2>/dev/null; do sleep 60; done
fi
for i in $(seq 1 40); do
  echo "[batch4] probe attempt $i $(date -u +%H:%M:%S)"
  if timeout 300 python -c "import jax.numpy as jnp; print(int((jnp.ones((8,8))@jnp.ones((8,8))).sum()))" 2>&1 | grep -q 512; then
    echo "[batch4] tunnel up"; break
  fi
  sleep 180
done
echo "[batch4] bench_ivf start $(date -u +%H:%M:%S)"
IVF_TRAIN_SAMPLE=2000000 timeout 5400 python scripts/bench_ivf.py 2>&1 | tail -15
echo "[batch4] deep overflow=2000 start $(date -u +%H:%M:%S)"
DEEP_OVERFLOW=2000 \
DEEP_POINTS="1,16,12288,1024,262144;1,16,8192,1024,262144;1,12,8192,1024,262144;1,16,12288,512,262144" \
  timeout 7200 python scripts/bench_deep8m_coarse.py 2>&1 | tail -10
echo "[batch4] deep overflow=1000 start $(date -u +%H:%M:%S)"
DEEP_OVERFLOW=1000 \
DEEP_POINTS="1,16,12288,1024,262144;1,16,8192,512,262144;1,20,12288,1024,262144" \
  timeout 7200 python scripts/bench_deep8m_coarse.py 2>&1 | tail -10
echo "[batch4] done $(date -u +%H:%M:%S)"
