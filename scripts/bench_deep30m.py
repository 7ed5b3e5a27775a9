"""Deep-30M single-chip dress rehearsal (VERDICT r2 item 2 / BASELINE
config 5's per-chip memory model): 30M×96d on ONE v5e chip with
low-precision corpus residency — int8 window-scoring sketch (3.9 GB) +
bf16 refine tier (7.9 GB) ≈ 11.9 GB of 16 GB HBM, where an f32 tier alone
would need 15.7 GB.

Corpus: the hard (binding-recall) mixture, generated in chunks and cached
raw to /tmp (one host core: ~17 min to generate 30M). GT: exact top-10 by
a bf16 full scan with f32 accumulation over the resident tier (labeled —
the f32 corpus never fits on device at this scale; bf16 scan flips only
near-ties). Sweep: nprobe ladder at win=64, refine=128.

Run: timeout 7200 python scripts/bench_deep30m.py > /tmp/deep30m.log 2>&1
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N, D, NQ = 30_000_000, 96, 1024


def corpus_and_queries():
    from similaritysearchbyrdf_tpu.utils.datasets import hard_clustered

    cache = "/tmp/hard30m.npy"
    qcache = "/tmp/hard30m_q.npy"
    if os.path.exists(cache) and os.path.exists(qcache):
        return (np.load(cache, mmap_mode="r"), np.load(qcache))
    t0 = time.perf_counter()
    x, q = hard_clustered(N, D, n_queries=NQ, seed=7, n_centers=30_000)
    print(f"corpus gen: {time.perf_counter()-t0:.1f}s", flush=True)
    np.save(cache, x)
    np.save(qcache, q)
    return np.load(cache, mmap_mode="r"), q


def main():
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.exact import exact_topk
    from similaritysearchbyrdf_tpu.ops.ivf import (build_ivf_streamed,
                                                   ivf_topk,
                                                   ivf_window_budget)

    x, q = corpus_and_queries()
    t0 = time.perf_counter()
    state = build_ivf_streamed(
        x, np.arange(N, dtype=np.int32), target_cluster=256, iters=4,
        seed=0, train_sample=2_000_000, corpus_dtype="bfloat16",
        chunk_rows=1 << 21,
    )
    jax.block_until_ready(state.sketch)
    build_s = time.perf_counter() - t0
    kc = int(state.centroids.shape[0])
    npad = int(state.sketch.shape[0])
    hbm_gib = (state.sketch.size + 2 * state.corpus.size
               + 4 * state.row_ids.size) / 2**30
    print(f"build: {build_s:.1f} s, K={kc}, npad={npad}, "
          f"resident {hbm_gib:.1f} GiB", flush=True)

    # GT: bf16 full scan with f32 accumulation over the resident tier
    # (positions -> user ids through row_ids; pad rows id -1 dropped)
    gt_cache = "/tmp/hard30m_gt.npz"
    try:
        gt = np.load(gt_cache)["gt"]
    except Exception:
        t0 = time.perf_counter()
        rids = np.asarray(state.row_ids)
        gt_rows = []
        # the resident tier is lane-padded to Dp=128; pad queries to match
        # (pad lanes are zero, so scores are unchanged)
        dp = int(state.corpus.shape[1])
        qd_all = jnp.asarray(np.pad(q, ((0, 0), (0, dp - D))))
        for s0 in range(0, NQ, 256):
            ids_pos, _ = exact_topk(state.corpus, qd_all[s0:s0 + 256], 12)
            gt_rows.append(np.asarray(ids_pos))
        pos = np.concatenate(gt_rows)
        gt_ids = rids[pos]
        gt = np.stack([r[r >= 0][:10] for r in gt_ids])
        np.savez(gt_cache, gt=gt)
        print(f"GT (bf16 scan): {time.perf_counter()-t0:.1f}s", flush=True)
    gt_sets = [set(map(int, gt[i])) for i in range(NQ)]

    qd = jnp.asarray(q)
    qids = jnp.full((NQ,), -1, jnp.int32)
    out = {"n": N, "dim": D, "build_s": round(build_s, 1), "k_clusters": kc,
           "corpus": "hard30m_96d", "resident_gib": round(hbm_gib, 2),
           "corpus_dtype": "bfloat16", "points": []}
    sweep = ((1, 64, 128), (2, 64, 128), (4, 64, 128), (8, 64, 128),
             (16, 64, 128), (32, 64, 128), (64, 64, 128))
    if os.environ.get("IVF_POINTS"):
        sweep = tuple(tuple(int(v) for v in grp.split(","))
                      for grp in os.environ["IVF_POINTS"].split(";"))
    for nprobe, win, refine in sweep:
        wb = ivf_window_budget(state.starts, state.ends, nprobe, win)
        try:
            args = (state.sketch, state.corpus, state.row_ids,
                    state.centroids, state.starts, state.ends, qd, qids, 10)
            kw = dict(nprobe=nprobe, win=win, wb=wb, refine=refine,
                      exclude_self=False)
            ids, _ = ivf_topk(*args, **kw)
            jax.block_until_ready(ids)
            t0 = time.perf_counter()
            for _ in range(5):
                ids, _ = ivf_topk(*args, **kw)
            jax.block_until_ready(ids)
            dt = (time.perf_counter() - t0) / 5
            ids_np = np.asarray(ids)
            hits = sum(len(gt_sets[i] & set(int(v) for v in ids_np[i]
                                            if v >= 0)) for i in range(NQ))
            rec, qps = hits / (NQ * 10), NQ / dt
            print(f"nprobe{nprobe}_win{win}_wb{wb}_rf{refine}: {qps:.0f} "
                  f"qps recall {rec:.4f}", flush=True)
            out["points"].append({"nprobe": nprobe, "win": win, "wb": wb,
                                  "refine": refine, "qps": round(qps),
                                  "recall@10": round(rec, 4)})
        except Exception:
            import traceback
            traceback.print_exc()
            print(f"nprobe{nprobe}: FAILED", flush=True)
    out["note"] = ("30M hard corpus on ONE v5e: int8 sketch + bf16 refine "
                   "tier (f32 corpus host-only); GT = bf16 exact scan with "
                   "f32 accumulation; fresh queries; pipelined timing")
    with open("results/deep30m.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
