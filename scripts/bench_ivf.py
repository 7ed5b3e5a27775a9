"""IVF clustered-flat engine at Deep-8M on TPU: build time + nprobe sweep
(qps, recall@10 vs cached exact GT) — the VERDICT #1 'beat the grouped scan'
experiment. Same synthetic corpus recipe as tune_flat_grouped / bench_large
(seed 11, 50k centers), GT cache /tmp/deep8m_gt.npz.

HBM math that shapes the sweep: window reads are per-(query, window), so a
query batch of B=1024 reads B*wb*win*128 bytes; at nprobe=32/win=256 that is
2.1 GB — MORE than the 1 GB the full grouped scan reads once. IVF wins only
with few probed rows per query: win=64 and nprobe <= 16 on this corpus.

Run: timeout 5400 python scripts/bench_ivf.py > /tmp/bench_ivf.log 2>&1
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import os

    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.ivf import (
        build_ivf, ivf_topk, ivf_window_budget)

    # IVF_TRAIN_SAMPLE=2000000 -> sampled Lloyd + one full assignment
    train_sample = (int(os.environ["IVF_TRAIN_SAMPLE"])
                    if os.environ.get("IVF_TRAIN_SAMPLE") else None)

    N, D, NQ = 8_000_000, 96, 1024
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(50_000, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 50_000, N)] + 0.05 * rng.normal(size=(N, D))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)
    gt = np.load("/tmp/deep8m_gt.npz")["gt"]
    gt_sets = [set(map(int, gt[i])) for i in range(NQ)]

    t0 = time.perf_counter()
    state = build_ivf(x, np.arange(N, dtype=np.int32), target_cluster=256,
                      iters=6, seed=0, train_sample=train_sample)
    jax.block_until_ready(state.sketch)
    build_s = time.perf_counter() - t0
    kc = int(state.centroids.shape[0])
    print(f"build: {build_s:.1f} s, K={kc}, npad={int(state.sketch.shape[0])}",
          flush=True)

    qd = jnp.asarray(x[:NQ])
    qids = jnp.arange(NQ, dtype=jnp.int32)

    out = {"n": N, "dim": D, "build_s": round(build_s, 1), "k_clusters": kc,
           "target_cluster": 256, "train_sample": train_sample,
           "points": []}
    # recall was flat at 0.9861 across nprobe AND refine on this corpus:
    # originally blamed on int8-sketch ordering, actually the MXU's default
    # f32 truncation in the exact tier + GT (near-tie flips vs true f32;
    # fixed with Precision.HIGHEST in ops/{exact,flat,rerank} — the CPU
    # emulation measured 0.9875 agreement, results/precision_tier.md)
    sweep = (
        (2, 64, 128), (4, 64, 128), (8, 64, 128), (16, 64, 128),
        (32, 64, 128), (64, 64, 128), (4, 64, 512), (8, 64, 512),
        (8, 64, 2048))
    if os.environ.get("IVF_POINTS"):
        # "nprobe,win,refine[,head_pool,keep];..." override for ad-hoc
        # sweeps; 4th/5th fields enable two-phase window pruning
        sweep = tuple(tuple(int(v) for v in grp.split(","))
                      for grp in os.environ["IVF_POINTS"].split(";"))
    heads_cache = {}
    for pt in sweep:
        nprobe, win, refine = pt[:3]
        hp = pt[3] if len(pt) > 3 else 0
        keep = pt[4] if len(pt) > 4 else 0
        wb = ivf_window_budget(state.starts, state.ends, nprobe, win)
        try:
            heads = None
            if hp and keep:
                if hp not in heads_cache:
                    from similaritysearchbyrdf_tpu.ops.ivf import (
                        build_ivf_heads)
                    heads_cache[hp] = build_ivf_heads(
                        state.sketch, state.row_ids, hp)
                heads = heads_cache[hp]
            args = (state.sketch, state.corpus, state.row_ids,
                    state.centroids, state.starts, state.ends, qd, qids, 10)
            kw = dict(nprobe=nprobe, win=win, wb=wb, refine=refine,
                      heads=heads, head_pool=hp, keep=keep)
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
            rec = hits / (NQ * 10)
            qps = NQ / dt
            print(f"nprobe{nprobe}_win{win}_wb{wb}_rf{refine}"
                  f"_hp{hp}_keep{keep}: {qps:.0f} qps "
                  f"recall {rec:.4f}", flush=True)
            out["points"].append({"nprobe": nprobe, "win": win, "wb": wb,
                                  "refine": refine, "qps": round(qps),
                                  "recall@10": round(rec, 4),
                                  **({"head_pool": hp, "keep": keep}
                                     if hp and keep else {})})
        except Exception:
            import traceback
            traceback.print_exc()
            print(f"nprobe{nprobe}: FAILED", flush=True)
    out["note"] = ("IVF clustered-flat (ops/ivf.py); synthetic clustered "
                   "corpus seed 11; exact GT; pipelined timing; v5e")

    def _key(p):
        return (p["nprobe"], p["win"], p["refine"],
                p.get("head_pool", 0), p.get("keep", 0))

    try:   # keep prior sweep points when running an IVF_POINTS subset
        with open("results/ivf_deep8m.json") as f:
            prior = json.load(f).get("points", [])
        seen = {_key(p) for p in out["points"]}
        out["points"] += [p for p in prior if _key(p) not in seen]
    except (OSError, ValueError, KeyError):
        pass
    with open("results/ivf_deep8m.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
