"""Hard-8M benchmark: the recall frontier that BINDS (VERDICT r2 item 1).

The round-2 Deep-8M corpus (orthogonal centers + 0.05 noise) was so easy
that IVF recall was bit-identical across nprobe 2→64 — the knob never
bound. This bench re-runs the IVF and flat sweeps on
`utils.datasets.hard_clustered` (overlapping hierarchical centers,
heavy-tailed within-cluster spread, uniform noise floor), where exact-GT
neighbors straddle cluster boundaries and nprobe/refine visibly govern
recall (CPU validation: tests/test_datasets.py; 200k-scale curve rose
0.63→0.996 over nprobe 1→64).

Queries are FRESH draws from the mixture (not corpus rows), mirroring the
reference's query-set protocol (`TestSingleRDFSuite.scala:36-61` queries
are held-out file rows), so exclude_self is moot.

Stages: exact GT (cached /tmp/hard8m_gt.npz) → IVF nprobe×refine sweep →
GT-free tune_nprobe demonstration → flat grouped/scan point.
Writes results/ivf_hard8m.json and results/flat_hard8m.json.

Run: timeout 5400 python scripts/bench_hard8m.py > /tmp/bench_hard8m.log 2>&1
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N, D, NQ = 8_000_000, 96, 1024


def corpus_and_gt():
    from similaritysearchbyrdf_tpu.ops.exact import exact_search
    from similaritysearchbyrdf_tpu.utils.datasets import hard_clustered

    t0 = time.perf_counter()
    x, q = hard_clustered(N, D, n_queries=NQ, seed=7)
    print(f"corpus gen: {time.perf_counter()-t0:.1f}s", flush=True)
    cache = "/tmp/hard8m_gt.npz"
    try:
        gt = np.load(cache)["gt"]
    except Exception:
        t0 = time.perf_counter()
        gt, _ = exact_search(x, q, k=10, exclude_self=False)
        np.savez(cache, gt=gt)
        print(f"GT: {time.perf_counter()-t0:.1f}s", flush=True)
    return x, q, [set(map(int, gt[i])) for i in range(NQ)]


def bench_ivf(x, q, gt_sets):
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.ivf import (IVFFlatIndex, build_ivf,
                                                   ivf_topk,
                                                   ivf_window_budget,
                                                   tune_nprobe)

    train_sample = (int(os.environ["IVF_TRAIN_SAMPLE"])
                    if os.environ.get("IVF_TRAIN_SAMPLE") else 2_000_000)
    t0 = time.perf_counter()
    state = build_ivf(x, np.arange(N, dtype=np.int32), target_cluster=256,
                      iters=6, seed=0, train_sample=train_sample)
    jax.block_until_ready(state.sketch)
    build_s = time.perf_counter() - t0
    kc = int(state.centroids.shape[0])
    print(f"IVF build: {build_s:.1f} s, K={kc}", flush=True)

    qd = jnp.asarray(q)
    qids = jnp.full((NQ,), -1, jnp.int32)
    out = {"n": N, "dim": D, "build_s": round(build_s, 1), "k_clusters": kc,
           "corpus": "hard8m_96d", "train_sample": train_sample,
           "points": []}
    sweep = (
        (1, 64, 128), (2, 64, 128), (4, 64, 128), (8, 64, 128),
        (16, 64, 128), (32, 64, 128), (64, 64, 128),
        (8, 64, 512), (16, 64, 512), (32, 64, 512), (16, 64, 2048),
    )
    if os.environ.get("IVF_POINTS"):
        # "nprobe,win,refine[,head_pool,keep];..." — optional 4th/5th fields
        # enable two-phase window pruning (_ivf_prune_windows)
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
                      exclude_self=False, heads=heads, head_pool=hp,
                      keep=keep)
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

    # GT-free tuner demonstration: on a corpus where nprobe binds it must
    # pick a NON-trivial point (round 2 it tuned against a flat curve)
    idx = IVFFlatIndex()
    idx.state = state
    t0 = time.perf_counter()
    picked = tune_nprobe(idx, q[:256], target_recall=0.95)
    out["tuned_nprobe_at_0.95_self_recall"] = picked
    out["tune_s"] = round(time.perf_counter() - t0, 1)
    print(f"tune_nprobe(0.95) -> {picked}", flush=True)

    out["note"] = ("IVF on the HARD corpus (utils.datasets.hard_clustered "
                   "seed 7): overlapping clusters + heavy tail; exact GT; "
                   "fresh (non-corpus) queries; pipelined timing; v5e")

    def _key(p):
        return (p["nprobe"], p["win"], p["refine"],
                p.get("head_pool", 0), p.get("keep", 0))

    try:   # keep prior sweep points when running an IVF_POINTS subset
        with open("results/ivf_hard8m.json") as f:
            prior = json.load(f).get("points", [])
        seen = {_key(p) for p in out["points"]}
        out["points"] += [p for p in prior if _key(p) not in seen]
    except (OSError, ValueError, KeyError):
        pass
    with open("results/ivf_hard8m.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


def bench_flat(x, q, gt_sets):
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.flat import (
        _BLOCK_N, _GMAX_HALVED, _GMAX_QLANE, _gmax_tile_plan, _pad_lanes,
        build_flat_sketch, flat_topk, flat_topk_grouped,
        stride_for_halved_gmax,
    )

    t0 = time.perf_counter()
    corpus = _pad_lanes(jnp.asarray(x))
    sketch, _ = build_flat_sketch(jnp.asarray(x), "int8")
    row_ids = jnp.arange(N, dtype=jnp.int32)
    sketch_gmax = None
    # the default qlane gmax kernel consumes the same strided copy as the
    # halved kernel (ops/flat._ensure_gmax_sketch mirrors this rule)
    if _GMAX_HALVED or (_GMAX_QLANE
                        and _gmax_tile_plan(sketch.shape[1])[0]):
        npad = (N + _BLOCK_N - 1) // _BLOCK_N * _BLOCK_N
        sketch_gmax = stride_for_halved_gmax(
            jnp.pad(sketch, ((0, npad - N), (0, 0))))
    jax.block_until_ready(sketch)
    build_s = time.perf_counter() - t0

    qd = jnp.asarray(q)
    qids = jnp.full((NQ,), -1, jnp.int32)
    row = {"corpus": "hard8m_96d", "n": N, "dim": D, "sketch": "int8",
           "build_s": round(build_s, 2)}
    for mode, refine in (("grouped", 128), ("grouped", 512), ("scan", 128)):
        def go():
            if mode == "grouped":
                return flat_topk_grouped(
                    sketch, corpus, row_ids, qd, qids, 10, refine=refine,
                    r_groups=24, exclude_self=False,
                    sketch_gmax=sketch_gmax,
                    gmax_halved=sketch_gmax is not None)
            return flat_topk(sketch, corpus, row_ids, qd, qids, 10,
                             refine=refine, block=1 << 21,
                             exclude_self=False)

        try:
            ids, _ = go()
            jax.block_until_ready(ids)
            t0 = time.perf_counter()
            for _ in range(5):
                ids, _ = go()
            jax.block_until_ready(ids)
            dt = (time.perf_counter() - t0) / 5
            ids_np = np.asarray(ids)
            hits = sum(len(gt_sets[i] & set(int(v) for v in ids_np[i]
                                            if v >= 0)) for i in range(NQ))
            tag = f"{mode}_rf{refine}"
            row[f"{tag}_qps"] = round(NQ / dt, 1)
            row[f"{tag}_recall@10"] = round(hits / (NQ * 10), 4)
            print(f"flat {tag}: {NQ/dt:.0f} qps recall "
                  f"{hits/(NQ*10):.4f}", flush=True)
        except Exception:
            import traceback
            traceback.print_exc()
    with open("results/flat_hard8m.json", "w") as f:
        json.dump({"points": [row],
                   "note": "flat engine on the HARD corpus; exact GT; "
                           "fresh queries; pipelined timing"}, f, indent=1)
    print(json.dumps(row), flush=True)


def main(which="all"):
    x, q, gt_sets = corpus_and_gt()
    if which in ("ivf", "all"):
        bench_ivf(x, q, gt_sets)
    if which in ("flat", "all"):
        bench_flat(x, q, gt_sets)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
