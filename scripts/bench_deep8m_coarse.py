"""Deep-8M forest through the LANE-PACKED coarse tier — VERDICT r1 item 3
(forest >= 600 qps @ recall >= 0.92 at 8M x 96).

The non-coarse path at this scale is gather-bound: candidate ids arrive as
~4.2M element gathers (~67 ms per 64-query chunk) plus a bf16 full-row
gather of every candidate (~1 GB per chunk). The cd=16 lane-packed tier
(G=8 tables per 128-lane row; 16 B/row/table = 3.8 GB at 8M x 30 tables)
scores candidates POSITIONALLY via aligned-window DMA instead, and only the
top `coarse_refine` rows get id + f32-row gathers.

HBM: corpus f32 4.3 GB + tier 4.3 GB + ids/keys ~2 GB — fits; rerank_dtype
stays f32 so no bf16 corpus copy is built.

Run: timeout 5400 python scripts/bench_deep8m_coarse.py > /tmp/deep8m_coarse.log 2>&1
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import os

    import jax

    cd = int(os.environ.get("DEEP_COARSE_DIM", "16"))
    # round-3 folded layout (ops/pallas/coarse_fold.py): fold = 128/cs
    # consecutive same-table slots per 128-lane row + in-kernel argmax
    # packing — the same descriptor budget covers 8x more candidates at
    # cd=16 and the wide select disappears
    layout = os.environ.get("DEEP_LAYOUT", "lane")
    # two-phase window pruning: pooled-head tier (rows per head row); a
    # point's optional 6th field is window_keep (top windows surviving
    # phase 1 — the descriptor-count attack measured in _prune_windows)
    head_pool = int(os.environ.get("DEEP_HEAD_POOL", "0"))
    # The window kernel is DMA-descriptor-bound and the descriptor floor is
    # the probed RANGE count: a larger bucket_overflow makes buckets
    # shallower (fewer, longer ranges — a SUPERSET candidate set per probe
    # key), trading nearly-free scored bytes for fewer descriptors.
    overflow = int(os.environ.get("DEEP_OVERFLOW", "500"))

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index.forest import RDFForest
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    N, D, NQ = 8_000_000, 96, 1024
    hard = os.environ.get("DEEP_CORPUS", "easy") == "hard"

    def gt_or_build(cache, x, queries, exclude_self):
        # the /tmp caches do not survive machine restarts — regenerate
        # (HIGHEST-precision exact scan, same recipe that wrote them)
        try:
            return np.load(cache)["gt"]
        except Exception:
            from similaritysearchbyrdf_tpu.ops.exact import exact_search
            t0 = time.perf_counter()
            gt, _ = exact_search(x, queries, k=10, exclude_self=exclude_self)
            np.savez(cache, gt=gt)
            print(f"GT rebuild: {time.perf_counter()-t0:.1f}s", flush=True)
            return gt

    if hard:
        # the binding-recall corpus (VERDICT r2 item 1): fresh queries,
        # GT cache shared with scripts/bench_hard8m.py
        from similaritysearchbyrdf_tpu.utils.datasets import hard_clustered
        x, queries = hard_clustered(N, D, n_queries=NQ, seed=7)
        gt_ids = gt_or_build("/tmp/hard8m_gt.npz", x, queries, False)
        query_ids = np.full(NQ, -1, np.int32)
    else:
        rng = np.random.default_rng(11)
        centers = rng.normal(size=(50_000, D))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        x = centers[rng.integers(0, 50_000, N)] + 0.05 * rng.normal(
            size=(N, D))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        x = x.astype(np.float32)
        queries = x[:NQ]
        gt_ids = gt_or_build("/tmp/deep8m_gt.npz", x, queries, True)
        query_ids = np.arange(NQ)
    gt_sets = [set(map(int, gt_ids[i])) for i in range(NQ)]

    conf = RDFConfig(
        vector_dim=D, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3, lsh_table=TableConfig(chain_length=32,
                                                bucket_overflow=overflow),
        query_batch_size=int(os.environ.get("DEEP_QB", "64")),
        max_candidates=65536, top_k=10,
        coarse_dim=cd, coarse_dtype="int8", coarse_refine=2048,
        coarse_head_pool=head_pool, coarse_layout=layout,
        rerank_dtype=os.environ.get("DEEP_RERANK_DTYPE", "float32"),
    )
    t0 = time.perf_counter()
    forest = RDFForest(conf).fit(DenseBatch(np.arange(N, dtype=np.int32), x))
    jax.block_until_ready(forest.state.tables.sorted_keys)
    build_s = time.perf_counter() - t0
    print(f"build: {build_s:.1f} s, {forest.index_bytes_per_vector():.1f} "
          f"B/vec index", flush=True)

    out = {"corpus": ("hard8m_96d" if hard else "deep8m_96d"),
           "n": N, "dim": D,
           "build_s": round(build_s, 1), "coarse_dim": cd,
           "bucket_overflow": overflow,
           "index_bytes_per_vector":
               round(forest.index_bytes_per_vector(), 1),
           "points": []}
    # The window kernel is per-DMA bound (~1.55 us/window at any grp,
    # results/tune_coarse_kernel.json): win 64->128->256 measured 416->
    # 624->846 qps. Recall is coarse-preselect bound at cd=16 (rf4096 was
    # +0.024 over rf2048), so this sweep trades window count (m_cap/win)
    # against refine depth at win=256.
    points = (
        # descriptor count is the wall (~1.2 us/window, DMA engine rate —
        # results/check_coarse_drain_static.json): w=1024 halves windows
        # per m_cap vs w=512; the 524288 point buys recall headroom at the
        # same 512 windows/query as today's w=512 x 262144 operating point
        (1, 16, 12288, 1024, 262144), (1, 16, 16384, 1024, 524288),
        (1, 16, 12288, 512, 262144), (1, 16, 12288, 256, 196608),
        (1, 20, 16384, 512, 262144),
    )
    if os.environ.get("DEEP_POINTS"):
        # "steps,budget,refine,window,m_cap[,keep[,gsl,rkeep[,smult[,stage2]]]]"
        # ;-separated override for ad-hoc sweeps (keep = two-phase
        # window_keep, lane layout; gsl/rkeep = coarse_group /
        # coarse_rows_keep, smult = select_mult dedup over-selection and
        # stage2 = staged-rerank exact budget, folded layout)
        points = tuple(
            tuple(int(v) for v in grp.split(","))
            for grp in os.environ["DEEP_POINTS"].split(";")
        )
    for pt in points:
        steps, budget, refine, cw, mc = pt[:5]
        keep = pt[5] if len(pt) > 5 else 0
        gsl = pt[6] if len(pt) > 6 else conf.coarse_group
        rkeep = pt[7] if len(pt) > 7 else conf.coarse_rows_keep
        smult = pt[8] if len(pt) > 8 else 1
        stage2 = pt[9] if len(pt) > 9 else 0
        kw = dict(steps=steps, query_ids=query_ids, probe_mode="margin",
                  probe_budget=budget, coarse_refine=refine,
                  coarse_window=cw, m_cap=mc, window_keep=keep,
                  coarse_group=gsl, rows_keep=rkeep, select_mult=smult,
                  stage2=stage2)
        try:
            forest.query(queries, **kw)                  # compile + warm
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                got, _ = forest.query(queries, **kw)
            dt = (time.perf_counter() - t0) / reps
            hits = sum(len(gt_sets[i] & set(int(v) for v in got[i]
                                            if v >= 0)) for i in range(NQ))
            rec = hits / (NQ * 10)
            print(f"steps{steps}_b{budget}_rf{refine}_w{cw}_m{mc}: {NQ/dt:.0f} qps "
                  f"recall {rec:.4f}", flush=True)
            point = {"steps": steps, "probe_mode": "margin",
                     "probe_budget": budget,
                     "coarse_refine": refine, "coarse_window": cw,
                     "m_cap": mc, "qps": round(NQ / dt),
                     "recall@10": round(rec, 4)}
            if keep:
                point["window_keep"] = keep
                point["head_pool"] = head_pool
            if layout != "lane":
                point["layout"] = layout
                point["coarse_group"] = gsl
                point["rows_keep"] = rkeep
                if smult != 1:
                    point["select_mult"] = smult
                if stage2:
                    point["stage2"] = stage2
            if conf.query_batch_size != 64:
                point["query_batch"] = conf.query_batch_size
            if conf.rerank_dtype != "float32":
                point["rerank_dtype"] = conf.rerank_dtype
            saf = os.environ.get("FOREST_SELECT_APPROX_FACTOR", "8")
            if saf != "8":
                point["select_approx_factor"] = int(saf)
            if overflow != 500:
                point["bucket_overflow"] = overflow
            out["points"].append(point)
        except Exception:
            import traceback
            traceback.print_exc()
            print(f"steps{steps}_rf{refine}_w{cw}_m{mc}: FAILED", flush=True)
    out["note"] = (f"{layout} cd={cd} coarse tier; synthetic clustered "
                   "corpus; exact GT; per-chip slice of the Deep-100M plan")
    stem = "hard8m_coarse" if hard else "deep8m_coarse"
    if layout != "lane":
        stem += "_fold"
    path = (f"results/{stem}.json" if cd == 16
            else f"results/{stem}_cd{cd}.json")
    try:  # keep prior sweep points (e.g. the window-scaling evidence)
        with open(path) as f:
            prior = json.load(f).get("points", [])
        seen = {tuple(sorted(p.items())) for p in out["points"]}
        out["points"] += [p for p in prior
                          if tuple(sorted(p.items())) not in seen]
    except (OSError, ValueError):
        pass
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
