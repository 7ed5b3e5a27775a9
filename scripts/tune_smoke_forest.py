"""Smoke-shape forest tuning (VERDICT r4 item 3): apply the r4/r5 levers
(folded tier + run-coalescing + staged rerank + probe/window tuning) to the
EXACT bench.py workload (20k x 100d clustered, B-chunked query of 1000,
recall vs exact GT, self excluded) and find a >= 25k qps @ >= 0.98 recall
operating point for the driver metric. The forest number has been flat for
four rounds (14,987 -> 16,787) while every lever shipped at Deep scale
only; this sweep closes that gap.

Each (layout, cd, overflow, qb) tuple is one fit; refine/window/m_cap/gsl/
stage2/probe knobs are per-call overrides on the same fitted forest.

Run: timeout 5400 python scripts/tune_smoke_forest.py > /tmp/tune_smoke.log 2>&1
Writes/merges results/tune_smoke_forest.json.
"""

import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B  # noqa: E402


def main():
    B.wait_for_backend()
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index.forest import (
        RDFForest, query_dense_many)
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    x = B.make_data()
    ids = np.arange(B.N_CORPUS, dtype=np.int32)
    queries = x[:B.N_QUERY]
    qids = ids[:B.N_QUERY]
    xd = jnp.asarray(x)
    sims = jnp.asarray(queries) @ xd.T
    sims = sims.at[jnp.arange(B.N_QUERY), jnp.arange(B.N_QUERY)].set(
        -jnp.inf)
    _, gt = jax.lax.top_k(sims, B.TOP_K)
    gt = np.asarray(gt)
    gt_sets = [set(map(int, gt[i])) for i in range(B.N_QUERY)]

    out = {"workload": "bench.py smoke (20k x 100d, 1000 queries, top-10)",
           "points": []}

    # fit families: (layout, cd, overflow); query_batch is a per-point
    # knob (the fit does not depend on it)
    fits = [
        ("lane", 32, 500),
        ("folded", 16, 500),
    ]
    if os.environ.get("SMOKE_FITS"):
        fits = [
            (f.split(",")[0], int(f.split(",")[1]), int(f.split(",")[2]))
            for f in os.environ["SMOKE_FITS"].split(";")
        ]
    # per-fit points: (qb, steps, probe_mode, budget, refine, window,
    #                  m_cap, gsl, stage2). window/gsl/stage2 are ignored
    #                  by the lane layout (window -1 = block mode there).
    points = [
        (256, 0, "reference", 8, 512, -1, 4096, 8, 0),   # bench baseline
        (1024, 0, "reference", 8, 512, -1, 4096, 8, 0),
        (1024, 0, "margin", 8, 512, -1, 4096, 8, 0),
        (1024, 0, "margin", 8, 512, -1, 2048, 8, 0),
        (1024, 0, "margin", 16, 512, -1, 4096, 8, 0),
    ]
    fold_points = [
        (256, 0, "margin", 8, 1024, 64, 4096, 8, 0),
        (1024, 0, "margin", 8, 1024, 64, 4096, 8, 0),
        (1024, 0, "margin", 8, 2048, 64, 4096, 8, 0),
        (1024, 0, "margin", 8, 2048, 64, 4096, 8, 512),
        (1024, 0, "reference", 8, 1024, 64, 4096, 8, 0),
        (1024, 0, "margin", 16, 1024, 64, 4096, 8, 0),
    ]
    if os.environ.get("SMOKE_POINTS"):
        points = fold_points = [
            tuple(int(v) if v.lstrip("-").isdigit() else v
                  for v in grp.split(","))
            for grp in os.environ["SMOKE_POINTS"].split(";")]

    for layout, cd, overflow in fits:
        conf = RDFConfig(
            vector_dim=B.DIM, table_num=10, permutation_num=3,
            family_size=100, partition_bits=3,
            lsh_table=TableConfig(chain_length=32,
                                  bucket_overflow=overflow),
            query_batch_size=256, max_candidates=4096, top_k=B.TOP_K,
            seed=31258, coarse_dim=cd, coarse_dtype="int8",
            coarse_layout=layout, coarse_refine=512,
        )
        forest = RDFForest(conf).fit(DenseBatch(ids, x))
        print(f"fit {layout} cd{cd} of{overflow}", flush=True)

        for (qb, steps, pmode, budget, refine, win, m_cap, gsl, stage2) \
                in (fold_points if layout == "folded" else points):
            bs = qb
            pad = (-B.N_QUERY) % bs
            qd = jnp.asarray(np.pad(queries, ((0, pad), (0, 0))))
            qid_d = jnp.asarray(np.pad(qids, (0, pad), constant_values=-1))
            kw = dict(
                layout=forest.layout, steps=steps, m_cap=m_cap, k=B.TOP_K,
                multiprobe=True, exclude_self=True, chunk=bs,
                probe_mode=pmode, probe_budget=budget,
                coarse_refine=refine, coarse_window=win,
                coarse_group=gsl, rows_keep=0, stage2=stage2,
            )
            tag = (f"{layout[0]}{cd}_of{overflow}_qb{qb}_s{steps}"
                   f"_{pmode[0]}{budget}_rf{refine}_w{win}_m{m_cap}"
                   f"_g{gsl}_st{stage2}")
            try:
                got, _, _ = query_dense_many(forest.state, qd, qid_d, **kw)
                jax.block_until_ready(got)
                reps = 6
                t0 = time.perf_counter()
                for _ in range(reps):
                    got, _, _ = query_dense_many(
                        forest.state, qd, qid_d, **kw)
                jax.block_until_ready(got)
                dt = (time.perf_counter() - t0) / reps * (
                    B.N_QUERY / qd.shape[0])
                got_np = np.asarray(got)[:B.N_QUERY]
                rec = sum(
                    len(gt_sets[i] & set(int(v) for v in got_np[i]
                                         if v >= 0))
                    for i in range(B.N_QUERY)) / (B.N_QUERY * B.TOP_K)
                qps = B.N_QUERY / dt
                print(f"{tag}: {qps:.0f} qps recall {rec:.4f}", flush=True)
                out["points"].append({
                    "layout": layout, "coarse_dim": cd,
                    "bucket_overflow": overflow, "query_batch": qb,
                    "steps": steps, "probe_mode": pmode,
                    "probe_budget": budget, "coarse_refine": refine,
                    "coarse_window": win, "m_cap": m_cap,
                    "coarse_group": gsl, "stage2": stage2,
                    "qps": round(qps), "recall@10": round(rec, 4),
                })
                with open("/tmp/tune_smoke_partial.json", "w") as f:
                    json.dump(out, f, indent=1)
            except Exception:
                import traceback
                traceback.print_exc()
                print(f"{tag}: FAILED", flush=True)
        del forest
        import gc
        gc.collect()

    path = "results/tune_smoke_forest.json"
    try:
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
