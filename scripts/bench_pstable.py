"""pStable (E2LSH) family end-to-end operating point on TPU — VERDICT r1
item 9: the reference's E2LSH comparison is a headline claim
(`/root/reference/README.md:7`), so commit a measured pStable recall/qps
artifact next to the angle-family curves. Config picked by a CPU param scan
(chain 10, w=2 maximized recall at 20k; small w = selective per-function
buckets). Multi-probe stays off: the compound hash is `Arrays.hashCode` of
the per-function ints (`PStableHashFamily.scala:122-143`), so bit flips of
the packed value are not meaningful probes.

Run: timeout 3600 python scripts/bench_pstable.py > /tmp/bench_pstable.log 2>&1
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    from similaritysearchbyrdf_tpu.config import (
        PStableConfig, RDFConfig, TableConfig,
    )
    from similaritysearchbyrdf_tpu.index.forest import RDFForest
    from similaritysearchbyrdf_tpu.ops.exact import exact_search
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    import os as _os

    N, D, NQ = 200_000, 100, 1000
    hard = _os.environ.get("PSTABLE_CORPUS", "easy") == "hard"
    if hard:
        from similaritysearchbyrdf_tpu.utils.datasets import hard_clustered

        x, queries = hard_clustered(N, D, n_queries=NQ, seed=7,
                                    n_centers=2000)
        gt, _ = exact_search(x, queries, k=10, exclude_self=False)
        query_ids = np.full(NQ, -1, np.int32)
    else:
        rng = np.random.default_rng(7)
        centers = rng.normal(size=(2000, D))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        x = centers[rng.integers(0, 2000, N)] + 0.05 * rng.normal(
            size=(N, D))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        x = x.astype(np.float32)
        queries = x[:NQ]
        gt, _ = exact_search(x, queries, k=10, exclude_self=True)
        query_ids = np.arange(NQ)
    gt = np.asarray(gt)

    out = {"corpus": ("pstable_hard200k" if hard else "pstable_200k"),
           "n": N, "dim": D, "family": "pStable",
           "points": []}
    # bucket size scales with N: selectivity (chain length) must grow with
    # the corpus or the candidate cap truncates whole buckets (the 20k-tuned
    # chain 10 collapsed to 0.41 recall at 200k).
    # Round-3 sweep (VERDICT r2 weak #5): establish the pStable CEILING —
    # the round-2 sweep stopped at w=2 and recall 0.79, so "angle dominates
    # E2LSH" rested on a 2-point w scan. Wider w = less selective
    # per-function buckets = bigger candidate sets (recall up, qps down).
    import os
    sweep = ((10, 2, 32768), (10, 3, 32768), (10, 4, 32768), (10, 6, 65536),
             (12, 3, 32768), (12, 4, 32768), (12, 6, 65536), (8, 3, 65536))
    if os.environ.get("PSTABLE_POINTS"):
        sweep = tuple(tuple(int(v) for v in grp.split(","))
                      for grp in os.environ["PSTABLE_POINTS"].split(";"))
    for cl, w, m_cap in sweep:
        conf = RDFConfig(
            vector_dim=D, table_num=10, permutation_num=3, family_size=100,
            partition_bits=3, family_name="pStable",
            pstable=PStableConfig(w=w),
            lsh_table=TableConfig(chain_length=cl, bucket_overflow=500),
            max_candidates=m_cap, query_batch_size=250,
        )
        forest = RDFForest(conf)
        t0 = time.perf_counter()
        forest.fit(DenseBatch(np.arange(N, dtype=np.int32), x))
        jax.block_until_ready(forest.state.tables.sorted_keys)
        build_s = time.perf_counter() - t0
        for steps in ((1,) if os.environ.get("PSTABLE_STEPS1_ONLY")
                      else (0, 1)):
            kw = dict(steps=steps, query_ids=query_ids, multiprobe=False)
            forest.query(queries, **kw)                  # compile + warm
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                got, _ = forest.query(queries, **kw)
            dt = (time.perf_counter() - t0) / reps
            hits = sum(len(set(gt[i].tolist()) & set(int(v) for v in got[i]
                                                     if v >= 0))
                       for i in range(NQ))
            rec = hits / (NQ * 10)
            print(f"chain{cl}_w{w}_cap{m_cap}_steps{steps}: {NQ/dt:.0f} qps "
                  f"recall {rec:.4f}", flush=True)
            out["points"].append(
                {"chain_length": cl, "w": w, "m_cap": m_cap, "steps": steps,
                 "build_s": round(build_s, 1),
                 "index_bytes_per_vector":
                     round(forest.index_bytes_per_vector(), 1),
                 "qps": round(NQ / dt), "recall@10": round(rec, 4)})
    out["note"] = ("synthetic clustered corpus; exact GT; multiprobe off "
                   "(hashCode-packed compound hash); v5e")
    path = ("results/pstable_hard.json" if hard
            else "results/pstable.json")
    try:   # keep prior sweep points across partial runs
        with open(path) as f:
            prior = json.load(f).get("points", [])
        seen = {(p["chain_length"], p["w"], p["m_cap"], p["steps"])
                for p in out["points"]}
        out["points"] += [
            p for p in prior
            if (p["chain_length"], p["w"], p["m_cap"], p["steps"]) not in seen
        ]
    except (OSError, ValueError, KeyError):
        pass
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
