"""Sparse forest at 1M×4096d (nnz 64) with EXACT ground truth — replaces
the round-2 same-cluster-precision-only artifact (VERDICT r2 weak #4).

Same corpus as round 2 (seed 3 support-clustered BoW, the
make_results.sparse_row recipe) so build/query compare directly; adds
recall@10 vs exact sparse GT at multiple operating points (steps ×
coarse_refine) and the sparse-flat engine row for context.

Run: timeout 7200 python scripts/bench_sparse_1m.py > /tmp/sparse1m.log 2>&1
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index.sparse_forest import SparseRDFForest
    from similaritysearchbyrdf_tpu.ops.exact import exact_topk_sparse
    from similaritysearchbyrdf_tpu.vectors import SparseBatch

    n, dim, nnz, nq = 1_000_000, 4096, 64, 1024
    rng = np.random.default_rng(3)
    n_clusters = 5000
    supports = np.stack([
        rng.choice(dim, size=nnz, replace=False) for _ in range(n_clusters)
    ])
    assign = rng.integers(0, n_clusters, n)
    idx = supports[assign].astype(np.int32)
    val = (0.8 + 0.2 * rng.random((n, nnz))).astype(np.float32)
    val /= np.linalg.norm(val, axis=1, keepdims=True)

    cache = "/tmp/sparse1m_gt.npz"
    try:
        gt = np.load(cache)["gt"]
        print("GT: cached", flush=True)
    except Exception:
        t0 = time.perf_counter()
        qd = np.zeros((nq, dim), np.float32)
        np.put_along_axis(qd, idx[:nq], val[:nq], axis=1)
        gt = []
        for s0 in range(0, nq, 256):
            g, _ = exact_topk_sparse(
                jnp.asarray(idx), jnp.asarray(val),
                jnp.asarray(qd[s0:s0 + 256]), 10, exclude_diag_offset=s0,
            )
            gt.append(np.asarray(g))
        gt = np.concatenate(gt)
        np.savez(cache, gt=gt)
        print(f"GT: {time.perf_counter()-t0:.1f}s", flush=True)
    gt_sets = [set(map(int, gt[i])) for i in range(nq)]

    batch = SparseBatch(ids=np.arange(n, dtype=np.int32), size=dim,
                        indices=idx, values=val,
                        lengths=np.full(n, nnz, np.int32))
    conf = RDFConfig(
        vector_dim=dim, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3, lsh_table=TableConfig(chain_length=32,
                                                bucket_overflow=500),
        query_batch_size=64, max_candidates=16384, top_k=10,
        coarse_dim=64, coarse_dtype="int8", coarse_refine=2048,
    )
    forest = SparseRDFForest(conf)
    t0 = time.perf_counter()
    forest.fit(batch)
    jax.block_until_ready(forest.state.tables.sorted_keys)
    build_cold_s = time.perf_counter() - t0
    # the round-2 "3,381 v/s" was COLD build = mostly remote jit compiles
    # (~1-4 min/program through the tunnel); the warm rate is the engine's
    # real throughput (attrib_sparse: device stages are ~1.7 s total)
    t0 = time.perf_counter()
    forest.fit(batch)
    jax.block_until_ready(forest.state.tables.sorted_keys)
    build_s = time.perf_counter() - t0
    print(f"build: cold {build_cold_s:.1f}s, warm {build_s:.1f}s "
          f"({n/build_s:.0f} v/s)", flush=True)

    qb = batch.slice(0, nq)
    out = {"corpus": "sparse_1m_4096d_nnz64", "n": n,
           "build_cold_s": round(build_cold_s, 1),
           "build_s": round(build_s, 1),
           "build_vectors_per_sec": round(n / build_s, 1),
           "points": []}
    cases = ((0, 2048), (1, 2048), (1, 8192))
    if os.environ.get("SPARSE_POINTS"):
        cases = tuple(tuple(int(v) for v in grp.split(","))
                      for grp in os.environ["SPARSE_POINTS"].split(";"))
    for steps, crefine in cases:
        forest.conf = conf.replace(coarse_refine=crefine)
        forest.query(qb, steps=steps, query_ids=np.arange(nq))   # compile
        t0 = time.perf_counter()
        ids, _ = forest.query(qb, steps=steps, query_ids=np.arange(nq))
        dt = time.perf_counter() - t0
        hits = sum(len(gt_sets[i] & set(int(v) for v in ids[i] if v >= 0))
                   for i in range(nq))
        rec = hits / (nq * 10)
        # same-cluster precision kept for round-2 comparability
        got_all, prec_hit, prec_tot = 0, 0, 0
        for i in range(nq):
            got = [int(v) for v in ids[i] if v >= 0]
            prec_tot += len(got)
            prec_hit += sum(1 for g in got if assign[g] == assign[i])
        print(f"steps{steps}_rf{crefine}: {nq/dt:.0f} qps recall "
              f"{rec:.4f}", flush=True)
        out["points"].append(
            {"steps": steps, "coarse_refine": crefine,
             "qps": round(nq / dt, 1), "recall@10": round(rec, 4),
             "same_cluster_precision": round(prec_hit / max(prec_tot, 1),
                                             4)})
    out["note"] = ("exact sparse GT (sort-merge dot); support-clustered "
                   "BoW seed 3; single warmed pass per point; v5e")
    with open("results/sparse_1m.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
