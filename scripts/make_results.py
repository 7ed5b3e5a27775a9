"""Generate the committed results artifacts (VERDICT r1 item 8): the
recall-vs-time operating-point curves — the framework's equivalent of the
reference's results.png (Fig. 5) — for the 20k smoke and 1.2M corpora, plus
a sparse-corpus row. Writes results/recall_time_{20k,1p2m}.json and
results/sparse_1m.json. Run on the real TPU: python scripts/make_results.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def clustered(n, d, n_clusters, noise, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, n_clusters, n)] + noise * rng.normal(size=(n, d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def curve(name, n, d, n_clusters, noise, conf, configs, n_query=1000):
    import jax

    from similaritysearchbyrdf_tpu.experiments.harness import (
        exact_ground_truth, recall_time_curve,
    )
    from similaritysearchbyrdf_tpu.index.forest import RDFForest
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    x = clustered(n, d, n_clusters, noise)
    queries = x[:n_query]
    gt = np.asarray(exact_ground_truth(x, queries, k=conf.top_k))
    forest = RDFForest(conf).fit(DenseBatch(np.arange(n, dtype=np.int32), x))
    pts = recall_time_curve(forest, queries, gt, configs=configs,
                            query_ids=np.arange(n_query))
    out = {
        "corpus": name, "n": n, "dim": d,
        "build_info": {"bytes_per_vector": forest.index_bytes_per_vector()},
        "points": [
            {**p, "qps": round(p["qps"], 1),
             "time_s_per_1000": round(p["time_s_per_1000"], 4),
             "recall": round(p["recall"], 4)} for p in pts
        ],
        "baseline_qps": 40.0,
        "note": "synthetic clustered corpus (zero-egress image); exact GT",
    }
    os.makedirs("results", exist_ok=True)
    fn = f"results/recall_time_{name}.json"
    with open(fn, "w") as f:
        json.dump(out, f, indent=1)
    print("WROTE", fn, flush=True)
    for p in out["points"]:
        print("  ", json.dumps(p), flush=True)


def sparse_row():
    import jax

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index.sparse_forest import SparseRDFForest
    from similaritysearchbyrdf_tpu.vectors import SparseBatch

    n, dim, nnz, nq = 1_000_000, 4096, 64, 1024
    rng = np.random.default_rng(3)
    # clustered sparse: cluster = shared index support + noisy values
    n_clusters = 5000
    supports = np.stack([
        rng.choice(dim, size=nnz, replace=False) for _ in range(n_clusters)
    ])
    assign = rng.integers(0, n_clusters, n)
    idx = supports[assign]
    val = (0.8 + 0.2 * rng.random((n, nnz))).astype(np.float32)
    val /= np.linalg.norm(val, axis=1, keepdims=True)
    batch = SparseBatch(ids=np.arange(n, dtype=np.int32), size=dim,
                        indices=idx.astype(np.int32), values=val,
                        lengths=np.full(n, nnz, np.int32))
    conf = RDFConfig(
        vector_dim=dim, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3, lsh_table=TableConfig(chain_length=32,
                                                bucket_overflow=500),
        query_batch_size=64, max_candidates=16384, top_k=10,
        coarse_dim=64, coarse_dtype="int8", coarse_refine=2048,
    )
    t0 = time.perf_counter()
    forest = SparseRDFForest(conf).fit(batch)
    import jax.numpy as jnp
    jax.block_until_ready(forest.state.tables.sorted_keys)
    build_s = time.perf_counter() - t0
    qb = SparseBatch(ids=np.arange(nq, dtype=np.int32), size=dim,
                     indices=idx[:nq].astype(np.int32), values=val[:nq],
                     lengths=np.full(nq, nnz, np.int32))
    forest.query(qb, steps=1, query_ids=np.arange(nq))   # compile
    t0 = time.perf_counter()
    ids, _ = forest.query(qb, steps=1, query_ids=np.arange(nq))
    dt = time.perf_counter() - t0
    # GT: same-cluster members are the true neighbors; recall vs exact dot
    # over a 100k sample is too costly sparse — measure same-cluster hit rate
    hit = 0
    tot = 0
    for i in range(nq):
        got = [int(v) for v in ids[i] if v >= 0]
        tot += len(got)
        hit += sum(1 for g in got if assign[g] == assign[i])
    out = {"corpus": "sparse_1m_4096d_nnz64", "n": n, "qps": round(nq / dt, 1),
           "build_vectors_per_sec": round(n / build_s, 1),
           "same_cluster_precision": round(hit / max(tot, 1), 4)}
    with open("results/sparse_1m.json", "w") as f:
        json.dump(out, f, indent=1)
    print("WROTE results/sparse_1m.json", json.dumps(out), flush=True)


def main():
    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig

    conf_20k = RDFConfig(
        vector_dim=100, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3, lsh_table=TableConfig(chain_length=32,
                                                bucket_overflow=500),
        query_batch_size=256, max_candidates=4096, top_k=10,
        coarse_dim=100, coarse_dtype="int8", coarse_refine=512, seed=31258,
    )
    curve("20k", 20_000, 100, 512, 0.05, conf_20k, [
        {"steps": 0, "multiprobe": False},
        {"steps": 0, "probe_mode": "margin", "probe_budget": 8},
        {"steps": 0},
        {"steps": 1},
    ])
    conf_12m = RDFConfig(
        vector_dim=100, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3, lsh_table=TableConfig(chain_length=32,
                                                bucket_overflow=500),
        # m_cap=65536 + auto aligned-window mode: the Pallas DMA coarse
        # gather runs at ~94 GB/s and windows eliminate flatten truncation
        query_batch_size=128, max_candidates=65536, top_k=10,
        coarse_dim=100, coarse_dtype="int8", coarse_refine=1024, seed=31258,
    )
    curve("1p2m", 1_200_000, 100, 20_000, 0.05, conf_12m, [
        {"steps": 0, "coarse_refine": 512},
        {"steps": 0},
        {"steps": 1},
        {"steps": 1, "probe_mode": "margin", "probe_budget": 12},
    ])
    sparse_row()


if __name__ == "__main__":
    main()
