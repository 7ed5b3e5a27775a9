"""Sparse bag-of-words benchmark (BASELINE.json config 4: the
SparsevectorRDFInit path — sparse hashing + sparse re-rank).

Synthetic zipf-ish BoW corpus with exact sparse ground truth on device.
Run: python scripts/bench_sparse.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def make_bow(n, vocab, nnz, n_topics, seed=11):
    """Topic-clustered bag-of-words: documents in a topic share most terms."""
    rng = np.random.default_rng(seed)
    topic_terms = [
        rng.choice(vocab, size=nnz * 3, replace=False) for _ in range(n_topics)
    ]
    rows = []
    for i in range(n):
        t = int(rng.integers(0, n_topics))
        idx = np.sort(rng.choice(topic_terms[t], size=nnz, replace=False))
        val = rng.lognormal(0.0, 0.3, size=nnz)
        val /= np.linalg.norm(val)
        rows.append((idx.astype(np.int32), val.astype(np.float64)))
    return rows


def main():
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index.sparse_forest import SparseRDFForest
    from similaritysearchbyrdf_tpu.ops.exact import exact_topk_sparse
    from similaritysearchbyrdf_tpu.vectors import sparse_batch_from_rows

    n, vocab, nnz, n_query = 200_000, 30_000, 64, 512
    conf = RDFConfig(
        vector_dim=vocab, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3,
        lsh_table=TableConfig(chain_length=32, bucket_overflow=500),
        query_batch_size=64, max_candidates=8192, top_k=10,
        feature_data_format="sparse", sparse_nnz_pad=nnz,
    )
    rows = make_bow(n, vocab, nnz, n_topics=4000)
    batch = sparse_batch_from_rows(np.arange(n), vocab, rows, nnz_pad=nnz)

    # exact GT: densified queries against the sparse corpus
    qb = batch.slice(0, n_query)
    q_dense = np.zeros((n_query, vocab), dtype=np.float32)
    for i in range(n_query):
        kq = int(qb.lengths[i])
        q_dense[i, qb.indices[i, :kq]] = qb.values[i, :kq]
    t0 = time.perf_counter()
    gt_ids, _ = exact_topk_sparse(
        jnp.asarray(batch.indices), jnp.asarray(batch.values),
        jnp.asarray(q_dense), k=10, exclude_diag_offset=0,
    )
    gt_ids = np.asarray(jax.block_until_ready(gt_ids))
    print(f"[sparse] exact GT: {time.perf_counter() - t0:.2f}s", flush=True)

    forest = SparseRDFForest(conf)
    t0 = time.perf_counter()
    forest.fit(batch)
    jax.block_until_ready(forest.state.tables.sorted_keys)
    build_s = time.perf_counter() - t0
    print(f"[sparse] build: {build_s:.2f}s ({n / build_s:.0f} vec/s)", flush=True)

    for steps in (0, 1):
        forest.query(qb, steps=steps, query_ids=batch.ids[:n_query])  # compile
        t0 = time.perf_counter()
        got, _ = forest.query(qb, steps=steps, query_ids=batch.ids[:n_query])
        dt = time.perf_counter() - t0
        hits = 0
        for i in range(n_query):
            hits += len(set(gt_ids[i].tolist())
                        & set(int(v) for v in got[i] if v >= 0))
        print(json.dumps({
            "bench": "sparse_bow_200k", "steps": steps,
            "qps": round(n_query / dt, 1),
            "recall@10": round(hits / (n_query * 10), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
