"""TPU bench: table-ordered int8 coarse tier at the 1.2M config.
Run: python scripts/bench_coarse_r02.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index.forest import RDFForest, query_dense_many
    from similaritysearchbyrdf_tpu.ops.exact import exact_search
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    N, D, NQ = 1_200_000, 100, 1024
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(20_000, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 20_000, N)] + 0.05 * rng.normal(size=(N, D))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)
    queries = x[:NQ]

    t0 = time.perf_counter()
    gt_ids, _ = exact_search(x, queries, k=10, exclude_self=True)
    print(f"GT: {time.perf_counter()-t0:.1f}s", flush=True)
    gt_sets = [set(map(int, gt_ids[i])) for i in range(NQ)]

    conf = RDFConfig(
        vector_dim=D, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3, lsh_table=TableConfig(chain_length=32, bucket_overflow=500),
        query_batch_size=64, max_candidates=32768, rerank_dtype="bfloat16",
        coarse_dim=D, coarse_dtype="int8", coarse_refine=2048,
    )
    t0 = time.perf_counter()
    forest = RDFForest(conf).fit(DenseBatch(np.arange(N, dtype=np.int32), x))
    jax.block_until_ready(forest.state.coarse_by_table)
    print(f"fit(+coarse tier): {time.perf_counter()-t0:.1f}s", flush=True)
    state, layout = forest.state, forest.layout
    qd = jnp.asarray(queries)
    qids = jnp.arange(NQ, dtype=jnp.int32)

    configs = [
        dict(steps=0, chunk=128, coarse_refine=512, m_cap=65536),
        dict(steps=0, chunk=128, coarse_refine=1024, m_cap=65536),
        dict(steps=1, chunk=128, coarse_refine=1024, m_cap=65536,
             probe_mode="margin", probe_budget=12),
        dict(steps=1, chunk=128, coarse_refine=1024, m_cap=65536),
    ]
    for cfg in configs:
        kw = dict(steps=cfg["steps"], m_cap=cfg["m_cap"], k=10,
                  multiprobe=True,
                  exclude_self=True, chunk=cfg["chunk"],
                  coarse_refine=cfg["coarse_refine"],
                  probe_mode=cfg.get("probe_mode", "reference"),
                  probe_budget=cfg.get("probe_budget", 8))
        ids, _, _ = query_dense_many(state, qd, qids, layout, **kw)
        jax.block_until_ready(ids)
        t0 = time.perf_counter()
        for _ in range(3):
            ids, _, _ = query_dense_many(state, qd, qids, layout, **kw)
        jax.block_until_ready(ids)
        dt = (time.perf_counter() - t0) / 3
        ids_np = np.asarray(ids)
        hits = sum(len(gt_sets[i] & set(int(v) for v in ids_np[i] if v >= 0))
                   for i in range(NQ))
        print("COARSE " + json.dumps({**cfg, "qps": round(NQ / dt, 1),
                                      "recall@10": round(hits / (NQ * 10), 4)}),
              flush=True)


if __name__ == "__main__":
    main()
