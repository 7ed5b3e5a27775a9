"""Operating-point sweep at the 1.2M bench config: recall@10 + QPS per
(steps, probe_mode, probe_budget, m_cap, chunk). Picks the VERDICT-r1
target point (>=2000 QPS at recall >= 0.93). Run on the real TPU:
python scripts/sweep_1p2m.py
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

    conf = RDFConfig(
        vector_dim=D, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3, lsh_table=TableConfig(chain_length=32, bucket_overflow=500),
        query_batch_size=64, max_candidates=32768, rerank_dtype="bfloat16",
    )
    t0 = time.perf_counter()
    forest = RDFForest(conf).fit(DenseBatch(np.arange(N, dtype=np.int32), x))
    print(f"fit: {time.perf_counter()-t0:.1f}s", flush=True)
    state, layout = forest.state, forest.layout

    qd = jnp.asarray(queries)
    qids = jnp.arange(NQ, dtype=jnp.int32)
    gt_sets = [set(map(int, gt_ids[i])) for i in range(NQ)]

    configs = [
        dict(steps=0, probe_mode="reference", probe_budget=8, m_cap=32768, chunk=64),
        dict(steps=0, probe_mode="reference", probe_budget=8, m_cap=8192, chunk=256),
        dict(steps=1, probe_mode="margin", probe_budget=8, m_cap=8192, chunk=256),
        dict(steps=1, probe_mode="margin", probe_budget=12, m_cap=16384, chunk=128),
        dict(steps=1, probe_mode="margin", probe_budget=8, m_cap=4096, chunk=256),
        dict(steps=1, probe_mode="margin", probe_budget=10, m_cap=8192, chunk=256),
    ]
    for cfg in configs:
        kw = dict(steps=cfg["steps"], m_cap=cfg["m_cap"], k=10,
                  multiprobe=True, exclude_self=True, chunk=cfg["chunk"],
                  probe_mode=cfg["probe_mode"], probe_budget=cfg["probe_budget"])
        ids, _, _ = query_dense_many(state, qd, qids, layout, **kw)  # compile
        jax.block_until_ready(ids)
        t0 = time.perf_counter()
        for _ in range(3):
            ids, _, _ = query_dense_many(state, qd, qids, layout, **kw)
        jax.block_until_ready(ids)
        dt = (time.perf_counter() - t0) / 3
        ids_np = np.asarray(ids)
        hits = sum(len(gt_sets[i] & set(int(v) for v in ids_np[i] if v >= 0))
                   for i in range(NQ))
        rec = hits / (NQ * 10)
        print("SWEEP " + json.dumps({**cfg, "qps": round(NQ / dt, 1),
                                     "recall@10": round(rec, 4)}), flush=True)


if __name__ == "__main__":
    main()
