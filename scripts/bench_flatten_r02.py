"""TPU check of the blocked flatten at 1.2M: e2e QPS + recall at the main
operating points, plus the candidate duplicate factor (to size a potential
dedup-before-score rerank). Run: python scripts/bench_flatten_r02.py
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
    from similaritysearchbyrdf_tpu.index.forest import (
        RDFForest, gather_candidates, query_dense_many,
    )
    from similaritysearchbyrdf_tpu.index.partitioner import partition_of_hash
    from similaritysearchbyrdf_tpu.ops.exact import exact_search
    from similaritysearchbyrdf_tpu.ops.hashing import hash_dense
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
    )
    t0 = time.perf_counter()
    forest = RDFForest(conf).fit(DenseBatch(np.arange(N, dtype=np.int32), x))
    print(f"fit: {time.perf_counter()-t0:.1f}s", flush=True)
    state, layout = forest.state, forest.layout
    qd = jnp.asarray(queries)
    qids = jnp.arange(NQ, dtype=jnp.int32)

    # duplicate factor of the candidate buffer
    import functools
    gj = jax.jit(functools.partial(
        gather_candidates, layout=layout, steps=0, m_cap=32768,
        multiprobe=True))
    h = hash_dense(state.model, qd[:64])
    home = partition_of_hash(h, state.part_proj)
    cand, total = gj(state.tables, h, home)
    cn = np.asarray(cand)
    uniq = [len(np.unique(cn[i][cn[i] >= 0])) for i in range(64)]
    nval = [(cn[i] >= 0).sum() for i in range(64)]
    print(f"DUP valid={np.mean(nval):.0f} unique={np.mean(uniq):.0f} "
          f"factor={np.mean(nval)/max(np.mean(uniq),1):.2f}", flush=True)

    configs = [
        dict(steps=0, probe_mode="reference", probe_budget=8, m_cap=32768, chunk=64),
        dict(steps=0, probe_mode="reference", probe_budget=8, m_cap=32768, chunk=128),
        dict(steps=1, probe_mode="margin", probe_budget=12, m_cap=16384, chunk=128),
    ]
    for cfg in configs:
        kw = dict(steps=cfg["steps"], m_cap=cfg["m_cap"], k=10,
                  multiprobe=True, exclude_self=True, chunk=cfg["chunk"],
                  probe_mode=cfg["probe_mode"], probe_budget=cfg["probe_budget"])
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
        print("BENCH " + json.dumps({**cfg, "qps": round(NQ / dt, 1),
                                     "recall@10": round(hits / (NQ * 10), 4)}),
              flush=True)


if __name__ == "__main__":
    main()
