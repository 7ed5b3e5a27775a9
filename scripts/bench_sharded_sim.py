"""Distributed DPF simulation (BASELINE.json config 5 direction).

Real Deep-100M needs a multi-chip slice (one v5e chip can't hold a 100M
corpus); this script validates the distributed forest mechanics on the
8-device virtual CPU mesh — per-shard builds, replicated queries,
shard-local candidate generation + re-rank, one all-gather top-k merge —
and reports per-shard scaling so multi-chip throughput can be projected
(per-chip work is constant in the number of shards; the merge moves
k·ndev rows over ICI).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     PALLAS_AXON_POOL_IPS= python scripts/bench_sharded_sim.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.ops.exact import exact_search
    from similaritysearchbyrdf_tpu.parallel.mesh import make_forest_mesh
    from similaritysearchbyrdf_tpu.parallel.sharded_forest import ShardedRDFForest
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    n, d, n_query = 64_000, 96, 256
    conf = RDFConfig(
        vector_dim=d, table_num=6, permutation_num=2, family_size=100,
        partition_bits=3, lsh_table=TableConfig(chain_length=32,
                                                bucket_overflow=500),
        query_batch_size=64, max_candidates=4096, top_k=10,
    )
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(2000, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 2000, n)] + 0.05 * rng.normal(size=(n, d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)
    ids = np.arange(n, dtype=np.int32)
    queries = x[:n_query]

    gt_ids, _ = exact_search(x, queries, k=10, exclude_self=True)

    for ndev in (2, 4, 8):
        if ndev > len(jax.devices()):
            continue
        mesh = make_forest_mesh(ndev)
        forest = ShardedRDFForest(conf, mesh=mesh)
        t0 = time.perf_counter()
        forest.fit(DenseBatch(ids, x))
        jax.block_until_ready(forest.state.sorted_keys)
        build_s = time.perf_counter() - t0
        forest.query(queries[:64], steps=0, query_ids=ids[:64])  # compile
        forest.query(queries, steps=0, query_ids=ids[:n_query])  # compile full
        t0 = time.perf_counter()
        got, _ = forest.query(queries, steps=0, query_ids=ids[:n_query])
        dt = time.perf_counter() - t0
        hits = sum(
            len(set(gt_ids[i].tolist()) & set(int(v) for v in got[i] if v >= 0))
            for i in range(n_query)
        )
        print(json.dumps({
            "bench": "sharded_sim", "shards": ndev,
            "rows_per_shard": n // ndev,
            "build_s": round(build_s, 2),
            "qps": round(n_query / dt, 1),
            "recall@10": round(hits / (n_query * 10), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
