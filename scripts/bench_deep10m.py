"""Deep-10M single-chip bench: BASELINE config 5 feasibility at 1/10 scale.

The Deep-100M target (96d) runs sharded across a mesh (COVERAGE.md P7;
per-chip HBM math in parallel/mesh.py); this script validates the PER-CHIP slice of that
plan on the one real chip: a 96-dim corpus at 8-10M rows/chip — the same
rows-per-chip density as Deep-100M on a 16-chip v5e pod slice — with the
non-coarse bf16 two-stage rerank path (the per-table int8 coarse tier's
128-lane row padding costs 128 B/row/table, which at 10M rows x 30 tables
would be 38 GB; the coarse tier is a <=few-M-rows/chip tool).

Run: python scripts/bench_deep10m.py [n_millions]    (default 8)
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(n_m: int = 8):
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index.forest import RDFForest, query_dense_many
    from similaritysearchbyrdf_tpu.ops.exact import exact_search
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    N, D, NQ = n_m * 1_000_000, 96, 1024
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(50_000, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 50_000, N)] + 0.05 * rng.normal(size=(N, D))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)
    queries = x[:NQ]

    t0 = time.perf_counter()
    gt_cache = f"/tmp/deep{n_m}m_gt.npz"
    try:
        gt_ids = np.load(gt_cache)["gt"]
        print("GT: cached", flush=True)
    except Exception:
        gt_ids, _ = exact_search(x, queries, k=10, exclude_self=True)
        np.savez(gt_cache, gt=np.asarray(gt_ids))
        print(f"GT: {time.perf_counter()-t0:.1f}s", flush=True)
    gt_sets = [set(map(int, gt_ids[i])) for i in range(NQ)]

    conf = RDFConfig(
        vector_dim=D, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3, lsh_table=TableConfig(chain_length=32,
                                                bucket_overflow=500),
        query_batch_size=64, max_candidates=32768, top_k=10,
        rerank_dtype="bfloat16",
    )
    t0 = time.perf_counter()
    forest = RDFForest(conf).fit(DenseBatch(np.arange(N, dtype=np.int32), x))
    jax.block_until_ready(forest.state.tables.sorted_keys)
    build_s = time.perf_counter() - t0
    stats = jax.devices()[0].memory_stats() or {}
    hbm_gb = stats.get("bytes_in_use", 0) / 2**30
    print(f"build: {build_s:.1f}s ({N/build_s:.0f} vec/s), "
          f"{forest.index_bytes_per_vector():.0f} B/vec, HBM {hbm_gb:.1f} GiB",
          flush=True)

    state, layout = forest.state, forest.layout
    qd = jnp.asarray(queries)
    qids = jnp.arange(NQ, dtype=jnp.int32)
    rows = []
    for cfg in (
        dict(steps=0),
        dict(steps=1, probe_mode="margin", probe_budget=12),
        dict(steps=1, probe_mode="margin", probe_budget=12, m_cap=65536),
    ):
        kw = dict(steps=cfg["steps"],
                  m_cap=cfg.get("m_cap", conf.max_candidates), k=10,
                  multiprobe=True, exclude_self=True,
                  chunk=conf.query_batch_size,
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
        row = {**cfg, "qps": round(NQ / dt, 1),
               "recall@10": round(hits / (NQ * 10), 4)}
        rows.append(row)
        print("DEEP " + json.dumps(row), flush=True)

    out = {"corpus": f"deep{n_m}m_96d", "n": N, "dim": D,
           "build_s": round(build_s, 1),
           "build_vectors_per_sec": round(N / build_s, 1),
           "index_bytes_per_vector": round(forest.index_bytes_per_vector(), 1),
           "hbm_gib_after_build": round(hbm_gb, 2), "points": rows,
           "note": "synthetic clustered corpus; exact GT; per-chip slice of "
                   "the Deep-100M sharded plan"}
    with open(f"results/deep{n_m}m.json", "w") as f:
        json.dump(out, f, indent=1)
    print("WROTE results/deep" + str(n_m) + "m.json", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
