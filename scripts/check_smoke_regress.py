"""Smoke-shape regression guards: forest/flat QUERY qps floors and the
steady-state BUILD rate floor, plus the original coarse_dim bisect points.

Run: timeout 1800 python scripts/check_smoke_regress.py          # all
     timeout 1800 python scripts/check_smoke_regress.py floors   # guards only
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as B  # noqa: E402


def run_point(coarse_dim, with_recall=False, probe_mode="reference",
              probe_budget=8, query_batch=256):
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index.forest import (
        RDFForest, query_dense_many)
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    conf = RDFConfig(
        vector_dim=B.DIM, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3,
        lsh_table=TableConfig(chain_length=32, bucket_overflow=500),
        query_batch_size=query_batch, max_candidates=4096, top_k=B.TOP_K,
        seed=31258,
        coarse_dim=coarse_dim, coarse_dtype="int8", coarse_refine=512,
    )
    x = B.make_data()
    ids = np.arange(B.N_CORPUS, dtype=np.int32)
    queries = x[:B.N_QUERY]
    qids = ids[:B.N_QUERY]
    forest = RDFForest(conf)
    forest.fit(DenseBatch(ids, x))

    bs = conf.query_batch_size
    pad = (-B.N_QUERY) % bs
    qd = jnp.asarray(np.pad(queries, ((0, pad), (0, 0))))
    qid_d = jnp.asarray(np.pad(qids, (0, pad), constant_values=-1))
    kw = dict(layout=forest.layout, steps=0, m_cap=conf.max_candidates,
              k=B.TOP_K, multiprobe=True, exclude_self=True,
              chunk=conf.query_batch_size, coarse_refine=conf.coarse_refine,
              coarse_window=conf.coarse_window, probe_mode=probe_mode,
              probe_budget=probe_budget)
    got, _, _ = query_dense_many(forest.state, qd, qid_d, **kw)
    jax.block_until_ready(got)
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        got, _, _ = query_dense_many(forest.state, qd, qid_d, **kw)
    jax.block_until_ready(got)
    dt = (time.perf_counter() - t0) / reps
    qps = B.N_QUERY / (dt * B.N_QUERY / qd.shape[0])
    res = {"coarse_dim": coarse_dim, "qps": round(qps, 1),
           "window": conf.coarse_window}
    if with_recall:
        xd = jnp.asarray(x)
        sims = jnp.asarray(queries) @ xd.T
        sims = sims.at[jnp.arange(B.N_QUERY),
                       jnp.arange(B.N_QUERY)].set(-jnp.inf)
        _, gt = jax.lax.top_k(sims, B.TOP_K)
        gt = np.asarray(gt)
        got = np.asarray(got)[:B.N_QUERY]
        rec = np.mean([
            len(set(got[i]) & set(gt[i])) / B.TOP_K
            for i in range(B.N_QUERY)
        ])
        res["recall@10"] = round(float(rec), 4)
        if forest.state.coarse_by_table is not None:
            cbt = forest.state.coarse_by_table
            res["coarse_bytes_per_vector"] = round(
                cbt.size * cbt.dtype.itemsize / B.N_CORPUS, 1)
    return res


def run_build_floor(min_vps=120_000.0, reps=5):
    """Steady-state build-rate floor (VERDICT r3 item 1): best-of-`reps`
    warm fits from a DEVICE-RESIDENT corpus must stay above `min_vps`.
    The device work of the smoke fit is ~60 ms (results/bisect_fit.json
    -> ~330k v/s), but tunnel dispatch jitter puts green best-of-3 runs
    anywhere in 149k-262k (batch-66 measured 149.4k while bench.py
    measured 229.9k the same hour); 120k with 5 reps still trips on any
    real ~2x fit-path regression without flaking on rig jitter."""
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index.forest import RDFForest, fit_dense
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    conf = RDFConfig(
        vector_dim=B.DIM, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3,
        lsh_table=TableConfig(chain_length=32, bucket_overflow=500),
        query_batch_size=256, max_candidates=4096, top_k=B.TOP_K, seed=31258,
        coarse_dim=32, coarse_dtype="int8", coarse_refine=512,
    )
    x = B.make_data()
    ids = np.arange(B.N_CORPUS, dtype=np.int32)
    forest = RDFForest(conf).fit(DenseBatch(ids, x))
    nb_pad = forest.state.tables.bucket_keys.shape[1]
    xd = jnp.asarray(x)
    xd.block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        st = fit_dense(conf, DenseBatch(ids, xd), model=forest.model,
                       part_proj=forest.part_proj, nb_pad=nb_pad)
        jax.block_until_ready(st.tables.sorted_keys)
        best = min(best, time.perf_counter() - t0)
    vps = B.N_CORPUS / best
    res = {"build_vps_steady": round(vps, 1), "floor": min_vps,
           "ok": vps >= min_vps}
    assert vps >= min_vps, res
    return res


def run_query_floors(min_flat=140_000.0, min_forest=24_000.0):
    """Query-side qps floors (VERDICT r4 item 4): the bench.py flat and
    forest query programs at the smoke shape must stay above the floors.
    r5 measured flat 159.7k / forest 27.0k @ 0.9822 (margin-16 probes +
    the select-policy fix, results/tune_smoke_forest.json) — the floors
    leave ~11% headroom, so drift is tolerated but a real regression
    trips the assert. Run on TPU as part of the standard batch."""
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.flat import (
        build_flat_sketch, flat_topk)

    res_forest = run_point(32, probe_mode="margin", probe_budget=16,
                           query_batch=1024)
    x = B.make_data()
    ids = np.arange(B.N_CORPUS, dtype=np.int32)
    queries = x[:B.N_QUERY]
    qids = ids[:B.N_QUERY]
    xd = jnp.asarray(x)
    sketch, _ = build_flat_sketch(xd, "int8")
    row_ids_d = jnp.asarray(ids)
    pad = (-B.N_QUERY) % 1024
    qfd = jnp.asarray(np.pad(queries, ((0, pad), (0, 0))))
    qfid = jnp.asarray(np.pad(qids, (0, pad), constant_values=-1))
    f_ids, _ = flat_topk(sketch, xd, row_ids_d, qfd, qfid, B.TOP_K,
                         refine=128)
    jax.block_until_ready(f_ids)
    t0 = time.perf_counter()
    reps = 8
    for _ in range(reps):
        f_ids, _ = flat_topk(sketch, xd, row_ids_d, qfd, qfid, B.TOP_K,
                             refine=128)
    jax.block_until_ready(f_ids)
    flat_s = (time.perf_counter() - t0) / reps * (B.N_QUERY / qfd.shape[0])
    flat_qps = B.N_QUERY / flat_s
    res = {"flat_qps": round(flat_qps, 1), "flat_floor": min_flat,
           "forest_qps": res_forest["qps"], "forest_floor": min_forest,
           "ok": flat_qps >= min_flat and res_forest["qps"] >= min_forest}
    assert res["ok"], res
    return res


if __name__ == "__main__":
    B.wait_for_backend()
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "cd16":
        out = [run_point(16, with_recall=True),
               run_point(32, with_recall=True)]
    elif len(sys.argv) > 1 and sys.argv[1] == "build":
        out = [run_build_floor()]
    elif len(sys.argv) > 1 and sys.argv[1] == "floors":
        out = [run_query_floors(), run_build_floor()]
    else:
        out = [run_point(100), run_point(32), run_point(None),
               run_build_floor(), run_query_floors()]
    print(json.dumps(out))
