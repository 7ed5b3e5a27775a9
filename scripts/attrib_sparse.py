"""Stage attribution for the sparse forest at 1M×4096d/nnz64 (VERDICT r2
weak #4: 3,381 v/s build and 2,288 qps query, both unexplained).

Build stages are separate jit programs and time directly; query stages are
timed by cumulative scalar-output programs (the bisect pattern,
CLAUDE.md: output transfer poisons microbenches).

Run: timeout 5400 python scripts/attrib_sparse.py > /tmp/attrib_sparse.log 2>&1
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, reps=3):
    import jax

    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index.bucket_table import (KeyLayout,
                                                              build_tables)
    from similaritysearchbyrdf_tpu.index.sparse_forest import (
        SparseRDFForest, _keys_for_sparse_corpus, _sparse_coarse_build)
    from similaritysearchbyrdf_tpu.models.families import generate_model
    from similaritysearchbyrdf_tpu.index.partitioner import (
        generate_partition_projections)
    from similaritysearchbyrdf_tpu.vectors import SparseBatch

    n, dim, nnz, nq = 1_000_000, 4096, 64, 256
    rng = np.random.default_rng(3)
    n_clusters = 5000
    supports = np.stack([
        rng.choice(dim, size=nnz, replace=False) for _ in range(n_clusters)
    ])
    assign = rng.integers(0, n_clusters, n)
    idx = supports[assign].astype(np.int32)
    val = (0.8 + 0.2 * rng.random((n, nnz))).astype(np.float32)
    val /= np.linalg.norm(val, axis=1, keepdims=True)

    conf = RDFConfig(
        vector_dim=dim, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3, lsh_table=TableConfig(chain_length=32,
                                                bucket_overflow=500),
        query_batch_size=64, max_candidates=16384, top_k=10,
        coarse_dim=64, coarse_dtype="int8", coarse_refine=2048,
    )
    layout = KeyLayout.from_config(conf, conf.lsh_table)
    model = generate_model(conf)
    part_proj = generate_partition_projections(conf)

    out = {"n": n, "dim": dim, "nnz": nnz}
    chunk = conf.fit_batch_size
    npad = (n + chunk - 1) // chunk * chunk
    idx_p = np.zeros((npad, nnz), np.int32)
    val_p = np.zeros((npad, nnz), np.float32)
    idx_p[:n], val_p[:n] = idx, val
    valid = np.zeros(npad, bool)
    valid[:n] = True
    idx_d, val_d, valid_d = (jnp.asarray(idx_p), jnp.asarray(val_p),
                             jnp.asarray(valid))
    out["fit_chunk"] = chunk

    t = timed(lambda: _keys_for_sparse_corpus(
        model, part_proj, idx_d, val_d, valid_d, layout, chunk, dim))
    out["build_keys_s"] = round(t, 2)
    print(f"keys (hash+partition+composite): {t:.2f} s", flush=True)

    keys = _keys_for_sparse_corpus(model, part_proj, idx_d, val_d, valid_d,
                                   layout, chunk, dim)
    ids = jnp.broadcast_to(
        jnp.where(valid_d, jnp.arange(npad, dtype=jnp.int32), -1)[None, :],
        keys.shape)
    t = timed(lambda: build_tables(keys, ids, layout,
                                   conf.lsh_table.bucket_overflow))
    out["build_tables_s"] = round(t, 2)
    print(f"build_tables (sort+overflow rule): {t:.2f} s", flush=True)

    tables = build_tables(keys, ids, layout, conf.lsh_table.bucket_overflow)
    from similaritysearchbyrdf_tpu.index.forest import coarse_seg_width
    cs = coarse_seg_width(min(conf.coarse_dim, dim))
    p = (np.random.default_rng(7).normal(size=(dim, cs)) /
         np.sqrt(cs)).astype(np.float32)
    cp = jnp.asarray(p)
    t = timed(lambda: _sparse_coarse_build(cp, idx_d, val_d,
                                           tables.sorted_ids, chunk, True))
    out["build_coarse_s"] = round(t, 2)
    print(f"coarse tier (project+pack): {t:.2f} s", flush=True)

    # whole-fit wall for cross-checking (fresh forest, includes host pad)
    batch = SparseBatch(ids=np.arange(n, dtype=np.int32), size=dim,
                        indices=idx, values=val,
                        lengths=np.full(n, nnz, np.int32))
    forest = SparseRDFForest(conf)
    t0 = time.perf_counter()
    forest.fit(batch)
    jax.block_until_ready(forest.state.tables.sorted_keys)
    out["fit_total_s"] = round(time.perf_counter() - t0, 2)
    out["fit_vectors_per_sec"] = round(n / out["fit_total_s"], 1)
    print(f"fit total: {out['fit_total_s']:.2f} s "
          f"({out['fit_vectors_per_sec']:.0f} v/s)", flush=True)

    # ---- query attribution: cumulative scalar-output programs ----
    from similaritysearchbyrdf_tpu.index.sparse_forest import _hash_batch
    from similaritysearchbyrdf_tpu.index.partitioner import partition_of_hash
    from similaritysearchbyrdf_tpu.index.forest import (_coarse_block_scores,
                                                        gather_blocks)
    from similaritysearchbyrdf_tpu.ops import rerank as rerank_ops

    state = forest.state
    qi_d = jnp.asarray(idx[:nq])
    qv_d = jnp.asarray(val[:nq])
    qid_d = jnp.arange(nq, dtype=jnp.int32)
    m_cap = conf.max_candidates
    steps = 1

    def upto(stage):
        @jax.jit
        def prog(qi, qv, qid):
            h = _hash_batch(state.model, qi, qv, dim)
            home = partition_of_hash(h, state.part_proj)
            if stage == "hash":
                return h.sum() + home.sum()
            b, nnzq = qi.shape
            qd = jnp.zeros((b, dim), jnp.float32)
            rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, nnzq))
            qd = qd.at[rows, qi].add(qv)
            win = 64
            base_b, table_b2, start_b, end_b, total, bs_block = gather_blocks(
                state.tables, h, home, layout, steps, m_cap, False,
                window=win)
            if stage == "gather_blocks":
                return (base_b.sum() + table_b2.sum() + end_b.sum()
                        + total.sum())
            scores_c, pos, table_slot = _coarse_block_scores(
                state.coarse_by_table, state.coarse_proj, qd,
                base_b, table_b2, end_b, bs_block, start_b=start_b)
            if stage == "coarse":
                return scores_c.sum() + pos.sum()
            l = state.tables.num_tables
            cap = state.tables.capacity
            m2 = min(max(conf.coarse_refine, 11 * l), m_cap)
            vals, idxs = jax.lax.approx_max_k(scores_c, m2,
                                              recall_target=0.98)
            t2 = jnp.take_along_axis(table_slot, idxs, axis=1)
            p2 = jnp.take_along_axis(pos, idxs, axis=1)
            cand = state.tables.sorted_ids[
                jnp.clip(t2, 0, l - 1), jnp.clip(p2, 0, cap - 1)]
            cand = jnp.where(jnp.isfinite(vals) & (cand >= 0), cand, -1)
            if stage == "select":
                return cand.sum()
            rows_out, scores = rerank_ops.rerank_sparse_merge(
                state.corpus_indices, state.corpus_values, cand,
                qi, qv, 10, dup_bound=h.shape[1])
            return rows_out.sum() + scores.sum()

        return prog

    stages = ("hash", "gather_blocks", "coarse", "select", "rerank")
    prev = 0.0
    for st in stages:
        prog = upto(st)
        t = timed(lambda: prog(qi_d, qv_d, qid_d), reps=5)
        out[f"q_upto_{st}_s"] = round(t, 4)
        out[f"q_stage_{st}_ms"] = round((t - prev) * 1e3, 2)
        print(f"query upto {st}: {t*1e3:.1f} ms "
              f"(stage {1e3*(t-prev):.1f} ms, B={nq})", flush=True)
        prev = t

    with open("results/attrib_sparse.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
