"""Transfer-free bisection of the Deep-8M WINDOW-mode coarse query at the
round-2 operating point (b16 margin probes, m_cap 262144, win 512,
refine 8192 — 446 qps @ recall 0.9242, results/deep8m_coarse.json).

Stages mirror `forest._query_dense_coarse`: hash+margin probes → window
flatten (`gather_blocks`) → Pallas window scoring → approx top-m2 select →
id gather + exact refine + dedup. Scalar outputs, cumulative prefixes
(CLAUDE.md benchmarking pitfalls).

Run: timeout 3600 python scripts/bisect_deep8m_window.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, n=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index import forest as F
    from similaritysearchbyrdf_tpu.index.partitioner import partition_of_hash
    from similaritysearchbyrdf_tpu.ops import rerank as rr
    from similaritysearchbyrdf_tpu.ops.hashing import hash_dense_with_margins
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    N, D, B = 8_000_000, 96, 64
    M_CAP, WIN, REFINE, BUDGET, STEPS, K = 262144, 512, 8192, 16, 1, 10
    conf = RDFConfig(
        vector_dim=D, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3, lsh_table=TableConfig(chain_length=32,
                                                bucket_overflow=500),
        query_batch_size=B, max_candidates=M_CAP, top_k=K,
        coarse_dim=16, coarse_dtype="int8", coarse_refine=REFINE,
    )
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(50_000, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 50_000, N)] + 0.05 * rng.normal(size=(N, D))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)
    forest = F.RDFForest(conf).fit(DenseBatch(np.arange(N, dtype=np.int32), x))
    state, layout = forest.state, forest.layout
    print("fit done", flush=True)
    q = jnp.asarray(x[:B])
    qids = jnp.arange(B, dtype=jnp.int32)
    l = state_tables_l = conf.total_tables
    cap_plus = None  # set in run via closure-free args

    def upto(stage):
        def run(tables, cbt, cproj, corpus, row_ids, model, part_proj,
                qq, qi):
            h, margins = hash_dense_with_margins(model, qq)
            probes, probe_valid = F._probe_hashes_margin(
                h, margins, layout, BUDGET)
            home = partition_of_hash(h, part_proj)
            if stage == "hash+probes":
                return h.sum() + probes.sum() + home.sum()
            if stage == "lookup":
                from similaritysearchbyrdf_tpu.index.bucket_table import (
                    lookup_ranges,
                )

                pk, tof, pv = F.probe_key_set(
                    h, home, layout, STEPS, True, probes, probe_valid)
                st, ln = lookup_ranges(tables, pk, tof)
                return st.sum() + ln.sum()
            base_b, table_b2, start_b, end_b, total, bs = F.gather_blocks(
                tables, h, home, layout, STEPS, M_CAP, True,
                probes=probes, probe_valid=probe_valid, window=WIN)
            if stage == "flatten":
                return (base_b.sum() + table_b2.sum() + start_b.sum()
                        + end_b.sum() + total.sum())
            scores, pos, table_slot = F._coarse_block_scores(
                cbt, cproj, qq, base_b, table_b2, end_b, bs,
                start_b=start_b, n_tables=tables.num_tables)
            if stage == "coarse":
                return scores.sum() + pos.sum() + table_slot.sum()
            cap = tables.capacity
            m2 = min(max(REFINE, (K + 1) * l), M_CAP)
            if stage == "select_tournament":
                # production prefilter: strided 4-way max tournament
                # (forest._query_dense_coarse) — O(n) passes, then the
                # approx select runs 4x narrower
                mb_n = M_CAP // WIN
                wq = WIN // 4
                s4 = scores.reshape(B, mb_n, 4, wq)
                am = jnp.argmax(s4, axis=2)
                onehot = (jax.lax.broadcasted_iota(
                    jnp.int32, (B, mb_n, 4, wq), 2) == am[:, :, None, :])
                sc2 = jnp.max(s4, axis=2).reshape(B, mb_n * wq)
                packed = table_slot * jnp.int32(cap + 1) + pos
                packed = jnp.sum(
                    jnp.where(onehot, packed.reshape(B, mb_n, 4, wq), 0),
                    axis=2).reshape(B, mb_n * wq)
                v3, i3 = jax.lax.approx_max_k(sc2, m2, recall_target=0.98)
                pk2 = jnp.take_along_axis(packed, i3, axis=1)
                return v3.sum() + pk2.sum()
            vals, idxs = jax.lax.approx_max_k(scores, m2, recall_target=0.98)
            t2 = jnp.take_along_axis(table_slot, idxs, axis=1)
            p2 = jnp.take_along_axis(pos, idxs, axis=1)
            sel_valid = jnp.isfinite(vals)
            if stage == "select":
                return t2.sum() + p2.sum() + vals.sum()
            cand2 = tables.sorted_ids[jnp.clip(t2, 0, l - 1),
                                      jnp.clip(p2, 0, cap - 1)]
            cand2 = jnp.where(sel_valid & (cand2 >= 0), cand2, -1)
            cand2 = F._exclude_self(cand2, row_ids, qi)
            if stage == "idgather":
                return cand2.sum()
            exact = rr.score_candidates(corpus, cand2, qq)
            if stage == "exact":
                return exact.sum()
            ids_k, sc_k = rr.dedup_topk(cand2, exact, K)
            return ids_k.sum() + sc_k.sum()

        return jax.jit(run)

    prev = 0.0
    outd = {}
    for stage in ("hash+probes", "lookup", "flatten", "coarse", "select",
                  "select_tournament", "idgather", "exact", "full"):
        fn = upto(stage)
        t = timeit(fn, state.tables, state.coarse_by_table, state.coarse_proj,
                   state.corpus, state.row_ids, state.model, state.part_proj,
                   q, qids)
        outd[f"upto_{stage}_ms"] = round(t * 1e3, 2)
        if stage not in ("lookup", "select_tournament"):
            outd[f"stage_{stage}_ms"] = round((t - prev) * 1e3, 2)
            prev = t
        print(f"upto {stage}: {t*1e3:.2f}ms", flush=True)
    outd["note"] = (f"B={B} chunk at m_cap={M_CAP} win={WIN} refine={REFINE} "
                    f"budget={BUDGET} steps={STEPS}; Deep-8M 96d; v5e")
    with open("results/bisect_deep8m_window.json", "w") as f:
        json.dump(outd, f, indent=1)
    print("BISECT " + json.dumps(outd), flush=True)


if __name__ == "__main__":
    main()
