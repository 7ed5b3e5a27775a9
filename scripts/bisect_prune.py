"""Transfer-free bisection of the TWO-PHASE Deep-8M window query
(`_prune_windows`): hash+probes → window flatten → phase-1 head scoring +
top-keep → pruned Pallas window scoring → select → id gather → exact.

Cumulative scalar-output prefixes (CLAUDE.md benchmarking pitfalls).
Knobs via env: PRUNE_KEEP (default 128), PRUNE_HP (64), PRUNE_WIN (512),
PRUNE_MCAP (262144), PRUNE_REFINE (8192).

Run: timeout 3600 python scripts/bisect_prune.py
"""

import json
import os
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

    N = int(os.environ.get("PRUNE_N", "8000000"))
    D, B = 96, 64
    M_CAP = int(os.environ.get("PRUNE_MCAP", "262144"))
    WIN = int(os.environ.get("PRUNE_WIN", "512"))
    KEEP = int(os.environ.get("PRUNE_KEEP", "128"))
    HP = int(os.environ.get("PRUNE_HP", "64"))
    REFINE = int(os.environ.get("PRUNE_REFINE", "8192"))
    BUDGET, STEPS, K = 16, 1, 10
    OVERFLOW = int(os.environ.get("DEEP_OVERFLOW", "2000"))
    conf = RDFConfig(
        vector_dim=D, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3, lsh_table=TableConfig(chain_length=32,
                                                bucket_overflow=OVERFLOW),
        query_batch_size=B, max_candidates=M_CAP, top_k=K,
        coarse_dim=16, coarse_dtype="int8", coarse_refine=REFINE,
        coarse_head_pool=HP,
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
    l = conf.total_tables

    def upto(stage):
        def run(tables, cbt, chead, cproj, corpus, row_ids, model,
                part_proj, qq, qi):
            h, margins = hash_dense_with_margins(model, qq)
            probes, probe_valid = F._probe_hashes_margin(
                h, margins, layout, BUDGET)
            home = partition_of_hash(h, part_proj)
            if stage == "hash+probes":
                return h.sum() + probes.sum() + home.sum()
            base_b, table_b2, start_b, end_b, total, bs = F.gather_blocks(
                tables, h, home, layout, STEPS, M_CAP, True,
                probes=probes, probe_valid=probe_valid, window=WIN)
            if stage == "flatten":
                return (base_b.sum() + table_b2.sum() + start_b.sum()
                        + end_b.sum() + total.sum())
            lanes = cbt.shape[2]
            cs = cproj.shape[1]
            g = lanes // cs
            q_low = (qq @ cproj).astype(jnp.bfloat16)
            q_seg = (
                jnp.stack(
                    [jnp.pad(q_low, ((0, 0), (s * cs, (g - 1 - s) * cs)))
                     for s in range(g)], axis=1)
                if g > 1 else None
            )
            base_b, table_b2, start_b, end_b = F._prune_windows(
                chead, HP, q_low, q_seg, base_b, table_b2, start_b,
                end_b, WIN, KEEP, g)
            if stage == "phase1":
                return (base_b.sum() + table_b2.sum() + start_b.sum()
                        + end_b.sum())
            scores, pos, table_slot = F._coarse_block_scores(
                cbt, cproj, qq, base_b, table_b2, end_b, bs,
                start_b=start_b, abs_starts=True)
            if stage == "coarse":
                return scores.sum() + pos.sum() + table_slot.sum()
            cap = tables.capacity
            m_slab = KEEP * WIN
            m2 = min(max(REFINE, (K + 1) * l), m_slab)
            # the PRODUCTION tournament + select (shared helpers — the old
            # bisect re-implemented select without the tournament and hit
            # the degenerate approx_max_k shape production avoids)
            scores, pos, table_slot = F._strided_tournament(
                scores, pos, table_slot, WIN, m_slab, m2, M_CAP, l, cap)
            if stage == "tourn":
                return scores.sum() + pos.sum() + table_slot.sum()
            t2, p2, sel_valid = F._select_m2(scores, pos, table_slot,
                                             m2, l, cap)
            if stage == "select":
                return t2.sum() + p2.sum()
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
    for stage in ("hash+probes", "flatten", "phase1", "coarse", "tourn",
                  "select", "idgather", "exact", "full"):
        fn = upto(stage)
        t = timeit(fn, state.tables, state.coarse_by_table,
                   state.coarse_head, state.coarse_proj,
                   state.corpus, state.row_ids, state.model, state.part_proj,
                   q, qids)
        outd[f"upto_{stage}_ms"] = round(t * 1e3, 2)
        outd[f"stage_{stage}_ms"] = round((t - prev) * 1e3, 2)
        prev = t
        print(f"upto {stage}: {t*1e3:.2f}ms", flush=True)
    outd["note"] = (f"B={B} chunk at m_cap={M_CAP} win={WIN} keep={KEEP} "
                    f"hp={HP} refine={REFINE} budget={BUDGET} steps={STEPS} "
                    f"overflow={OVERFLOW}; Deep-8M 96d; v5e")
    with open("results/bisect_prune.json", "w") as f:
        json.dump(outd, f, indent=1)
    print("BISECT " + json.dumps(outd), flush=True)


if __name__ == "__main__":
    main()
