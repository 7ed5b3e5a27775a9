"""Stage bisection of the SMOKE-shape lane coarse query (bench.py
workload: 20k x 100d, cd=32 lane tier, block mode, B-chunked) — cumulative
scalar-output prefixes, the bisect_query.py methodology. Finds where the
~49 ms/1024q chunk goes at the margin-16 operating point (batch-61:
20.9k qps @ 0.9822 — VERDICT item 3 wants >= 25k @ >= 0.98).

Env: SMK_B (chunk, default 1024), SMK_BUDGET (16), SMK_REFINE (512),
     SMK_MCAP (4096), SMK_CD (32), SMK_PROBE (margin|reference)
Run: timeout 1800 python scripts/bisect_smoke.py > /tmp/bisect_smoke.log 2>&1
Writes results/bisect_smoke.json (TPU) or /tmp (CPU).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import bench as BB  # noqa: E402


def timeit(fn, *args, n=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    BB.wait_for_backend()
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index import forest as F
    from similaritysearchbyrdf_tpu.ops import rerank as rr
    from similaritysearchbyrdf_tpu.ops.hashing import (
        hash_dense, hash_dense_with_margins)
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    B = int(os.environ.get("SMK_B", "1024"))
    budget = int(os.environ.get("SMK_BUDGET", "16"))
    refine = int(os.environ.get("SMK_REFINE", "512"))
    m_cap = int(os.environ.get("SMK_MCAP", "4096"))
    cd = int(os.environ.get("SMK_CD", "32"))
    pmode = os.environ.get("SMK_PROBE", "margin")
    steps = 0

    conf = RDFConfig(
        vector_dim=BB.DIM, table_num=10, permutation_num=3,
        family_size=100, partition_bits=3,
        lsh_table=TableConfig(chain_length=32, bucket_overflow=500),
        query_batch_size=B, max_candidates=m_cap, top_k=10, seed=31258,
        coarse_dim=cd, coarse_dtype="int8", coarse_refine=refine,
    )
    x = BB.make_data()
    forest = F.RDFForest(conf).fit(
        DenseBatch(np.arange(BB.N_CORPUS, dtype=np.int32), x))
    state, layout = forest.state, forest.layout
    print("fit done", flush=True)
    q = jnp.asarray(np.tile(x[:256], (max(1, B // 256), 1))[:B])
    qids = jnp.arange(B, dtype=jnp.int32)
    l = conf.total_tables
    k = 10

    def upto(stage):
        def run(tables, corpus, row_ids, model, part_proj, cproj, cbt,
                qq, qi):
            if pmode == "margin":
                h, margins = hash_dense_with_margins(model, qq)
                probes, probe_valid = F._probe_hashes_margin(
                    h, margins, layout, budget)
            else:
                h = hash_dense(model, qq)
                probes = probe_valid = None
            if stage == "hash":
                return h.sum() + (probes.sum() if probes is not None
                                  else jnp.uint32(0))
            home = F.partition_of_hash(h, part_proj)
            base_b, table_b2, start_b, end_b, total, bs_block = \
                F.gather_blocks(
                    tables, h, home, layout, steps, m_cap, True,
                    probes=probes, probe_valid=probe_valid, window=0)
            if stage == "blocks":
                return base_b.sum() + table_b2.sum() + total.sum()
            scores, pos, table_slot = F._coarse_block_scores(
                cbt, cproj, qq, base_b, table_b2, end_b, bs_block,
                start_b=None, abs_starts=False)
            if stage == "coarsescore":
                return scores.sum() + total.sum()
            cap = tables.capacity
            m2 = min(max(refine, (k + 1) * l), m_cap)
            scores, pos, table_slot = F._strided_tournament(
                scores, pos, table_slot, 0, m_cap, m2, m_cap, l, cap)
            t2, p2, sel_valid = F._select_m2(
                scores, pos, table_slot, m2, l, cap)
            if stage == "select":
                return t2.sum() + p2.sum()
            cand2 = tables.sorted_ids[
                jnp.clip(t2, 0, l - 1), jnp.clip(p2, 0, cap - 1)]
            cand2 = jnp.where(sel_valid & (cand2 >= 0), cand2, -1)
            if stage == "idgather":
                return cand2.sum() + total.sum()
            cand2 = F._exclude_self(cand2, row_ids, qi)
            exact = rr.score_candidates(corpus, cand2, qq)
            if stage == "score":
                return exact.sum() + cand2.sum()
            ids_k, sc_k = rr.dedup_topk(cand2, exact, k)
            return ids_k.sum() + sc_k.sum()

        return jax.jit(run)

    prev = 0.0
    outd = {"n": BB.N_CORPUS, "dim": BB.DIM, "b": B, "m_cap": m_cap,
            "refine": refine, "budget": budget, "probe_mode": pmode,
            "cd": cd}
    for stage in ("hash", "blocks", "coarsescore", "select", "idgather",
                  "score", "full"):
        fn = upto(stage)
        t = timeit(fn, state.tables, state.corpus, state.row_ids,
                   state.model, state.part_proj, state.coarse_proj,
                   state.coarse_by_table, q, qids)
        outd[f"upto_{stage}_ms"] = round(t * 1e3, 2)
        print(f"upto {stage}: {t*1e3:.2f}ms (+{(t-prev)*1e3:.2f})",
              flush=True)
        prev = t
    outd["note"] = (f"cumulative scalar-output prefixes; B={B} chunk; "
                    "lane block-mode coarse path; smoke corpus")
    dest = ("results/bisect_smoke.json"
            if jax.default_backend() == "tpu"
            else "/tmp/bisect_smoke_cpu.json")
    with open(dest, "w") as f:
        json.dump(outd, f, indent=1)
    print("BISECT " + json.dumps(outd), flush=True)


if __name__ == "__main__":
    main()
