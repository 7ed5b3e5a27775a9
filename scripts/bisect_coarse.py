"""Transfer-free bisection of the coarse-tier query pipeline at 1.2M
(scalar outputs; cumulative prefixes). Run: python scripts/bisect_coarse.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


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
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index import forest as F
    from similaritysearchbyrdf_tpu.index.partitioner import partition_of_hash
    from similaritysearchbyrdf_tpu.ops.hashing import hash_dense
    from similaritysearchbyrdf_tpu.ops import rerank as rr
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    N, D, B, M_CAP, REFINE = 1_200_000, 100, 128, 32768, 1024
    conf = RDFConfig(
        vector_dim=D, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3, lsh_table=TableConfig(chain_length=32, bucket_overflow=500),
        query_batch_size=B, max_candidates=M_CAP,
        coarse_dim=D, coarse_dtype="int8", coarse_refine=REFINE,
    )
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(20_000, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 20_000, N)] + 0.05 * rng.normal(size=(N, D))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)
    forest = F.RDFForest(conf).fit(DenseBatch(np.arange(N, dtype=np.int32), x))
    state, layout = forest.state, forest.layout
    print("fit done", flush=True)
    q = jnp.asarray(x[:B])
    qids = jnp.arange(B, dtype=jnp.int32)
    l = conf.total_tables
    cap = state.tables.capacity

    def upto(stage):
        def run(tables, cbt, cproj, corpus, row_ids, model, part_proj, qq, qi):
            h = hash_dense(model, qq)
            home = partition_of_hash(h, part_proj)
            if stage == "hash+part":
                return h.sum() + home.sum()
            base_b, table_b2, _sb, end_b, total, bs = F.gather_blocks(
                tables, h, home, layout, 0, M_CAP, True)
            if stage == "blocks":
                return base_b.sum() + table_b2.sum() + end_b.sum() + total.sum()
            scores, pos, table_slot = F._coarse_block_scores(
                cbt, cproj, qq, base_b, table_b2, end_b, bs)
            if stage == "coarse":
                return scores.sum() + pos.sum() + table_slot.sum()
            m2 = min(max(REFINE, 11 * l), M_CAP)
            payload = table_slot * jnp.int32(cap + 1) + pos
            neg_s, payload_s = jax.lax.sort((-scores, payload), dimension=1,
                                            num_keys=1)
            t2 = payload_s[:, :m2] // jnp.int32(cap + 1)
            p2 = payload_s[:, :m2] % jnp.int32(cap + 1)
            if stage == "select":
                return t2.sum() + p2.sum() + neg_s.sum()
            sel_valid = jnp.isfinite(-neg_s[:, :m2])
            cand2 = tables.sorted_ids[jnp.clip(t2, 0, l - 1),
                                      jnp.clip(p2, 0, cap - 1)]
            cand2 = jnp.where(sel_valid & (cand2 >= 0), cand2, -1)
            cand2 = F._exclude_self(cand2, row_ids, qi)
            exact = rr.score_candidates(corpus, cand2, qq)
            ids_k, sc_k = rr.dedup_topk(cand2, exact, 10)
            return ids_k.sum() + sc_k.sum()

        return jax.jit(run)

    prev = 0.0
    outd = {}
    for stage in ("hash+part", "blocks", "coarse", "select", "full"):
        fn = upto(stage)
        t = timeit(fn, state.tables, state.coarse_by_table, state.coarse_proj,
                   state.corpus, state.row_ids, state.model, state.part_proj,
                   q, qids)
        outd[stage] = round(t * 1e3, 2)
        print(f"upto {stage}: {t*1e3:.2f}ms (+{(t-prev)*1e3:.2f})", flush=True)
        prev = t
    print("BISECT_COARSE " + json.dumps(outd), flush=True)


if __name__ == "__main__":
    main()
