"""Transfer-free bisection of the fused 1.2M query pipeline: time cumulative
prefixes of the pipeline, each ending in a scalar sum (array outputs ship
through the axon tunnel at ~0.3 GB/s and poison isolated stage timings).
Run: python scripts/bisect_query.py
"""

import functools
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
    from similaritysearchbyrdf_tpu.index.bucket_table import (
        composite_keys, lookup_ranges,
    )
    from similaritysearchbyrdf_tpu.index.partitioner import (
        partition_of_hash, stepwise_patterns,
    )
    from similaritysearchbyrdf_tpu.ops.hashing import hash_dense
    from similaritysearchbyrdf_tpu.ops import rerank as rr
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    N, D, B, M_CAP = 1_200_000, 100, 64, 32768
    if len(sys.argv) > 1:              # e.g. bisect_query.py 8000000 96
        N = int(sys.argv[1])
    if len(sys.argv) > 2:
        D = int(sys.argv[2])
    conf = RDFConfig(
        vector_dim=D, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3, lsh_table=TableConfig(chain_length=32, bucket_overflow=500),
        query_batch_size=B, max_candidates=M_CAP, rerank_dtype="bfloat16",
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

    def upto(stage):
        """Build a jitted fn(state_arrays..., q) -> scalar running the
        pipeline through `stage`."""

        def run(tables, corpus_lp, corpus, row_ids, model, part_proj, qq, qi):
            h = hash_dense(model, qq)
            if stage == "hash":
                return h.sum()
            home = partition_of_hash(h, part_proj)
            if stage == "part":
                return h.sum() + home.sum()
            b = h.shape[0]
            patterns = jnp.asarray(stepwise_patterns(layout.partition_bits, 0),
                                   dtype=jnp.uint32)
            s = patterns.shape[0]
            parts = home.astype(jnp.uint32)[..., None] ^ patterns[None, None, :]
            probes, pv = F._probe_hashes(h, layout, True)
            p = probes.shape[-1]
            pk = composite_keys(probes[:, :, None, :],
                                parts[..., None].astype(jnp.int32), layout)
            r = l * s * p
            pk = pk.reshape(b, r)
            tof = jnp.repeat(jnp.arange(l, dtype=jnp.int32), s * p)
            start, length = lookup_ranges(tables, pk, tof)
            valid_r = jnp.broadcast_to(pv[:, :, None, :], (b, l, s, p)).reshape(b, r)
            length = jnp.where(valid_r, length, 0)
            if stage == "lookup":
                return start.sum() + length.sum()
            if stage == "ranges":
                base_b, table_b2, _, end_b, total, _bs = F.gather_blocks(
                    tables, h, home, layout, 0, M_CAP, True
                )
                return (base_b.sum() + table_b2.sum() + end_b.sum()
                        + total.sum())
            if stage in ("flatten_nogather", "flatten_bar"):
                # gather_candidates body with the id gather isolated:
                # localize whether the in-context slowdown is the gather op
                # itself or its fusion with the flatten producers
                base_b, table_b2, _, end_b, total, bs = F.gather_blocks(
                    tables, h, home, layout, 0, M_CAP, True
                )
                mb_cap = M_CAP // bs
                mb = jnp.arange(mb_cap, dtype=jnp.int32)
                jj = jnp.arange(bs, dtype=jnp.int32)
                pos = (base_b[:, :, None] + (mb * bs)[None, :, None]
                       + jj[None, None, :]).reshape(h.shape[0], M_CAP)
                slot_end = jnp.repeat(end_b, bs, axis=1)
                if stage == "flatten_bar":
                    base_b, table_b2 = jax.lax.optimization_barrier(
                        (base_b, table_b2))
                    cand = F._gather_id_blocks(
                        tables.sorted_ids, base_b, table_b2, bs)
                else:
                    cand = pos * 3 + table_b2.repeat(bs, axis=1)
                cand = jnp.where((pos < slot_end) & (cand >= 0), cand, -1)
                return cand.sum() + total.sum()
            cand, total = F.gather_candidates(tables, h, home, layout, 0,
                                              M_CAP, True)
            if stage == "flatten":
                return cand.sum() + total.sum()
            cand2 = F._exclude_self(cand, row_ids, qi)
            coarse = rr.score_candidates(corpus_lp, cand2, qq, jnp.bfloat16)
            if stage == "coarse":
                return coarse.astype(jnp.float32).sum() + cand.sum()
            m2 = max(rr._dedup_width(M_CAP, 10, l), 128)
            s2, c2 = rr._select_top(coarse, cand2, m2)
            if stage == "select":
                return s2.astype(jnp.float32).sum() + c2.sum()
            exact = rr.score_candidates(corpus, c2, qq)
            ids_k, sc_k = rr.dedup_topk(c2, exact, 10)
            return ids_k.sum() + sc_k.sum()

        return jax.jit(run)

    prev = 0.0
    outd = {}
    import os
    stages = ("hash", "part", "lookup", "ranges", "flatten", "coarse",
              "select", "full")
    if os.environ.get("BISECT_STAGES"):
        stages = tuple(os.environ["BISECT_STAGES"].split(","))
    for stage in stages:
        fn = upto(stage)
        t = timeit(fn, state.tables, state.corpus_lp, state.corpus,
                   state.row_ids, state.model, state.part_proj, q, qids)
        outd[stage] = round(t * 1e3, 2)
        print(f"upto {stage}: {t*1e3:.2f}ms (+{(t-prev)*1e3:.2f})", flush=True)
        prev = t
    print("BISECT " + json.dumps(outd), flush=True)


if __name__ == "__main__":
    main()
