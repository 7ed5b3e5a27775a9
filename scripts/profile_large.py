"""Per-stage query profiling at the 1.2M-corpus bench config (real TPU).

Times each pipeline stage with the EXACT bench shapes (B=64 chunks,
m_cap=32768, bf16 two-stage rerank) so optimization targets the true
bottleneck, plus an m_cap=8192 variant of the expensive stages to measure
the cap's cost share. Run: python scripts/profile_large.py [n_corpus]
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, n=10):
    import jax

    out = fn(*args)          # compile
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
    from similaritysearchbyrdf_tpu.index.forest import (
        RDFForest, _probe_hashes, gather_candidates, query_dense_many,
    )
    from similaritysearchbyrdf_tpu.index.bucket_table import (
        composite_keys, lookup_ranges,
    )
    from similaritysearchbyrdf_tpu.index.partitioner import (
        partition_of_hash, stepwise_patterns,
    )
    from similaritysearchbyrdf_tpu.ops.hashing import hash_dense
    from similaritysearchbyrdf_tpu.ops import rerank as rr
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    D, B, STEPS, M_CAP = 100, 64, 0, 32768
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

    t0 = time.perf_counter()
    forest = RDFForest(conf).fit(DenseBatch(np.arange(N, dtype=np.int32), x))
    print(f"fit+compile: {time.perf_counter()-t0:.1f}s", flush=True)
    state = forest.state
    layout = forest.layout
    q = jnp.asarray(x[:B])
    qids = jnp.arange(B, dtype=jnp.int32)

    out = {}
    t_hash = timeit(jax.jit(lambda qq: hash_dense(state.model, qq)), q)
    h = hash_dense(state.model, q)
    t_part = timeit(jax.jit(lambda hh: partition_of_hash(hh, state.part_proj)), h)
    home = partition_of_hash(h, state.part_proj)
    out["hash_ms"] = t_hash * 1e3
    out["part_ms"] = t_part * 1e3
    print(f"hash={t_hash*1e3:.2f}ms part={t_part*1e3:.2f}ms", flush=True)

    # lookup only
    patterns = jnp.asarray(stepwise_patterns(layout.partition_bits, STEPS))
    parts = home.astype(jnp.uint32)[..., None] ^ patterns[None, None, :]
    probes, pv = _probe_hashes(h, layout, True)
    pk = composite_keys(probes[:, :, None, :], parts[..., None].astype(jnp.int32), layout)
    l = h.shape[1]
    s = patterns.shape[0]
    p = probes.shape[-1]
    pk = pk.reshape(B, l * s * p)
    tof = jnp.repeat(jnp.arange(l, dtype=jnp.int32), s * p)
    t_lookup = timeit(jax.jit(lambda k: lookup_ranges(state.tables, k, tof)), pk)
    out["lookup_ms"] = t_lookup * 1e3
    print(f"lookup={t_lookup*1e3:.2f}ms (R={l*s*p})", flush=True)

    # big arrays are passed as jit ARGUMENTS, never closures: a closed-over
    # device array becomes an HLO constant and a 240MB constant can stall
    # the remote compile for tens of minutes
    gather_j = jax.jit(functools.partial(
        gather_candidates, layout=layout, steps=STEPS, multiprobe=True),
        static_argnames=("m_cap",))
    coarse_j = jax.jit(
        lambda lp, c, qq: rr.score_candidates(lp, c, qq, jnp.bfloat16))
    rerank_j = jax.jit(
        lambda lp, fp, c, qq: rr.rerank_dense_two_stage(
            lp, fp, c, qq, 10, dup_bound=l))
    for m_cap in (M_CAP, 8192):
        gj = functools.partial(gather_j, m_cap=m_cap)
        t_gather = timeit(gj, state.tables, h, home)
        cand, total = gj(state.tables, h, home)
        mean_c = float(jnp.mean(total))
        out[f"gather_ms_cap{m_cap}"] = t_gather * 1e3
        out[f"mean_cand_cap{m_cap}"] = mean_c
        print(f"gather(cap={m_cap})={t_gather*1e3:.2f}ms mean_cand={mean_c:.0f}",
              flush=True)

        t_coarse = timeit(coarse_j, state.corpus_lp, cand, q)
        out[f"coarse_score_ms_cap{m_cap}"] = t_coarse * 1e3
        print(f"  coarse_score={t_coarse*1e3:.2f}ms", flush=True)
        t_rerank = timeit(rerank_j, state.corpus_lp, state.corpus, cand, q)
        out[f"rerank_ms_cap{m_cap}"] = t_rerank * 1e3
        print(f"  rerank_total={t_rerank*1e3:.2f}ms", flush=True)

    # end-to-end anchor: 1024 queries through query_dense_many (bench path)
    nq = 1024
    qd = jnp.asarray(x[:nq])
    qide = jnp.arange(nq, dtype=jnp.int32)
    e2e = lambda: query_dense_many(
        state, qd, qide, layout, steps=STEPS, m_cap=M_CAP, k=10,
        multiprobe=True, exclude_self=True, chunk=B,
    )
    t_e2e = timeit(lambda _: e2e(), None, n=3)
    out["e2e_qps"] = nq / t_e2e
    print(f"e2e: {nq/t_e2e:.0f} qps ({t_e2e/ (nq//B) *1e3:.1f} ms/chunk)", flush=True)
    print("PROFILE " + json.dumps({k: round(v, 3) for k, v in out.items()}), flush=True)


if __name__ == "__main__":
    main()
