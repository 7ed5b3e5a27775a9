"""Isolated stage timings for the NEW blocked flatten at 1.2M (diagnosing
why e2e barely moved). Run: python scripts/profile_gather_r02.py
"""

import functools
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
    from similaritysearchbyrdf_tpu.index.forest import (
        RDFForest, _probe_hashes, gather_candidates,
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

    N, D, B = 1_200_000, 100, 64
    conf = RDFConfig(
        vector_dim=D, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3, lsh_table=TableConfig(chain_length=32, bucket_overflow=500),
        query_batch_size=B, max_candidates=32768, rerank_dtype="bfloat16",
    )
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(20_000, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 20_000, N)] + 0.05 * rng.normal(size=(N, D))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)
    forest = RDFForest(conf).fit(DenseBatch(np.arange(N, dtype=np.int32), x))
    state, layout = forest.state, forest.layout
    print("fit done", flush=True)

    q = jnp.asarray(x[:B])
    h = hash_dense(state.model, q)
    home = partition_of_hash(h, state.part_proj)

    gj = jax.jit(functools.partial(
        gather_candidates, layout=layout, steps=0, m_cap=32768,
        multiprobe=True))
    t = timeit(gj, state.tables, h, home)
    print(f"gather_new(cap=32768) = {t*1e3:.2f}ms", flush=True)
    cand, _ = gj(state.tables, h, home)

    # pure id-gather cost: same shape random gather from sorted_ids
    pos = jnp.asarray(
        rng.integers(0, N, size=(B, 32768)), dtype=jnp.int32)
    tabs = jnp.asarray(rng.integers(0, 30, size=(B, 32768)), dtype=jnp.int32)
    idg = jax.jit(lambda si, tt, pp: si[tt, pp])
    t = timeit(idg, state.tables.sorted_ids, tabs, pos)
    print(f"raw id gather [64,32768] = {t*1e3:.2f}ms", flush=True)

    # flatten WITHOUT the final id gather: time gather minus a variant that
    # returns pos/table instead (approximate by timing the dedup sorts alone)
    patterns = jnp.asarray(stepwise_patterns(layout.partition_bits, 0))
    parts = home.astype(jnp.uint32)[..., None] ^ patterns[None, None, :]
    probes, pv = _probe_hashes(h, layout, True)
    pk = composite_keys(probes[:, :, None, :], parts[..., None].astype(jnp.int32), layout)
    l = h.shape[1]
    s, p = patterns.shape[0], probes.shape[-1]
    pk = pk.reshape(B, l * s * p)
    tof = jnp.repeat(jnp.arange(l, dtype=jnp.int32), s * p)
    lj = jax.jit(lambda tb, k: lookup_ranges(tb, k, tof))
    t = timeit(lj, state.tables, pk)
    print(f"lookup = {t*1e3:.2f}ms", flush=True)

    # rerank at B=64 cap 32768
    rj = jax.jit(lambda lp, fp, c, qq: rr.rerank_dense_two_stage(
        lp, fp, c, qq, 10, dup_bound=l))
    t = timeit(rj, state.corpus_lp, state.corpus, cand, q)
    print(f"rerank = {t*1e3:.2f}ms", flush=True)
    cj = jax.jit(lambda lp, c, qq: rr.score_candidates(lp, c, qq, jnp.bfloat16))
    t = timeit(cj, state.corpus_lp, cand, q)
    print(f"coarse score = {t*1e3:.2f}ms", flush=True)
    sj = jax.jit(lambda sc, c: rr._select_top(sc, c, 320))
    sc = cj(state.corpus_lp, cand, q)
    t = timeit(sj, sc, cand)
    print(f"select_top(320) = {t*1e3:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
