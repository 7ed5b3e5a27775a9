"""Stage-by-stage query profiling on the current backend (TPU or CPU).

Times each pipeline stage separately with bench-shaped inputs so
optimization targets the true bottleneck. Run: python scripts/profile_query.py
"""

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

    N, D, B, STEPS = 20_000, 100, 256, 0
    conf = RDFConfig(
        vector_dim=D, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3, lsh_table=TableConfig(chain_length=32, bucket_overflow=500),
        query_batch_size=B, max_candidates=4096,
    )
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(512, D))
    x = centers[rng.integers(0, 512, N)] + 0.05 * rng.normal(size=(N, D))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)

    forest = RDFForest(conf).fit(DenseBatch(np.arange(N, dtype=np.int32), x))
    state = forest.state
    layout = forest.layout
    q = jnp.asarray(x[:B])
    qids = jnp.arange(B, dtype=jnp.int32)

    t_hash = timeit(jax.jit(lambda qq: hash_dense(state.model, qq)), q)
    h = hash_dense(state.model, q)
    t_part = timeit(jax.jit(lambda hh: partition_of_hash(hh, state.part_proj)), h)
    home = partition_of_hash(h, state.part_proj)

    gather_j = jax.jit(
        lambda hh, ho: gather_candidates(
            state.tables, hh, ho, layout, STEPS, conf.max_candidates, True
        )
    )
    t_gather = timeit(gather_j, h, home)
    cand, total = gather_j(h, home)
    print("mean candidates:", float(jnp.mean(total)), flush=True)

    t_dedup = timeit(jax.jit(rr.dedup_sorted), cand)
    cand_d = rr.dedup_sorted(cand)
    t_rerank = timeit(
        jax.jit(lambda c, qq: rr.rerank_dense(state.corpus, c, qq, 10)), cand_d, q
    )

    # finer: split gather into lookup and flatten
    patterns = jnp.asarray(stepwise_patterns(layout.partition_bits, STEPS))
    parts = home.astype(jnp.uint32)[..., None] ^ patterns[None, None, :]
    probes, pv = _probe_hashes(h, layout, True)
    pk = composite_keys(probes[:, :, None, :], parts[..., None].astype(jnp.int32), layout)
    l = h.shape[1]
    s = patterns.shape[0]
    p = probes.shape[-1]
    pk = pk.reshape(B, l * s * p)
    tof = jnp.repeat(jnp.arange(l, dtype=jnp.int32), s * p)
    t_lookup = timeit(
        jax.jit(lambda k: lookup_ranges(state.tables, k, tof)), pk
    )

    total_t = t_hash + t_part + t_gather + t_dedup + t_rerank
    print(f"B={B} stages (ms): hash={t_hash*1e3:.2f} part={t_part*1e3:.2f} "
          f"gather={t_gather*1e3:.2f} (lookup={t_lookup*1e3:.2f}) "
          f"dedup={t_dedup*1e3:.2f} rerank={t_rerank*1e3:.2f} "
          f"total={total_t*1e3:.2f} → {B/total_t:.0f} qps", flush=True)


if __name__ == "__main__":
    main()
