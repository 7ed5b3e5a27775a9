"""Isolate the 1.2M coarse-window query regression: current code vs the
dead-window skip disabled (live=None) vs unpadded-corpus exact stage.
Run: python scripts/check_1p2m_regress.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index.forest import RDFForest, query_dense_many
    from similaritysearchbyrdf_tpu.vectors import DenseBatch
    import similaritysearchbyrdf_tpu.ops.pallas.coarse_gather as cg

    n, d = 1_200_000, 100
    rng = np.random.default_rng(1234)
    centers = rng.normal(size=(20_000, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 20_000, n)] + 0.05 * rng.normal(size=(n, d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)
    conf = RDFConfig(
        vector_dim=d, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3,
        lsh_table=TableConfig(chain_length=32, bucket_overflow=500),
        query_batch_size=128, max_candidates=65536, top_k=10,
        coarse_dim=d, coarse_dtype="int8", coarse_refine=1024,
    )
    forest = RDFForest(conf).fit(DenseBatch(np.arange(n, dtype=np.int32), x))
    state, layout = forest.state, forest.layout
    print("fit done", flush=True)
    nq = 1024
    qd = jnp.asarray(x[:nq])
    qids = jnp.arange(nq, dtype=jnp.int32)
    kw = dict(layout=layout, steps=0, m_cap=conf.max_candidates, k=10,
              multiprobe=True, exclude_self=True, chunk=128,
              coarse_refine=conf.coarse_refine,
              coarse_window=conf.coarse_window)

    orig_kernel = cg.pallas_coarse_scores_aligned

    def no_live_kernel(cbt, q, t, b, w, grp=64, live=None, **kwargs):
        return orig_kernel(cbt, q, t, b, w, grp=grp, live=None, **kwargs)

    def timed(label):
        ids, _, _ = query_dense_many(state, qd, qids, **kw)
        jax.block_until_ready(ids)
        t0 = time.perf_counter()
        for _ in range(4):
            ids, _, _ = query_dense_many(state, qd, qids, **kw)
        jax.block_until_ready(ids)
        dt = (time.perf_counter() - t0) / 4
        print(f"{label}: {nq/dt:.0f} qps", flush=True)

    timed("current")
    cg.pallas_coarse_scores_aligned = no_live_kernel
    jax.clear_caches()
    timed("no_live_mask")
    cg.pallas_coarse_scores_aligned = orig_kernel
    # unpadded-corpus exact stage
    state2 = state._replace(corpus=state.corpus[:, :d])
    jax.clear_caches()
    ids, _, _ = query_dense_many(state2, qd, qids, **kw)
    jax.block_until_ready(ids)
    t0 = time.perf_counter()
    for _ in range(4):
        ids, _, _ = query_dense_many(state2, qd, qids, **kw)
    jax.block_until_ready(ids)
    dt = (time.perf_counter() - t0) / 4
    print(f"unpadded_corpus: {nq/dt:.0f} qps", flush=True)


if __name__ == "__main__":
    main()
