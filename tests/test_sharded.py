"""Mesh-sharded forest on the 8-device virtual CPU mesh: parity with the
single-device forest (the multi-chip testing tier the reference lacks
entirely — SURVEY.md §4 'Multi-node testing: None')."""

import numpy as np
import jax
import jax.numpy as jnp

from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
from similaritysearchbyrdf_tpu.index.forest import RDFForest
from similaritysearchbyrdf_tpu.parallel.mesh import make_forest_mesh
from similaritysearchbyrdf_tpu.parallel.sharded_forest import ShardedRDFForest
from similaritysearchbyrdf_tpu.vectors import DenseBatch


def _conf(**kw):
    base = dict(
        vector_dim=24,
        table_num=3,
        permutation_num=2,
        family_size=30,
        partition_bits=2,
        lsh_table=TableConfig(chain_length=12, bucket_overflow=16),
        query_batch_size=32,
        # parity with single-device needs the cap above the worst-case
        # candidate count: the sharded path caps per shard, the single path
        # caps globally
        max_candidates=8192,
        seed=7,
    )
    base.update(kw)
    return RDFConfig(**base)


def _data(rng, n=1200, d=24):
    centers = rng.normal(size=(30, d))
    x = centers[rng.integers(0, 30, n)] + 0.15 * rng.normal(size=(n, d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_dominates_single_device():
    """Per-shard buckets split shallower than one big index's (fewer points
    per shard fit the overflow rule earlier), so each shard's candidates are
    a superset of the single-index candidates restricted to that shard.
    Consequence: the merged top-k scores must dominate the single-device
    top-k scores elementwise — the guaranteed contract of data-sharded DPF
    (the paper's distributed nodes index their own subsets the same way)."""
    rng = np.random.default_rng(0)
    x = _data(rng)
    batch = DenseBatch(np.arange(len(x), dtype=np.int32), x)
    conf = _conf()

    sharded = ShardedRDFForest(conf).fit(batch)
    single = RDFForest(conf)
    single.model = sharded.model
    single.part_proj = sharded.part_proj
    single.fit(batch)

    for steps in (0, 1):
        ids_s, sc_s = sharded.query(x[:16], steps=steps, query_ids=np.arange(16))
        ids_1, sc_1 = single.query(x[:16], steps=steps, query_ids=np.arange(16))
        finite = np.isfinite(sc_1)
        assert (sc_s[finite] >= sc_1[finite] - 1e-5).all()


def test_sharded_on_smaller_mesh():
    rng = np.random.default_rng(1)
    x = _data(rng, n=700)
    batch = DenseBatch(np.arange(len(x), dtype=np.int32), x)
    conf = _conf()
    mesh = make_forest_mesh(4)
    sharded = ShardedRDFForest(conf, mesh=mesh).fit(batch)
    ids, scores = sharded.query(x[:8], steps=0, query_ids=np.arange(8))
    assert ids.shape == (8, conf.top_k)
    single = RDFForest(conf)
    single.model = sharded.model
    single.part_proj = sharded.part_proj
    single.fit(batch)
    ids1, sc1 = single.query(x[:8], steps=0, query_ids=np.arange(8))
    finite = np.isfinite(sc1)
    assert (scores[finite] >= sc1[finite] - 1e-5).all()
    # ids must be valid rows of the corpus
    assert (ids[ids >= 0] < 700).all()


def test_sharded_corpus_larger_than_queries():
    """Shards with zero candidates for a query must not poison the merge."""
    rng = np.random.default_rng(2)
    x = _data(rng, n=300)
    batch = DenseBatch(np.arange(len(x), dtype=np.int32), x)
    sharded = ShardedRDFForest(_conf()).fit(batch)
    ids, scores = sharded.query(x[:4], steps=0)
    assert (np.asarray(ids) >= -1).all()


def _sparse_data(rng, n=800, dim=128, nnz=12):
    from similaritysearchbyrdf_tpu.vectors import SparseBatch

    idx = np.stack([rng.choice(dim, size=nnz, replace=False) for _ in range(n)])
    val = rng.normal(size=(n, nnz)).astype(np.float32)
    val /= np.linalg.norm(val, axis=1, keepdims=True)
    return SparseBatch(
        ids=np.arange(n, dtype=np.int32), size=dim,
        indices=idx.astype(np.int32), values=val,
        lengths=np.full(n, nnz, np.int32),
    )


def test_sharded_sparse_matches_single():
    """Sharded sparse query (8 shards, all-gather merge) must return the
    same top-k sets as the single-device sparse forest — P7 over the sparse
    data format (SparsevectorRDFInit mirror)."""
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.index.bucket_table import KeyLayout
    from similaritysearchbyrdf_tpu.index.sparse_forest import SparseRDFForest
    from similaritysearchbyrdf_tpu.parallel.sharded_forest import (
        fit_sparse_sharded, make_sparse_query_fn)

    conf = _conf(vector_dim=128)
    rng = np.random.default_rng(11)
    batch = _sparse_data(rng)
    nq = 32
    queries_idx = batch.indices[:nq]
    queries_val = batch.values[:nq]

    single = SparseRDFForest(conf)
    single.fit(batch)
    from similaritysearchbyrdf_tpu.vectors import SparseBatch
    qb = SparseBatch(ids=np.arange(nq, dtype=np.int32), size=128,
                     indices=queries_idx, values=queries_val,
                     lengths=np.full(nq, batch.nnz_pad, np.int32))
    ids_single, sc_single = single.query(qb, steps=1,
                                         query_ids=np.arange(nq))

    mesh = make_forest_mesh(8)
    state, _ = fit_sparse_sharded(conf, batch, mesh,
                                  model=single.model,
                                  part_proj=single.part_proj)
    layout = KeyLayout.from_config(conf, conf.lsh_table)
    qfn = make_sparse_query_fn(mesh, layout, dim=128, steps=1,
                               m_cap=conf.max_candidates, k=conf.top_k)
    ids_sh, sc_sh, total = qfn(
        state, jnp.asarray(queries_idx), jnp.asarray(queries_val),
        jnp.arange(nq, dtype=jnp.int32))
    ids_sh = np.asarray(ids_sh)

    # same candidate semantics → same top-k id sets (per-query; order can
    # differ on exact score ties)
    for i in range(nq):
        a = set(int(v) for v in ids_single[i] if v >= 0)
        b = set(int(v) for v in ids_sh[i] if v >= 0)
        assert a == b, f"query {i}: {a} != {b}"


def test_sharded_coarse_tier_matches_classic():
    """Sharded query with the per-shard coarse tier (exhaustive refine)
    must equal the classic sharded scoring path."""
    from similaritysearchbyrdf_tpu.parallel.sharded_forest import (
        ShardedRDFForest)

    rng = np.random.default_rng(21)
    x = _data(rng, 1200)
    batch = DenseBatch(np.arange(1200, dtype=np.int32), x)

    classic = ShardedRDFForest(_conf(), mesh=make_forest_mesh(8), seed=3)
    classic.fit(batch)
    co = ShardedRDFForest(
        _conf(coarse_dim=24, coarse_refine=8192), mesh=make_forest_mesh(8),
        seed=3)
    co.fit(batch)
    assert co.state.coarse_by_table is not None

    a, sa = classic.query(x[:16], steps=1, query_ids=np.arange(16))
    b, sb = co.query(x[:16], steps=1, query_ids=np.arange(16))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(sa, sb, rtol=1e-5)


def test_sharded_window_prune_parity_and_overlap():
    """Two-phase window pruning under SPMD: with window_keep covering every
    live window and exhaustive refine, the pruned sharded query equals the
    unpruned one; with aggressive keep it still recovers most answers."""
    from similaritysearchbyrdf_tpu.parallel.sharded_forest import (
        ShardedRDFForest)

    rng = np.random.default_rng(41)
    x = _data(rng, 1200)
    batch = DenseBatch(np.arange(1200, dtype=np.int32), x)

    f = ShardedRDFForest(
        _conf(coarse_dim=24, coarse_refine=8192, coarse_window=64,
              coarse_head_pool=8),
        mesh=make_forest_mesh(8), seed=3)
    f.fit(batch)
    assert f.state.coarse_head is not None
    a, sa = f.query(x[:16], steps=1, query_ids=np.arange(16), window_keep=0)
    keep_all = f.conf.max_candidates // 64 - 1
    b, sb = f.query(x[:16], steps=1, query_ids=np.arange(16),
                    window_keep=keep_all)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(sa, sb, rtol=1e-5)

    c, _ = f.query(x[:16], steps=1, query_ids=np.arange(16), window_keep=16)
    hits = total = 0
    for i in range(16):
        ga = set(a[i][a[i] >= 0].tolist())
        gc = set(c[i][c[i] >= 0].tolist())
        hits += len(ga & gc)
        total += len(ga)
    assert hits / max(total, 1) > 0.85, hits / max(total, 1)


def test_sharded_folded_groupmax_dominates():
    """Slot-folded groupmax tier under SPMD (coarse_layout='folded'): with
    exhaustive refine (refine == m_cap ⇒ every live group is exactly
    re-ranked) the folded sharded candidates are a superset of the classic
    sharded path's bucket members, so merged scores must dominate both the
    classic sharded query and the single-chip folded query elementwise."""
    from similaritysearchbyrdf_tpu.parallel.sharded_forest import (
        ShardedRDFForest)

    rng = np.random.default_rng(51)
    x = _data(rng, 1200)
    batch = DenseBatch(np.arange(1200, dtype=np.int32), x)
    fconf = _conf(coarse_dim=16, coarse_layout="folded", coarse_window=256,
                  coarse_refine=8192)

    fold = ShardedRDFForest(fconf, mesh=make_forest_mesh(8), seed=3)
    fold.fit(batch)
    assert fold.state.coarse_folded is not None
    assert fold.state.coarse_by_table is None
    # fit-time ids128 cache must be populated per shard (advisor r3): the
    # folded id fetch otherwise re-pays the pad+retile relayout in-jit
    assert fold.state.ids128 is not None
    from similaritysearchbyrdf_tpu.index.forest import ids128_view
    np.testing.assert_array_equal(
        np.asarray(fold.state.ids128)[0],
        np.asarray(ids128_view(jnp.asarray(
            np.asarray(fold.state.sorted_ids)[0]))))
    classic = ShardedRDFForest(_conf(), mesh=make_forest_mesh(8), seed=3)
    classic.fit(batch)

    a, sa = fold.query(x[:16], steps=1, query_ids=np.arange(16))
    b, sb = classic.query(x[:16], steps=1, query_ids=np.arange(16))
    finite = np.isfinite(sb)
    assert (sa[finite] >= sb[finite] - 1e-5).all()

    # slot-level rerank under SPMD (rows_keep=2 at gsl==fold): must run
    # through the sharded path and return valid ids
    c, sc = fold.query(x[:16], steps=1, query_ids=np.arange(16),
                       rows_keep=2)
    assert (c[c >= 0] < 1200).all() and (c >= 0).any()

    single = RDFForest(fconf)
    single.model = fold.model
    single.part_proj = fold.part_proj
    single.fit(batch)
    c, sc = single.query(x[:16], steps=1, query_ids=np.arange(16))
    finite = np.isfinite(sc)
    assert (sa[finite] >= sc[finite] - 1e-5).all()
    assert (a[a >= 0] < 1200).all()


def test_sharded_margin_probes():
    """Margin-guided probing works through the sharded path."""
    from similaritysearchbyrdf_tpu.parallel.sharded_forest import (
        ShardedRDFForest)

    rng = np.random.default_rng(31)
    x = _data(rng, 800)
    f = ShardedRDFForest(_conf(), mesh=make_forest_mesh(8), seed=5)
    f.fit(DenseBatch(np.arange(800, dtype=np.int32), x))
    ids, _ = f.query(x[:16], steps=1, query_ids=np.arange(16),
                     probe_mode="margin", probe_budget=8)
    assert (ids >= 0).sum() > 0
