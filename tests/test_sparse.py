"""Sparse forest path: hash/bucket/query semantics + front-end."""

import numpy as np

from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
from similaritysearchbyrdf_tpu.deploy.sparse import SparseRDFInit
from similaritysearchbyrdf_tpu.index.sparse_forest import SparseRDFForest
from similaritysearchbyrdf_tpu.vectors import SparseBatch, sparse_batch_from_rows


def _conf(**kw):
    base = dict(
        vector_dim=64,
        table_num=4,
        permutation_num=1,
        family_size=30,
        partition_bits=2,
        lsh_table=TableConfig(chain_length=10, bucket_overflow=16),
        query_batch_size=16,
        max_candidates=1024,
        feature_data_format="sparse",
        seed=11,
    )
    base.update(kw)
    return RDFConfig(**base)


def _sparse_clustered(rng, n=600, d=64, nnz=8, n_clusters=15):
    centers = [rng.choice(d, size=nnz, replace=False) for _ in range(n_clusters)]
    rows, ids = [], []
    for i in range(n):
        c = int(rng.integers(0, n_clusters))
        idx = np.sort(centers[c])
        val = 1.0 + 0.1 * rng.normal(size=nnz)
        rows.append((idx, val.astype(np.float64)))
        ids.append(i)
    return sparse_batch_from_rows(ids, d, rows, nnz_pad=nnz)


def test_sparse_fit_query_recall():
    rng = np.random.default_rng(0)
    batch = _sparse_clustered(rng)
    conf = _conf()
    forest = SparseRDFForest(conf).fit(batch)
    assert forest.size() == 600
    q = batch.slice(0, 32)
    ids, scores = forest.query(q, steps=1, query_ids=batch.ids[:32])
    dense = batch.densify().values
    sims = dense[:32] @ dense.T
    recall = 0.0
    for i in range(32):
        order = np.argsort(-sims[i], kind="stable")
        gt = [j for j in order if j != i][:10]
        recall += len(set(gt) & set(int(v) for v in ids[i] if v >= 0)) / 10
    assert recall / 32 > 0.4, recall / 32


def test_sparse_query_excludes_self():
    rng = np.random.default_rng(1)
    batch = _sparse_clustered(rng, n=300)
    forest = SparseRDFForest(_conf()).fit(batch)
    q = batch.slice(0, 8)
    ids, _ = forest.query(q, steps=0, query_ids=batch.ids[:8])
    for i in range(8):
        assert int(batch.ids[i]) not in set(int(v) for v in ids[i])


def test_sparse_front_end(tmp_path):
    # write a sparse file in the reference's text format
    rng = np.random.default_rng(2)
    batch = _sparse_clustered(rng, n=200)
    lines = []
    for i in range(batch.n):
        k = int(batch.lengths[i])
        idx = ",".join(str(int(x)) for x in batch.indices[i, :k])
        val = ",".join(repr(float(x)) for x in batch.values[i, :k])
        lines.append(f"({int(batch.ids[i])},{batch.size},[{idx}],[{val}])")
    p = tmp_path / "sparse.txt"
    p.write_text("\n".join(lines))

    front = SparseRDFInit()
    conf = _conf()
    front.initialize_rdf_hash_map(conf)
    loaded = front.new_fast_fit(str(p))
    assert loaded.n == 200
    res = front.query_single_key(0, steps=1)
    assert res is not None
    ids, precision, ms = front.top_k_and_precision_score(
        loaded, [set(range(10)) for _ in range(8)], conf, steps=1
    )
    assert ids.shape == (8, conf.top_k)
    assert 0.0 <= precision <= 1.0


def test_sparse_rerank_correct_dot():
    """The re-rank must compute the true sparse dot (NOT the reference's
    positional-zip sparse·dense bug, SURVEY.md §7(f))."""
    conf = _conf(table_num=2, lsh_table=TableConfig(chain_length=4, bucket_overflow=64))
    rows = [
        (np.array([0, 1]), np.array([1.0, 1.0])),
        (np.array([2, 3]), np.array([1.0, 1.0])),
        (np.array([0, 3]), np.array([2.0, 2.0])),
    ]
    batch = sparse_batch_from_rows([0, 1, 2], 64, rows, nnz_pad=4)
    forest = SparseRDFForest(conf).fit(batch)
    q = sparse_batch_from_rows([9], 64, [(np.array([0, 1]), np.array([1.0, 1.0]))],
                               nnz_pad=4)
    ids, scores = forest.query(q, steps=2, k=3)
    got = {int(i): float(s) for i, s in zip(ids[0], scores[0]) if i >= 0}
    # scores must match exact dots: id0 → 2.0, id2 → 2.0, id1 → 0 (likely
    # not even a candidate)
    if 0 in got:
        assert abs(got[0] - 2.0) < 1e-5
    if 2 in got:
        assert abs(got[2] - 2.0) < 1e-5


def test_sparse_coarse_tier_exhaustive_matches_classic():
    """Sparse coarse path with refine >= m_cap must match the classic
    sparse scoring path id-for-id."""
    import numpy as np

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index.sparse_forest import SparseRDFForest
    from similaritysearchbyrdf_tpu.vectors import SparseBatch

    rng = np.random.default_rng(9)
    n, dim, nnz = 600, 256, 16
    base = dict(
        vector_dim=dim, table_num=3, permutation_num=2, family_size=30,
        partition_bits=2, lsh_table=TableConfig(chain_length=12,
                                                bucket_overflow=16),
        query_batch_size=16, max_candidates=1024, top_k=8, seed=13,
    )
    supports = np.stack([rng.choice(dim, size=nnz, replace=False)
                         for _ in range(20)])
    assign = rng.integers(0, 20, n)
    idx = supports[assign].astype(np.int32)
    val = (0.5 + rng.random((n, nnz))).astype(np.float32)
    val /= np.linalg.norm(val, axis=1, keepdims=True)
    batch = SparseBatch(ids=np.arange(n, dtype=np.int32), size=dim,
                        indices=idx, values=val,
                        lengths=np.full(n, nnz, np.int32))
    qb = SparseBatch(ids=np.arange(16, dtype=np.int32), size=dim,
                     indices=idx[:16], values=val[:16],
                     lengths=np.full(16, nnz, np.int32))

    classic = SparseRDFForest(RDFConfig(**base)).fit(batch)
    co = SparseRDFForest(RDFConfig(**base, coarse_dim=64,
                                   coarse_refine=1024)).fit(batch)
    assert co.state.coarse_by_table is not None
    a, sa = classic.query(qb, steps=1, query_ids=np.arange(16))
    b, sb = co.query(qb, steps=1, query_ids=np.arange(16))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(sa, sb, rtol=1e-5)


def test_rerank_sparse_merge_matches_gather():
    """The sort-merge re-rank must score identically to the gather
    formulation (same dots, different op shape), including padded and
    zero-valued entries."""
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops import rerank as rr

    rng = np.random.default_rng(3)
    n, nnz, dim, b, m, nnzq, k = 50, 6, 64, 4, 16, 5, 5
    c_idx = np.stack([
        np.sort(rng.choice(dim, size=nnz, replace=False)) for _ in range(n)
    ]).astype(np.int32)
    c_val = rng.normal(size=(n, nnz)).astype(np.float32)
    # padding rows: trailing entries idx 0 / val 0 (the SparseBatch layout)
    c_idx[:, -2:] = 0
    c_val[:, -2:] = 0.0
    c_val[5, 1] = 0.0                       # a real zero value
    q_idx = np.stack([
        np.sort(rng.choice(dim, size=nnzq, replace=False)) for _ in range(b)
    ]).astype(np.int32)
    q_val = rng.normal(size=(b, nnzq)).astype(np.float32)
    q_idx[:, -1] = 0
    q_val[:, -1] = 0.0
    cand = rng.integers(-1, n, size=(b, m)).astype(np.int32)

    q_dense = np.zeros((b, dim), dtype=np.float32)
    for i in range(b):
        for j in range(nnzq):
            q_dense[i, q_idx[i, j]] += q_val[i, j]
    ids_a, sc_a = rr.rerank_sparse(
        jnp.asarray(c_idx), jnp.asarray(c_val), jnp.asarray(cand),
        jnp.asarray(q_dense), k,
    )
    ids_b, sc_b = rr.rerank_sparse_merge(
        jnp.asarray(c_idx), jnp.asarray(c_val), jnp.asarray(cand),
        jnp.asarray(q_idx), jnp.asarray(q_val), k,
    )
    np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids_b))
    np.testing.assert_allclose(np.asarray(sc_a), np.asarray(sc_b),
                               rtol=1e-5, atol=1e-6)


def test_sparse_front_end_distribution():
    """`getDtAndHtNumDistribution` on the sparse front-end — the
    introspection the dense front-end has (`SparsevectorRDFInit.scala:
    505-530`)."""
    rng = np.random.default_rng(5)
    batch = _sparse_clustered(rng, n=300)
    front = SparseRDFInit()
    conf = _conf()
    front.initialize_rdf_hash_map(conf)
    front.fit_batch(batch)
    dt, ht = front.get_dt_and_ht_num_distribution()
    assert dt.shape == (conf.num_data_partitions,)
    assert ht.shape == (1 << conf.partition_bits,)
    assert dt.sum() == 300
    np.testing.assert_allclose(ht.sum(), 300.0)
    # camelCase alias
    dt2, ht2 = front.getDtAndHtNumDistribution()
    np.testing.assert_array_equal(dt, dt2)


def test_sparse_similarity_threshold_filter():
    rng = np.random.default_rng(6)
    batch = _sparse_clustered(rng, n=300)
    base = SparseRDFForest(_conf()).fit(batch)
    ids0, sc0 = base.query(batch.slice(0, 8), steps=1)
    finite = np.isfinite(sc0)
    assert finite.any()
    thr = float(np.median(sc0[finite]))
    filt = SparseRDFForest(_conf(similarity_threshold=thr)).fit(batch)
    ids1, sc1 = filt.query(batch.slice(0, 8), steps=1)
    keep = sc0 >= thr
    np.testing.assert_array_equal(ids1, np.where(keep, ids0, -1))
    assert (sc1[~keep] == -np.inf).all()


def test_sparse_fit_from_device_resident_rows():
    """fit_sparse with device-resident COO rows must produce bit-identical
    state to host staging (steady-state refit path; mirrors the dense
    device-resident fit)."""
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.index.sparse_forest import fit_sparse

    rng = np.random.default_rng(44)
    n, dim, nnz = 600, 64, 8
    idx = np.stack([rng.choice(dim, size=nnz, replace=False)
                    for _ in range(n)]).astype(np.int32)
    val = rng.normal(size=(n, nnz)).astype(np.float32)
    val /= np.linalg.norm(val, axis=1, keepdims=True)
    conf = _conf(vector_dim=dim)
    host_b = SparseBatch(ids=np.arange(n, dtype=np.int32), size=dim,
                         indices=idx, values=val,
                         lengths=np.full(n, nnz, np.int32))
    host = fit_sparse(conf, host_b)
    dev_b = SparseBatch(ids=np.arange(n, dtype=np.int32), size=dim,
                        indices=jnp.asarray(idx), values=jnp.asarray(val),
                        lengths=np.full(n, nnz, np.int32))
    dev = fit_sparse(conf, dev_b, model=host.model,
                     part_proj=host.part_proj,
                     nb_pad=host.tables.bucket_keys.shape[1])
    np.testing.assert_array_equal(
        np.asarray(host.tables.sorted_keys),
        np.asarray(dev.tables.sorted_keys))
    np.testing.assert_array_equal(
        np.asarray(host.corpus_values), np.asarray(dev.corpus_values))
