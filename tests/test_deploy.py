"""Dense deploy front-end: reference API surface coverage
(`DensevectorRDFInit`-shaped workflow, mirrors `TestSingleRDFSuite.scala`)."""

import numpy as np

from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
from similaritysearchbyrdf_tpu.deploy.dense import DenseRDFInit
from similaritysearchbyrdf_tpu.vectors import DenseBatch


def _conf(**kw):
    base = dict(
        vector_dim=16,
        table_num=4,
        permutation_num=2,
        family_size=30,
        partition_bits=2,
        lsh_table=TableConfig(chain_length=10, bucket_overflow=32),
        query_batch_size=16,
        max_candidates=1024,
        top_k=5,
        seed=21,
    )
    base.update(kw)
    return RDFConfig(**base)


def _write_dense_file(tmp_path, n=300, d=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(10, d))
    x = centers[rng.integers(0, 10, n)] + 0.1 * rng.normal(size=(n, d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    lines = [
        f"[{i},[{','.join(repr(float(v)) for v in x[i])}]]" for i in range(n)
    ]
    p = tmp_path / "dense.txt"
    p.write_text("\n".join(lines))
    return str(p), x.astype(np.float32)


def test_full_workflow(tmp_path):
    path, x = _write_dense_file(tmp_path)
    front = DenseRDFInit()
    conf = _conf()
    front.initialize_rdf_hash_map(conf)
    batch = front.new_fast_fit(path)
    assert batch.n == 300

    # querySingleKey returns candidates excluding the key itself
    res = front.query_single_key(5, steps=1)
    assert res is not None and 5 not in res

    # queryBatch
    rs = front.query_batch([0, 1, 2], steps=0)
    assert len(rs) == 3

    # batched query by vectors
    ids, scores = front.new_multi_thread_query_batch(
        np.arange(20), x[:20], steps=1
    )
    assert ids.shape == (20, 5)

    # precision vs exact ground truth should be decent on clustered data
    sims = x[:20] @ x.T
    gt = []
    for i in range(20):
        order = [j for j in np.argsort(-sims[i], kind="stable") if j != i][:5]
        gt.append(set(order))
    out_ids, precision, ms = front.top_k_and_precision_score(
        batch, gt, conf, steps=1
    )
    assert precision > 0.4, precision
    assert ms > 0

    # distribution introspection
    dt, ht = front.get_dt_and_ht_num_distribution()
    assert dt.sum() == 300
    assert abs(ht.sum() - 300) < 1e-6

    front.clear_and_close()
    assert front.forest is None


def test_fit_then_multithread_fit_equivalence(tmp_path):
    """single vs 'multithread' fit must produce identical query results —
    the reference asserts this equivalence (`TestSingleRDFSuite.scala:36-61`)."""
    path, x = _write_dense_file(tmp_path, seed=1)
    conf = _conf()
    a, b = DenseRDFInit(), DenseRDFInit()
    a.initialize_rdf_hash_map(conf)
    b.initialize_rdf_hash_map(conf)
    a.new_fast_fit(path)
    b.new_multi_thread_fit(path)
    ia, _ = a.new_multi_thread_query_batch(np.arange(10), x[:10], steps=0)
    ib, _ = b.new_multi_thread_query_batch(np.arange(10), x[:10], steps=0)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))


def test_ground_truth_file(tmp_path):
    p = tmp_path / "gt.txt"
    p.write_text("[1, 2, 3, 4, 5]\n[6, 7, 8, 9, 10]\n")
    front = DenseRDFInit()
    gt = front.get_top_k_ground_truth(str(p), 3)
    assert gt[0] == {1, 2, 3}
    assert gt[1] == {6, 7, 8}


def test_query_batch_matches_single_key(tmp_path):
    """query_batch (one device call) must equal per-key query_single_key,
    including missing keys -> []."""
    import numpy as np

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.deploy.dense import DenseRDFInit
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    conf = RDFConfig(
        vector_dim=16, table_num=3, permutation_num=1, family_size=20,
        partition_bits=2, lsh_table=TableConfig(chain_length=10,
                                                bucket_overflow=16),
        query_batch_size=8, max_candidates=512, top_k=5, seed=3,
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, 16)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    front = DenseRDFInit()
    front.initializeRDFHashMap(conf)
    front.fit_batch(DenseBatch(np.arange(200, dtype=np.int32), x))
    keys = [3, 999, 17, 42]                       # 999 does not exist
    got = front.query_batch(keys, steps=1)
    want = [front.query_single_key(k, steps=1) or [] for k in keys]
    assert got == want
    assert got[1] == []


def test_multi_feature_merge_matches_dict_reference():
    """The vectorized multi-feature merge must equal the brute-force
    dict-accumulation semantics (sum of per-family weighted scores)."""
    import numpy as np

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.deploy.multi_feature import MultiFeatureRDFInit
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    conf = RDFConfig(
        vector_dim=12, table_num=2, permutation_num=1, family_size=16,
        partition_bits=2, lsh_table=TableConfig(chain_length=8,
                                                bucket_overflow=16),
        query_batch_size=8, max_candidates=512, top_k=4, seed=8,
    )
    rng = np.random.default_rng(1)
    front = MultiFeatureRDFInit(("a", "b"))
    front.initialize_multiple({"a": conf, "b": conf.replace(seed=9)})
    batches = {}
    for name in ("a", "b"):
        x = rng.normal(size=(150, 12)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        batches[name] = DenseBatch(np.arange(150, dtype=np.int32), x)
    front.new_multi_fast_fit(batches)
    queries = {n: batches[n].values[:8] for n in ("a", "b")}
    weights = {"a": 1.0, "b": 0.5}
    ids, scores = front.multi_feature_query(queries, steps=1, k=4,
                                            weights=weights)

    # dict reference over the same per-family results
    per_family = []
    for n in ("a", "b"):
        i_, s_ = front.forests[n].query(queries[n], steps=1, k=max(4 * 4, 32))
        per_family.append((i_, s_ * weights[n]))
    for b in range(8):
        agg = {}
        for i_, s_ in per_family:
            for i, s in zip(i_[b], s_[b]):
                if i >= 0 and np.isfinite(s):
                    agg[int(i)] = agg.get(int(i), 0.0) + float(s)
        want = sorted(agg.items(), key=lambda kv: -kv[1])[:4]
        got = [(int(i), float(s)) for i, s in zip(ids[b], scores[b]) if i >= 0]
        assert [i for i, _ in got] == [i for i, _ in want] or \
            sorted(round(s, 5) for _, s in got) == sorted(round(s, 5) for _, s in want)
        for (gi, gs), (wi, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-4
