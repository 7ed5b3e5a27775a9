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
