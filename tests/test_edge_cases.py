"""Edge cases: wide layouts, dup bounds, cap overflow, degenerate data."""

import numpy as np
import jax.numpy as jnp

from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
from similaritysearchbyrdf_tpu.index.bucket_table import KeyLayout
from similaritysearchbyrdf_tpu.index.forest import RDFForest
from similaritysearchbyrdf_tpu.ops.rerank import dedup_topk, rerank_dense
from similaritysearchbyrdf_tpu.vectors import DenseBatch


def test_128_node_layout_truncates():
    """dirNodeSize=128 + partitionBits=3 would need 35 key bits; the deepest
    level is dropped (28 bits consumed → 21), keeping the key in 32 bits."""
    conf = RDFConfig(partition_bits=3,
                     lsh_table=TableConfig(dir_node_size=128))
    lay = KeyLayout.from_config(conf, conf.lsh_table)
    assert lay.bits_per_level == 7
    assert lay.num_levels == 3          # 4 in the reference; deepest dropped
    assert lay.total_bits == 3 + 4 + 21


def test_128_node_forest_works():
    conf = RDFConfig(
        vector_dim=16, table_num=2, permutation_num=1, family_size=20,
        partition_bits=3, lsh_table=TableConfig(dir_node_size=128,
                                                chain_length=12,
                                                bucket_overflow=8),
        query_batch_size=8, max_candidates=512,
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, 16)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    forest = RDFForest(conf).fit(DenseBatch(np.arange(200, dtype=np.int32), x))
    ids, scores = forest.query(x[:8], steps=0)
    assert ids.shape == (8, conf.top_k)


def test_dedup_topk_collapses_duplicates():
    cand = jnp.asarray(np.array([[3, 1, 3, 3, 2, -1, 1, 2]], dtype=np.int32))
    scores = jnp.asarray(
        np.array([[0.9, 0.5, 0.9, 0.9, 0.7, -np.inf, 0.5, 0.7]], dtype=np.float32)
    )
    ids, sc = dedup_topk(cand, scores, k=4)
    got = [int(v) for v in np.asarray(ids[0])]
    assert got[:3] == [3, 2, 1]
    assert got[3] == -1  # only 3 unique ids


def test_rerank_dense_dup_bound_recovers_unique_topk():
    """With dup_bound=L copies of each id, the unique top-k must survive the
    top-slice cut."""
    rng = np.random.default_rng(1)
    n, d, l = 50, 8, 5
    corpus = rng.normal(size=(n, d)).astype(np.float32)
    q = rng.normal(size=(1, d)).astype(np.float32)
    # candidate buffer: every id duplicated l times
    cand = np.repeat(np.arange(n, dtype=np.int32), l)[None, :]
    ids, scores = rerank_dense(
        jnp.asarray(corpus), jnp.asarray(cand), jnp.asarray(q), k=10, dup_bound=l
    )
    sims = (q @ corpus.T)[0]
    expect = np.argsort(-sims, kind="stable")[:10]
    np.testing.assert_array_equal(np.asarray(ids[0]), expect)
    assert len(set(np.asarray(ids[0]).tolist())) == 10


def test_identical_vectors_all_share_bucket():
    """Degenerate corpus: all points identical → one bucket chain at max
    depth; query must still return k distinct ids."""
    conf = RDFConfig(
        vector_dim=8, table_num=2, permutation_num=1, family_size=10,
        partition_bits=2, lsh_table=TableConfig(chain_length=8,
                                                bucket_overflow=4),
        query_batch_size=4, max_candidates=256, top_k=5,
    )
    x = np.tile(np.array([[1, 0, 0, 0, 0, 0, 0, 0]], np.float32), (50, 1))
    forest = RDFForest(conf).fit(DenseBatch(np.arange(50, dtype=np.int32), x))
    # multiprobe=False probes h itself (the sparse-style query): the shared
    # bucket must be found. (With multiprobe=True the reference itself only
    # reaches the home bucket when bitlength(h) >= 30 — a faithful quirk.)
    ids, _ = forest.query(x[:2], steps=0, multiprobe=False)
    for b in range(2):
        got = [int(v) for v in ids[b] if v >= 0]
        assert len(got) == len(set(got)) == 5


def test_cap_overflow_reported():
    """When candidates exceed max_candidates, n_candidates reports the cap
    (the 'no silent caps' contract)."""
    from similaritysearchbyrdf_tpu.index.forest import query_dense

    conf = RDFConfig(
        vector_dim=8, table_num=4, permutation_num=1, family_size=10,
        partition_bits=1, lsh_table=TableConfig(chain_length=4,
                                                bucket_overflow=500),
        query_batch_size=4, max_candidates=64, top_k=5,
    )
    rng = np.random.default_rng(2)
    x = rng.normal(size=(500, 8)).astype(np.float32)
    forest = RDFForest(conf).fit(DenseBatch(np.arange(500, dtype=np.int32), x))
    _, _, total = query_dense(
        forest.state, jnp.asarray(x[:4]), jnp.full((4,), -1, jnp.int32),
        forest.layout, steps=1, m_cap=64, k=5,
    )
    assert int(np.asarray(total).max()) == 64  # saturated and reported
