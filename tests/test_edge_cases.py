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


def test_unpacked_range_path_matches_packed():
    """The multi-operand-sort fallback (taken when capacity >= 2^25 would
    overflow the int32 range packing) must return bit-identical candidates
    to the packed path."""
    from similaritysearchbyrdf_tpu.index import forest as forest_mod
    from similaritysearchbyrdf_tpu.index.forest import gather_candidates
    from similaritysearchbyrdf_tpu.index.partitioner import partition_of_hash
    from similaritysearchbyrdf_tpu.ops.hashing import hash_dense

    conf = RDFConfig(
        vector_dim=16, table_num=4, permutation_num=2, family_size=32,
        partition_bits=3, lsh_table=TableConfig(chain_length=16,
                                                bucket_overflow=8),
        max_candidates=256,
    )
    rng = np.random.default_rng(5)
    x = rng.normal(size=(600, 16)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    forest = RDFForest(conf).fit(DenseBatch(np.arange(600, dtype=np.int32), x))
    st = forest.state
    h = hash_dense(st.model, jnp.asarray(x[:16]))
    home = partition_of_hash(h, st.part_proj)

    args = (st.tables, h, home, forest.layout, 1, 256, True)
    cand_p, tot_p = gather_candidates(*args)
    assert not forest_mod._FORCE_UNPACKED_RANGES
    try:
        forest_mod._FORCE_UNPACKED_RANGES = True
        cand_u, tot_u = gather_candidates(*args)
    finally:
        forest_mod._FORCE_UNPACKED_RANGES = False
    np.testing.assert_array_equal(np.asarray(tot_p), np.asarray(tot_u))
    np.testing.assert_array_equal(np.asarray(cand_p), np.asarray(cand_u))


def test_huge_capacity_candidates_correct():
    """capacity > 2^25 rows/table: start*64 and table*(cap+1) overflow int32,
    so the guard must route to the unpacked path and return the exact rows
    of the probed bucket (the Deep-100M regime, BASELINE configs[4])."""
    from similaritysearchbyrdf_tpu.index.bucket_table import (
        BucketTables, KeyLayout, composite_keys, _build_records,
    )
    from similaritysearchbyrdf_tpu.index.forest import gather_candidates

    layout = KeyLayout(partition_bits=3, seg_bits=4, bits_per_level=5,
                       num_levels=5, bucket_bits=28)
    cap = (1 << 25) + 1024
    tgt_start, tgt_len = 1 << 25, 512          # start*64 == 2^31: overflows
    part, seg, trie = 5, 9, 0x1ABCDEF
    h = np.uint32((seg << 28) | trie)
    key = int(np.asarray(composite_keys(
        jnp.asarray([h]), jnp.asarray([part], jnp.int32), layout))[0])

    sorted_keys = np.zeros(cap, np.uint32)
    sorted_keys[tgt_start:tgt_start + tgt_len] = key
    sorted_keys[tgt_start + tgt_len:] = 0xFFFFFFFF
    sorted_ids = np.arange(cap, dtype=np.int32)
    sorted_ids[tgt_start + tgt_len:] = -1
    nb_pad = 8
    bkeys = np.full(nb_pad, 0xFFFFFFFF, np.uint32)
    bstarts = np.full(nb_pad + 1, cap, np.int32)
    bshifts = np.zeros(nb_pad, np.uint32)
    bkeys[:3] = [0, key, 0xFFFFFFFF]
    bstarts[:3] = [0, tgt_start, tgt_start + tgt_len]
    tables = BucketTables(
        sorted_keys=jnp.asarray(sorted_keys)[None],
        sorted_ids=jnp.asarray(sorted_ids)[None],
        bucket_keys=jnp.asarray(bkeys)[None],
        bucket_starts=jnp.asarray(bstarts)[None],
        bucket_shifts=jnp.asarray(bshifts)[None],
    )
    tables = BucketTables(
        **{**{f.name: getattr(tables, f.name) for f in
              tables.__dataclass_fields__.values() if f.name != "records"},
           "records": _build_records(tables.bucket_keys, tables.bucket_starts,
                                     tables.bucket_shifts)},
    )
    hq = jnp.asarray([[h]], jnp.uint32)                  # [B=1, L=1]
    homeq = jnp.asarray([[part]], jnp.int32)
    cand, total = gather_candidates(
        tables, hq, homeq, layout, steps=0, m_cap=1024, multiprobe=False,
    )
    assert int(total[0]) == tgt_len
    got = np.asarray(cand[0])
    np.testing.assert_array_equal(
        got[:tgt_len], np.arange(tgt_start, tgt_start + tgt_len))
    assert (got[tgt_len:] == -1).all()


def test_coarse_unpacked_select_matches_packed():
    """The coarse path's top-m2 select falls back to a multi-operand sort
    at >=2^25-row capacities; both branches must answer identically."""
    from similaritysearchbyrdf_tpu.index import forest as forest_mod

    conf = RDFConfig(
        vector_dim=16, table_num=3, permutation_num=2, family_size=24,
        partition_bits=2, lsh_table=TableConfig(chain_length=12,
                                                bucket_overflow=16),
        query_batch_size=8, max_candidates=1024, top_k=6, seed=2,
        coarse_dim=16, coarse_refine=128,
    )
    rng = np.random.default_rng(8)
    x = rng.normal(size=(600, 16)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    forest = RDFForest(conf).fit(DenseBatch(np.arange(600, dtype=np.int32), x))
    st = forest.state

    args = (st, jnp.asarray(x[:8]), jnp.arange(8, dtype=jnp.int32),
            forest.layout, 1, 1024, 6, True, True, 128)
    a = forest_mod._query_dense_coarse(*args)
    assert not forest_mod._FORCE_UNPACKED_RANGES
    try:
        forest_mod._FORCE_UNPACKED_RANGES = True
        b = forest_mod._query_dense_coarse(*args)
    finally:
        forest_mod._FORCE_UNPACKED_RANGES = False
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))
