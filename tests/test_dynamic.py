"""DynamicForest: delta-tier inserts, tombstoned removals, compaction."""

import numpy as np

from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
from similaritysearchbyrdf_tpu.index.dynamic import DynamicForest
from similaritysearchbyrdf_tpu.index.forest import RDFForest
from similaritysearchbyrdf_tpu.vectors import DenseBatch


def _conf():
    return RDFConfig(
        vector_dim=16, table_num=3, permutation_num=1, family_size=20,
        partition_bits=2, lsh_table=TableConfig(chain_length=10,
                                                bucket_overflow=16),
        query_batch_size=16, max_candidates=1024, top_k=5, seed=41,
    )


def _data(rng, n, d=16):
    centers = rng.normal(size=(10, d))
    x = centers[rng.integers(0, 10, n)] + 0.1 * rng.normal(size=(n, d))
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


def test_delta_inserts_visible():
    rng = np.random.default_rng(0)
    x = _data(rng, 400)
    dyn = DynamicForest(_conf(), merge_threshold=10.0)  # never auto-compact
    dyn.fit(DenseBatch(np.arange(300, dtype=np.int32), x[:300]))
    dyn.add(DenseBatch(np.arange(300, 400, dtype=np.int32), x[300:]))
    assert dyn._delta_dirty                # rebuild deferred to the query
    ids, _ = dyn.query(x[300:308], steps=1, query_ids=np.arange(300, 308))
    assert dyn.delta is not None
    # new points' cluster siblings include other new points & old points
    assert (ids >= 0).any()
    found_new = (ids >= 300).sum()
    assert found_new > 0


def test_remove_tombstones_and_compaction():
    rng = np.random.default_rng(1)
    x = _data(rng, 200)
    dyn = DynamicForest(_conf(), merge_threshold=10.0)
    dyn.fit(DenseBatch(np.arange(200, dtype=np.int32), x))
    victim = 7
    dyn.remove(victim)
    ids, _ = dyn.query(x[:16], steps=1)
    assert victim not in set(ids.ravel().tolist())
    dyn.compact()
    assert dyn.delta is None
    assert dyn.main.size() == 199
    ids, _ = dyn.query(x[:16], steps=1)
    assert victim not in set(ids.ravel().tolist())


def test_auto_compaction_and_equivalence():
    """After compaction the dynamic forest must answer exactly like a
    fresh forest over the same data with the same model."""
    rng = np.random.default_rng(2)
    x = _data(rng, 300)
    dyn = DynamicForest(_conf(), merge_threshold=0.1)
    dyn.fit(DenseBatch(np.arange(200, dtype=np.int32), x[:200]))
    dyn.add(DenseBatch(np.arange(200, 300, dtype=np.int32), x[200:]))  # triggers
    assert dyn.delta is None  # compacted
    assert dyn.main.size() == 300

    fresh = RDFForest(_conf())
    fresh.model = dyn.main.model
    fresh.part_proj = dyn.main.part_proj
    fresh.fit(DenseBatch(np.arange(300, dtype=np.int32), x))
    a, _ = dyn.query(x[:8], steps=0, query_ids=np.arange(8))
    b, _ = fresh.query(x[:8], steps=0, query_ids=np.arange(8))
    np.testing.assert_array_equal(a, b)


def test_static_overfetch_shapes_under_remove_stream():
    """A removal stream must NOT change the compiled query shape per
    tombstone: the per-tier over-fetch k is rounded to a static bucket
    (one recompile per bucket, not per removal)."""
    rng = np.random.default_rng(3)
    x = _data(rng, 200)
    dyn = DynamicForest(_conf(), merge_threshold=10.0)
    dyn.fit(DenseBatch(np.arange(200, dtype=np.int32), x))

    seen_k = []
    orig_query = RDFForest.query

    def spy(self, queries, **kw):
        seen_k.append(kw.get("k"))
        return orig_query(self, queries, **kw)

    RDFForest.query = spy
    try:
        for victim in range(30):           # 30 distinct tombstone counts
            dyn.remove(victim)
            got, _ = dyn.query(x[:16], steps=0)
            assert victim not in set(got.ravel().tolist())
    finally:
        RDFForest.query = orig_query
    assert set(seen_k) <= {5 + b for b in DynamicForest.OVERFETCH_BUCKETS}
    assert len(set(seen_k)) <= 2           # crossed one bucket boundary


def test_remove_past_limit_compacts():
    rng = np.random.default_rng(4)
    x = _data(rng, 200)
    dyn = DynamicForest(_conf(), merge_threshold=10.0)
    dyn.fit(DenseBatch(np.arange(200, dtype=np.int32), x))
    for victim in range(DynamicForest.TOMBSTONE_LIMIT + 1):
        dyn.remove(victim)
    assert len(dyn._tombstones) == 0       # folded out by compaction
    assert dyn.main.size() == 200 - (DynamicForest.TOMBSTONE_LIMIT + 1)


def test_add_stream_rebuilds_lazily():
    """N adds cost one delta rebuild (at the next query), not N rebuilds."""
    rng = np.random.default_rng(5)
    x = _data(rng, 260)
    dyn = DynamicForest(_conf(), merge_threshold=10.0)
    dyn.fit(DenseBatch(np.arange(200, dtype=np.int32), x[:200]))

    fits = [0]
    orig_fit = RDFForest.fit

    def spy(self, batch):
        fits[0] += 1
        return orig_fit(self, batch)

    RDFForest.fit = spy
    try:
        for i in range(200, 260):
            dyn.add(DenseBatch(np.asarray([i], np.int32), x[i:i + 1]))
        assert fits[0] == 0                # no rebuild during the stream
        ids, _ = dyn.query(x[200:216], steps=1,
                           query_ids=np.arange(200, 216))
        assert fits[0] == 1                # exactly one lazy rebuild
        assert (ids >= 200).sum() > 0      # inserts visible
    finally:
        RDFForest.fit = orig_fit
