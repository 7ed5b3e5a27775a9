"""Persistence: whole-forest save/load, bloom summaries, tiered generations
(the checkpoint/resume subsystem — working load path the reference lacks)."""

import numpy as np

from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
from similaritysearchbyrdf_tpu.index.forest import RDFForest
from similaritysearchbyrdf_tpu.storage.bloom import BloomFilter
from similaritysearchbyrdf_tpu.storage.persist import (
    GenerationStore,
    TieredForest,
    load_forest,
    save_forest,
)
from similaritysearchbyrdf_tpu.vectors import DenseBatch


def _conf(**kw):
    base = dict(
        vector_dim=16,
        table_num=3,
        permutation_num=1,
        family_size=20,
        partition_bits=2,
        lsh_table=TableConfig(chain_length=10, bucket_overflow=16),
        query_batch_size=16,
        max_candidates=1024,
        top_k=5,
        seed=13,
    )
    base.update(kw)
    return RDFConfig(**base)


def _data(rng, n=400, d=16):
    centers = rng.normal(size=(12, d))
    x = centers[rng.integers(0, 12, n)] + 0.1 * rng.normal(size=(n, d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def test_bloom_no_false_negatives():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 2**31, size=5000).astype(np.uint32)
    bloom = BloomFilter.build(len(keys), fpr=0.001)
    bloom.add(keys)
    assert bloom.might_contain(keys).all()
    other = rng.integers(2**31, 2**32, size=5000).astype(np.uint32)
    fp = bloom.might_contain(other).mean()
    assert fp < 0.02, fp


def test_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    x = _data(rng)
    conf = _conf()
    forest = RDFForest(conf).fit(DenseBatch(np.arange(len(x), dtype=np.int32), x))
    ids0, sc0 = forest.query(x[:8], steps=1, query_ids=np.arange(8))

    save_forest(forest, str(tmp_path / "idx"))
    loaded = load_forest(str(tmp_path / "idx"))
    assert loaded.size() == forest.size()
    ids1, sc1 = loaded.query(x[:8], steps=1, query_ids=np.arange(8))
    np.testing.assert_array_equal(ids0, ids1)
    np.testing.assert_allclose(sc0, sc1, rtol=1e-6)


def test_save_load_uncompressed_roundtrip(tmp_path):
    """compress=False (the reference Store's optional-LZF-off mode,
    `Store.java:26-60`) writes a raw npz that loads back identically —
    and a GenerationStore(compress=False) spill stays query-merge
    compatible."""
    rng = np.random.default_rng(7)
    x = _data(rng)
    conf = _conf()
    forest = RDFForest(conf).fit(DenseBatch(np.arange(len(x), dtype=np.int32), x))
    ids0, sc0 = forest.query(x[:8], steps=1, query_ids=np.arange(8))

    save_forest(forest, str(tmp_path / "raw"), compress=False)
    save_forest(forest, str(tmp_path / "zip"), compress=True)
    raw_sz = (tmp_path / "raw.npz").stat().st_size
    zip_sz = (tmp_path / "zip.npz").stat().st_size
    assert raw_sz > zip_sz   # raw is bigger; both must load identically
    for stem in ("raw", "zip"):
        loaded = load_forest(str(tmp_path / stem))
        ids1, sc1 = loaded.query(x[:8], steps=1, query_ids=np.arange(8))
        np.testing.assert_array_equal(ids0, ids1)
        np.testing.assert_allclose(sc0, sc1, rtol=1e-6)

    store = GenerationStore(str(tmp_path), name="gen-raw", compress=False)
    stem = store.spill(forest)
    g = store.load_generation(stem)
    ids2, _ = g.query(x[:8], steps=1, query_ids=np.arange(8))
    np.testing.assert_array_equal(ids0, ids2)


def test_save_load_rebuilds_coarse_tier(tmp_path):
    """A forest fitted with a coarse tier (+ head tier) must load back onto
    the SAME query path: the tiers are derived data (seeded projection over
    the saved corpus in the saved sort order), rebuilt bit-identically on
    load rather than serialized."""
    rng = np.random.default_rng(4)
    x = _data(rng, n=600)
    conf = _conf(coarse_dim=8, coarse_refine=2048, coarse_window=64,
                 coarse_head_pool=8, coarse_keep=16)
    forest = RDFForest(conf).fit(
        DenseBatch(np.arange(len(x), dtype=np.int32), x))
    ids0, sc0 = forest.query(x[:8], steps=1, query_ids=np.arange(8))

    save_forest(forest, str(tmp_path / "idxc"))
    loaded = load_forest(str(tmp_path / "idxc"))
    st = loaded.state
    assert st.coarse_by_table is not None and st.coarse_head is not None
    np.testing.assert_array_equal(
        np.asarray(st.coarse_by_table),
        np.asarray(forest.state.coarse_by_table))
    np.testing.assert_array_equal(
        np.asarray(st.coarse_head), np.asarray(forest.state.coarse_head))
    ids1, sc1 = loaded.query(x[:8], steps=1, query_ids=np.arange(8))
    np.testing.assert_array_equal(ids0, ids1)
    np.testing.assert_allclose(sc0, sc1, rtol=1e-6)


def test_save_load_rebuilds_folded_tier(tmp_path):
    """The slot-folded groupmax tier is derived data like the lane tier:
    rebuilt bit-identically on load, landing on the same query path."""
    rng = np.random.default_rng(9)
    x = _data(rng, n=600)
    conf = _conf(coarse_dim=16, coarse_layout="folded", coarse_refine=2048,
                 coarse_window=64)
    forest = RDFForest(conf).fit(
        DenseBatch(np.arange(len(x), dtype=np.int32), x))
    ids0, sc0 = forest.query(x[:8], steps=1, query_ids=np.arange(8))

    save_forest(forest, str(tmp_path / "idxf"))
    loaded = load_forest(str(tmp_path / "idxf"))
    st = loaded.state
    assert st.coarse_folded is not None and st.coarse_by_table is None
    np.testing.assert_array_equal(
        np.asarray(st.coarse_folded), np.asarray(forest.state.coarse_folded))
    ids1, sc1 = loaded.query(x[:8], steps=1, query_ids=np.arange(8))
    np.testing.assert_array_equal(ids0, ids1)
    np.testing.assert_allclose(sc0, sc1, rtol=1e-6)


def test_tiered_spill_and_merge_folded(tmp_path):
    """Tiered generations through the folded groupmax path: spill + merged
    reads must work for the round-3 layout exactly like the lane tier."""
    rng = np.random.default_rng(12)
    x = _data(rng, n=500)
    conf = _conf(coarse_dim=16, coarse_layout="folded", coarse_refine=2048,
                 coarse_window=64)
    tiered = TieredForest(conf, GenerationStore(str(tmp_path), "genf"))
    tiered.fit(DenseBatch(np.arange(250, dtype=np.int32), x[:250]))
    tiered.spill()
    tiered.fit(DenseBatch(np.arange(250, 500, dtype=np.int32), x[250:]))
    ids, scores = tiered.query(x[:16], steps=1, query_ids=np.arange(16))
    assert (ids[ids >= 0] < 250).sum() > 0  # old generation reachable
    assert (ids[ids >= 0] >= 250).sum() > 0  # device tier reachable


def test_tiered_spill_and_merge(tmp_path):
    """Spill an old generation, fit fresh data, query must merge both —
    the read path the reference implements at
    `RandomDrawTreeMap.java:583-595` but cannot resume; here resume works."""
    rng = np.random.default_rng(2)
    x = _data(rng, n=500)
    conf = _conf()
    store = GenerationStore(str(tmp_path), "gen")
    tiered = TieredForest(conf, store)

    # generation 1: first 250 vectors, then spill to disk
    tiered.fit(DenseBatch(np.arange(250, dtype=np.int32), x[:250]))
    stem = tiered.spill()
    assert tiered.device_tier is None
    assert store.generations() == [stem]

    # bloom summary covers the spilled ids
    bloom = store.summary(stem)
    assert bloom.might_contain(np.arange(250, dtype=np.uint32)).all()

    # device tier: remaining vectors
    tiered.fit(DenseBatch(np.arange(250, 500, dtype=np.int32), x[250:]))

    ids, scores = tiered.query(x[:16], steps=1, query_ids=np.arange(16))
    # queries 0..15 live in the spilled generation; their near-duplicates
    # must be found through the disk tier
    found_old = (ids[ids >= 0] < 250).sum()
    assert found_old > 0

    # parity: merged result equals a single forest over everything queried
    # tier-by-tier (scores dominate any single tier)
    single = TieredForest(conf, GenerationStore(str(tmp_path), "single"))
    single.fit(DenseBatch(np.arange(250, dtype=np.int32), x[:250]))
    ids_one, sc_one = single.query(x[:16], steps=1, query_ids=np.arange(16))
    finite = np.isfinite(sc_one)
    assert (scores[finite] >= sc_one[finite] - 1e-6).all()


def test_empty_tiered_query(tmp_path):
    conf = _conf()
    tiered = TieredForest(conf, GenerationStore(str(tmp_path), "e"))
    ids, scores = tiered.query(np.zeros((3, 16), np.float32))
    assert (ids == -1).all()


def test_resident_generations_zero_disk_reads(tmp_path):
    """Three spilled generations: the SECOND query call must do zero npz
    reads (generations stay LRU-resident on device)."""
    import dataclasses as dc

    conf = _conf() if "_conf" in dir() else None
    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    conf = RDFConfig(
        vector_dim=8, table_num=2, permutation_num=1, family_size=10,
        partition_bits=2, lsh_table=TableConfig(chain_length=8,
                                                bucket_overflow=16),
        query_batch_size=8, max_candidates=256, top_k=3, seed=9,
    )
    rng = np.random.default_rng(3)
    x = rng.normal(size=(90, 8)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    store = GenerationStore(str(tmp_path), "g")
    tiered = TieredForest(conf, store)
    for g in range(3):
        tiered.fit(DenseBatch(np.arange(g * 30, (g + 1) * 30, dtype=np.int32),
                              x[g * 30:(g + 1) * 30]))
        tiered.spill()

    ids1, _ = tiered.query(x[:8], steps=1)
    loads_after_first = store.disk_loads
    assert loads_after_first == 3          # one per generation
    ids2, _ = tiered.query(x[:8], steps=1)
    assert store.disk_loads == loads_after_first   # zero re-reads
    np.testing.assert_array_equal(ids1, ids2)


def test_lru_eviction_respects_budget(tmp_path):
    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.storage.persist import forest_state_bytes

    conf = RDFConfig(
        vector_dim=8, table_num=2, permutation_num=1, family_size=10,
        partition_bits=2, lsh_table=TableConfig(chain_length=8,
                                                bucket_overflow=16),
        query_batch_size=8, max_candidates=256, top_k=3, seed=9,
    )
    rng = np.random.default_rng(4)
    x = rng.normal(size=(60, 8)).astype(np.float32)
    store = GenerationStore(str(tmp_path), "g", cache_bytes=1)  # force evict
    tiered = TieredForest(conf, store)
    for g in range(2):
        tiered.fit(DenseBatch(np.arange(g * 30, (g + 1) * 30, dtype=np.int32),
                              x[g * 30:(g + 1) * 30]))
        tiered.spill()
    tiered.query(x[:8])
    assert len(store._cache) == 1          # evicted down to one resident
    tiered.query(x[:8])
    assert store.disk_loads >= 3           # re-reads happen when over budget


def test_auto_spill_on_ram_threshold(tmp_path):
    """fit/add past conf.ram_threshold bytes must auto-spill the device
    tier (the reference's runPersistTask trigger)."""
    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig

    conf = RDFConfig(
        vector_dim=8, table_num=2, permutation_num=1, family_size=10,
        partition_bits=2, lsh_table=TableConfig(chain_length=8,
                                                bucket_overflow=16),
        query_batch_size=8, max_candidates=256, top_k=3, seed=9,
        ram_threshold=1,                   # 1 byte: always spill
    )
    rng = np.random.default_rng(5)
    x = rng.normal(size=(60, 8)).astype(np.float32)
    store = GenerationStore(str(tmp_path), "g")
    tiered = TieredForest(conf, store)
    tiered.fit(DenseBatch(np.arange(30, dtype=np.int32), x[:30]))
    assert tiered.device_tier is None      # spilled automatically
    assert len(store.generations()) == 1
    tiered.add(DenseBatch(np.arange(30, 60, dtype=np.int32), x[30:]))
    assert tiered.device_tier is None
    assert len(store.generations()) == 2
    # all data still reachable
    got = tiered.get(45)
    np.testing.assert_allclose(got, x[45], rtol=1e-6)


def test_query_skips_non_matching_generation(tmp_path):
    """A generation none of whose buckets any probe key can land in must
    NEVER be loaded during query() — the similarity-read analogue of the
    reference's Bloom-gated persisted reads (`RandomDrawTreeMap.java:
    771-783,926-938`).

    Construction: with the angle family, hash(-v) is the bitwise complement
    of hash(v) (all sign bits flip), so a generation holding only negated
    copies of the query occupies complementary seg bits in every table;
    probe flips never touch seg bits, so no probe can reach its buckets."""
    conf = RDFConfig(
        vector_dim=16, table_num=2, permutation_num=1, family_size=20,
        partition_bits=0,
        lsh_table=TableConfig(chain_length=10, bucket_overflow=4),
        query_batch_size=4, max_candidates=512, top_k=3, seed=21,
    )
    rng = np.random.default_rng(7)
    q = rng.normal(size=(1, 16)).astype(np.float32)
    q /= np.linalg.norm(q)

    store = GenerationStore(str(tmp_path), "g")
    tiered = TieredForest(conf, store)
    # generation A: the query's neighborhood
    xa = (q + 0.05 * rng.normal(size=(40, 16))).astype(np.float32)
    tiered.fit(DenseBatch(np.arange(40, dtype=np.int32), xa))
    stem_a = tiered.spill()
    # generation B: only scaled NEGATIONS of q — complementary hash bits
    xb = (-q * np.linspace(0.5, 2.0, 40)[:, None]).astype(np.float32)
    tiered.fit(DenseBatch(np.arange(100, 140, dtype=np.int32), xb))
    stem_b = tiered.spill()

    ids, scores = tiered.query(q, steps=0)
    assert stem_a in store._cache            # gated in and loaded
    assert stem_b not in store._cache        # gate proved it can't match
    assert store.disk_loads == 1
    # and the gated result equals the ungated merge (gate is conservative)
    forest_b = load_forest(stem_b)
    ids_b, _ = forest_b.query(q, steps=0)
    assert (ids_b < 0).all() or not np.intersect1d(
        ids[ids >= 0], ids_b[ids_b >= 0]
    ).size


def test_keysummary_sidecar_roundtrip(tmp_path):
    conf = _conf()
    rng = np.random.default_rng(8)
    x = _data(rng, n=120)
    store = GenerationStore(str(tmp_path), "g")
    tiered = TieredForest(conf, store)
    tiered.fit(DenseBatch(np.arange(120, dtype=np.int32), x))
    stem = tiered.spill()
    ks = store.key_summary(stem)
    assert ks is not None
    bk, bs, fp = ks
    f = load_forest(stem)
    np.testing.assert_array_equal(bk, np.asarray(f.state.tables.bucket_keys))
    np.testing.assert_array_equal(bs, np.asarray(f.state.tables.bucket_shifts))
    from similaritysearchbyrdf_tpu.storage.persist import model_fingerprint

    assert fp == model_fingerprint(f.state.model)
    # legacy generation without a sidecar: must be treated as might-match
    import os as _os

    _os.remove(stem + "-keysummary.npz")
    store._key_summaries.clear()
    assert store.key_summary(stem) is None
    ids, _ = tiered.query(x[:4], steps=0)
    assert stem in store._cache              # loaded despite missing sidecar


def test_gate_distrusts_foreign_model(tmp_path):
    """Generations spilled under a DIFFERENT hash model (other seed) must be
    treated as might-match: probe keys computed from the prototype's model
    are meaningless against a foreign model's bucket boundaries, so gating
    on them could silently drop matching neighbors."""
    import dataclasses as dc

    conf = RDFConfig(
        vector_dim=16, table_num=2, permutation_num=1, family_size=20,
        partition_bits=0,
        lsh_table=TableConfig(chain_length=10, bucket_overflow=4),
        query_batch_size=4, max_candidates=512, top_k=3, seed=21,
    )
    rng = np.random.default_rng(7)
    q = rng.normal(size=(1, 16)).astype(np.float32)
    q /= np.linalg.norm(q)
    store = GenerationStore(str(tmp_path), "g")
    tiered = TieredForest(conf, store)
    # same unreachable-by-construction generation as
    # test_query_skips_non_matching_generation: only negations of q
    xb = (-q * np.linspace(0.5, 2.0, 40)[:, None]).astype(np.float32)
    tiered.fit(DenseBatch(np.arange(100, 140, dtype=np.int32), xb))
    stem_b = tiered.spill()

    # same model: the gate may (and does) skip it
    ids, _ = tiered.query(q, steps=0)
    assert stem_b not in store._cache

    # a restart under a different seed: fingerprints differ, the gate MUST
    # load the generation — and its neighbors must surface in the merge
    conf2 = dc.replace(conf, seed=99)
    store2 = GenerationStore(str(tmp_path), "g")
    tiered2 = TieredForest(conf2, store2)
    ids2, _ = tiered2.query(-q, steps=1)     # -q's true neighbors are in B
    assert stem_b in store2._cache           # loaded despite foreign keys
    assert (ids2 >= 100).any()


def test_add_grows_device_tier(tmp_path):
    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig

    conf = RDFConfig(
        vector_dim=8, table_num=2, permutation_num=1, family_size=10,
        partition_bits=2, lsh_table=TableConfig(chain_length=8,
                                                bucket_overflow=16),
        query_batch_size=8, max_candidates=256, top_k=3, seed=9,
    )
    rng = np.random.default_rng(6)
    x = rng.normal(size=(40, 8)).astype(np.float32)
    store = GenerationStore(str(tmp_path), "g")
    tiered = TieredForest(conf, store)
    tiered.fit(DenseBatch(np.arange(20, dtype=np.int32), x[:20]))
    tiered.add(DenseBatch(np.arange(20, 40, dtype=np.int32), x[20:]))
    assert tiered.device_tier.size() == 40
    assert len(store.generations()) == 0   # under threshold: no spill


def test_ivf_save_load_roundtrip(tmp_path):
    """Clustered-flat engine state round-trips through save_ivf/load_ivf
    with identical query results."""
    import numpy as np

    from similaritysearchbyrdf_tpu import DenseBatch, save_ivf, load_ivf
    from similaritysearchbyrdf_tpu.ops.ivf import IVFFlatIndex

    rng = np.random.default_rng(7)
    x = rng.normal(size=(600, 24)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    idx = IVFFlatIndex(target_cluster=32, nprobe=8, refine=64, iters=3,
                       wb=40, train_sample=512,
                       ).fit(DenseBatch(np.arange(600, dtype=np.int32), x))
    path = str(tmp_path / "ivf_ckpt")
    save_ivf(idx, path)
    idx2 = load_ivf(path)
    # operating-point knobs survive the round trip
    assert idx2.wb == 40 and idx2.train_sample == 512
    q = x[:16]
    ids1, s1 = idx.query(q, k=5, query_ids=np.arange(16))
    ids2, s2 = idx2.query(q, k=5, query_ids=np.arange(16))
    np.testing.assert_array_equal(ids1, ids2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)
