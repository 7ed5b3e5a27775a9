"""Bucket-table semantics: leaf decomposition + probe lookup vs the oracle's
overflow rule (the flattened equivalent of `RandomDrawTreeMapTest.java`)."""

import numpy as np
import jax.numpy as jnp

import oracle
from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
from similaritysearchbyrdf_tpu.index.bucket_table import (
    KeyLayout,
    build_tables,
    composite_keys,
    lookup_ranges,
)


def _layout(pbits=3, bucket_bits=28, node=32):
    conf = RDFConfig(partition_bits=pbits, lsh_table=TableConfig(
        bucket_bits=bucket_bits, dir_node_size=node))
    return KeyLayout.from_config(conf, conf.lsh_table)


def test_layout_canonical():
    lay = _layout()
    assert lay.seg_bits == 4
    assert lay.bits_per_level == 5
    assert lay.num_levels == 5       # MAX_TREE_LEVEL=4 → 5 chain depths
    assert lay.consumed_bits == 25   # bits 25-27 skipped (ref `:1671`)
    assert lay.total_bits == 32


def test_layout_64_node():
    lay = _layout(node=64)
    assert lay.bits_per_level == 6
    assert lay.num_levels == 4       # 28//6 - 1 = 3 → 4 depths
    assert lay.consumed_bits == 24


def test_composite_key_drops_skipped_bits():
    lay = _layout()
    h = jnp.asarray(np.array([0xFFFFFFFF], dtype=np.uint32))
    p = jnp.asarray(np.array([0], dtype=np.int32))
    k = int(np.asarray(composite_keys(h, p, lay))[0])
    # partition 0, seg 0b1111, trie = 25 ones
    assert k == (0xF << 25) | ((1 << 25) - 1)
    # flipping a skipped bit (25..27) must not change the key
    h2 = jnp.asarray(np.array([0xFFFFFFFF ^ (1 << 26)], dtype=np.uint32))
    assert int(np.asarray(composite_keys(h2, p, lay))[0]) == k


def _build_random(n=2000, l=2, overflow=8, seed=0, pbits=2):
    """Random keys concentrated so prefixes actually overflow."""
    lay = _layout(pbits=pbits)
    rng = np.random.default_rng(seed)
    # skew hashes: few segs, clustered trie bits → forces deep splits
    h = (
        (rng.integers(0, 2, size=(l, n), dtype=np.uint64) << 28)
        | rng.integers(0, 1 << 12, size=(l, n), dtype=np.uint64)
        | (rng.integers(0, 4, size=(l, n), dtype=np.uint64) << 20)
    ).astype(np.uint32)
    part = rng.integers(0, 1 << pbits, size=(l, n)).astype(np.int32)
    keys = np.asarray(composite_keys(jnp.asarray(h), jnp.asarray(part), lay))
    ids = np.broadcast_to(np.arange(n, dtype=np.int32), (l, n)).copy()
    tables = build_tables(jnp.asarray(keys), jnp.asarray(ids), lay, overflow)
    return lay, keys, ids, tables, overflow


def test_lookup_matches_oracle_ranges():
    lay, keys, ids, tables, overflow = _build_random()
    sk = np.asarray(tables.sorted_keys)
    si = np.asarray(tables.sorted_ids)
    l, n = keys.shape
    rng = np.random.default_rng(1)
    # probe with existing keys and random keys
    probe_keys = np.concatenate(
        [keys[:, rng.choice(n, 50)],
         rng.integers(0, 1 << lay.total_bits, size=(l, 50), dtype=np.uint64).astype(np.uint32)],
        axis=1,
    )  # [L, 100]
    # device lookup: arrange as [B=100, R=L] with table_index = arange(L)
    pk = jnp.asarray(probe_keys.T)  # [100, L]
    start, length = lookup_ranges(tables, pk, jnp.arange(l, dtype=jnp.int32))
    start, length = np.asarray(start), np.asarray(length)
    for t in range(l):
        for b in range(100):
            lo, hi = oracle.leaf_depth_of_key(
                sk[t], int(probe_keys[t, b]), lay.partition_bits, lay.seg_bits,
                lay.bits_per_level, lay.num_levels, overflow,
            )
            got = set(si[t][start[b, t]: start[b, t] + length[b, t]])
            expect = set(si[t][lo:hi])
            # oracle's range at the element's own depth: when the probe's
            # prefix exists, both must agree exactly; when it doesn't exist
            # the device returns empty while the oracle returns the (empty)
            # range too
            assert got == expect, (t, b, hex(int(probe_keys[t, b])))


def test_bucket_population_respects_overflow():
    """No leaf bucket may exceed overflow unless it is at max depth with a
    fully-shared prefix."""
    lay, keys, ids, tables, overflow = _build_random(overflow=8)
    sk = np.asarray(tables.sorted_keys)
    bstarts = np.asarray(tables.bucket_starts)
    bkeys = np.asarray(tables.bucket_keys)
    bshifts = np.asarray(tables.bucket_shifts)
    l = sk.shape[0]
    for t in range(l):
        real = bkeys[t] != 0xFFFFFFFF
        for bi in np.flatnonzero(real):
            size = bstarts[t, bi + 1] - bstarts[t, bi]
            if bshifts[t, bi] != 0:  # not max depth
                assert size <= overflow
            # all members share the bucket prefix
            seg = sk[t, bstarts[t, bi]: bstarts[t, bi + 1]]
            assert (seg >> bshifts[t, bi] == bkeys[t, bi] >> bshifts[t, bi]).all()


def test_buckets_cover_all_elements():
    lay, keys, ids, tables, overflow = _build_random()
    bstarts = np.asarray(tables.bucket_starts)
    bkeys = np.asarray(tables.bucket_keys)
    n = np.asarray(tables.sorted_keys).shape[1]
    for t in range(keys.shape[0]):
        real = np.flatnonzero(bkeys[t] != 0xFFFFFFFF)
        # starts strictly increasing and first bucket starts at 0
        starts = bstarts[t, real]
        assert starts[0] == 0
        assert (np.diff(starts) > 0).all()


def test_lookup_decimated_matches_generic():
    """The records fast path's DECIMATED two-level rank (taken when the
    bucket count dwarfs the probe count; includes the contiguous-span
    row-gather rank) must agree with the generic searchsorted path on the
    same tables."""
    import dataclasses

    lay = _layout(pbits=2)
    rng = np.random.default_rng(7)
    n, l = 20_000, 2
    # distinct spread hashes + overflow 1 → ~n leaf buckets per table,
    # far above the 4096 / 2Q decimation threshold
    h = rng.permutation(np.arange(1, n + 1, dtype=np.uint64) * 200003
                        % (1 << 32))[None, :]
    h = np.concatenate([h, (h * 7 + 13) % (1 << 32)], axis=0).astype(
        np.uint32
    )
    part = rng.integers(0, 4, size=(l, n)).astype(np.int32)
    keys = np.asarray(composite_keys(jnp.asarray(h), jnp.asarray(part), lay))
    ids = np.broadcast_to(np.arange(n, dtype=np.int32), (l, n)).copy()
    tables = build_tables(jnp.asarray(keys), jnp.asarray(ids), lay, 1)
    assert tables.records is not None
    assert tables.bucket_keys.shape[1] > 4096
    probe = np.concatenate(
        [keys[:, rng.choice(n, 64)],
         rng.integers(0, 1 << 32, size=(l, 64), dtype=np.uint64)
         .astype(np.uint32)],
        axis=1,
    )                                                   # [L, 128]
    pk = jnp.asarray(probe.T)                           # [B=128, R=L]
    t_of = jnp.arange(l, dtype=jnp.int32)
    s_fast, l_fast = lookup_ranges(tables, pk, t_of)
    s_gen, l_gen = lookup_ranges(
        dataclasses.replace(tables, records=None), pk, t_of
    )
    np.testing.assert_array_equal(np.asarray(l_fast), np.asarray(l_gen))
    live = np.asarray(l_fast) > 0
    np.testing.assert_array_equal(
        np.asarray(s_fast)[live], np.asarray(s_gen)[live]
    )


def test_serial_depths_matches_vectorized():
    """The table-serial depth path (taken when l*n >= 64M, the Deep-scale
    regime) must produce bit-identical bucket tables to the vectorized
    path."""
    import jax

    from similaritysearchbyrdf_tpu.index import bucket_table as bt

    lay, keys, ids, tables, overflow = _build_random(n=1500, l=3, seed=9)
    bt._FORCE_SERIAL_DEPTHS = True
    jax.clear_caches()   # _sort_and_depths is jitted; force a re-trace
    try:
        tables_s = build_tables(
            jnp.asarray(keys), jnp.asarray(ids), lay, overflow
        )
    finally:
        bt._FORCE_SERIAL_DEPTHS = False
        jax.clear_caches()
    for field in ("sorted_keys", "sorted_ids", "bucket_keys",
                  "bucket_starts", "bucket_shifts"):
        np.testing.assert_array_equal(
            np.asarray(getattr(tables, field)),
            np.asarray(getattr(tables_s, field)),
        )
