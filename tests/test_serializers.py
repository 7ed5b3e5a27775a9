"""Binary codec round-trips + known packed-varint values
(mirrors `UtilsTest.java:41-100` packInt/packLong tests)."""

import numpy as np
import pytest

from similaritysearchbyrdf_tpu.storage import serializers as S


@pytest.mark.parametrize("v", [0, 1, 127, 128, 255, 16383, 16384, 2**31 - 1])
def test_pack_int_roundtrip(v):
    buf = S.pack_int(v)
    got, off = S.unpack_int(buf)
    assert got == v and off == len(buf)


def test_pack_int_known_encodings():
    # 7-bit groups, continuation high bit on all but last (MapDB DataIO)
    assert S.pack_int(0) == bytes([0x00])
    assert S.pack_int(1) == bytes([0x01])
    assert S.pack_int(127) == bytes([0x7F])
    assert S.pack_int(128) == bytes([0x81, 0x00])
    assert S.pack_int(300) == bytes([0x82, 0x2C])


@pytest.mark.parametrize("v", [0, 1, 127, 128, 2**31, 2**63 - 1])
def test_pack_long_roundtrip(v):
    buf = S.pack_long(v)
    got, off = S.unpack_long(buf)
    assert got == v and off == len(buf)


def test_int_long_big_endian():
    assert S.serialize_int(1) == b"\x00\x00\x00\x01"
    assert S.serialize_long(1) == b"\x00\x00\x00\x00\x00\x00\x00\x01"
    assert S.deserialize_int(S.serialize_int(-5))[0] == -5
    assert S.deserialize_long(S.serialize_long(-5))[0] == -5


def test_id_hash_pair_roundtrip():
    buf = S.serialize_id_hash_pair(42, 0x12345678)
    (vid, h), off = S.deserialize_id_hash_pair(buf)
    assert (vid, h) == (42, 0x12345678) and off == len(buf)


def test_sparse_vector_roundtrip():
    idx = np.array([0, 5, 9], dtype=np.int32)
    vals = np.array([1.5, -2.5, 3.25])
    buf = S.serialize_sparse_vector(7, 10, idx, vals)
    (vid, size, i2, v2), off = S.deserialize_sparse_vector(buf)
    assert (vid, size) == (7, 10) and off == len(buf)
    np.testing.assert_array_equal(i2, idx)
    np.testing.assert_allclose(v2, vals)


def test_dense_vector_roundtrip():
    vals = np.array([0.1, 0.2, -0.3])
    buf = S.serialize_dense_vector(3, vals)
    (vid, v2), off = S.deserialize_dense_vector(buf)
    assert vid == 3 and off == len(buf)
    np.testing.assert_allclose(v2, vals)


def test_dense_batch_codec_matches_per_record():
    """Native batch encoding must be byte-identical to the per-record
    python codec, and decode must round-trip."""
    import numpy as np

    from similaritysearchbyrdf_tpu.storage.serializers import (
        deserialize_dense_batch, serialize_dense_batch,
        serialize_dense_vector,
    )

    rng = np.random.default_rng(0)
    n, d = 200, 24
    ids = rng.integers(0, 2**31 - 1, n).astype(np.int32)
    values = rng.normal(size=(n, d))
    batch = serialize_dense_batch(ids, values)
    per_record = b"".join(
        serialize_dense_vector(int(ids[i]), values[i]) for i in range(n)
    )
    assert batch == per_record
    ids2, values2 = deserialize_dense_batch(batch)
    np.testing.assert_array_equal(ids2, ids)
    np.testing.assert_allclose(values2, values)


def test_sparse_batch_codec_matches_per_record():
    import numpy as np

    from similaritysearchbyrdf_tpu.storage.serializers import (
        deserialize_sparse_batch, serialize_sparse_batch,
        serialize_sparse_vector,
    )

    rng = np.random.default_rng(1)
    n, dim, max_nnz = 150, 512, 12
    ids = rng.integers(0, 2**31 - 1, n).astype(np.int32)
    lengths = rng.integers(1, max_nnz + 1, n).astype(np.int32)
    indices = np.zeros((n, max_nnz), np.int32)
    values = np.zeros((n, max_nnz), np.float64)
    for i in range(n):
        k = lengths[i]
        indices[i, :k] = np.sort(rng.choice(dim, size=k, replace=False))
        values[i, :k] = rng.normal(size=k)
    batch = serialize_sparse_batch(ids, dim, indices, values, lengths)
    per_record = b"".join(
        serialize_sparse_vector(int(ids[i]), dim, indices[i, :lengths[i]],
                                values[i, :lengths[i]])
        for i in range(n)
    )
    assert batch == per_record
    ids2, size2, idx2, val2, len2 = deserialize_sparse_batch(batch)
    assert size2 == dim
    np.testing.assert_array_equal(ids2, ids)
    np.testing.assert_array_equal(len2, lengths)
    for i in range(n):
        k = lengths[i]
        np.testing.assert_array_equal(idx2[i, :k], indices[i, :k])
        np.testing.assert_allclose(val2[i, :k], values[i, :k])
