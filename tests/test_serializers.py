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
