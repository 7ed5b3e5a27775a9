"""Unit tests for the bit-twiddling layer (mirrors the reference's exact-value
unit style in `AngleHashSuite`/`UtilsTest`)."""

import numpy as np
import jax.numpy as jnp

from similaritysearchbyrdf_tpu.ops import bitops


def test_pack_bits_msb_first_matches_reference_packing():
    # reference: result = (result << 1 | s_j) for j, then << (32 - chainSize)
    for c in (1, 3, 8, 32):
        rng = np.random.default_rng(c)
        bits = rng.integers(0, 2, size=(5, c)).astype(np.int32)
        got = np.asarray(bitops.pack_bits_msb_first(jnp.asarray(bits)))
        for row in range(5):
            expect = 0
            for j in range(c):
                expect = (expect << 1) | int(bits[row, j])
            expect = (expect << (32 - c)) & 0xFFFFFFFF
            assert got[row] == expect, (c, row)


def test_bits_of_lsb_layout():
    x = jnp.asarray(np.array([0b1011, 0x80000000], dtype=np.uint32))
    b = np.asarray(bitops.bits_of(x))
    assert b[0, 0] == 1 and b[0, 1] == 1 and b[0, 2] == 0 and b[0, 3] == 1
    assert b[1, 31] == 1 and b[1, 0] == 0


def test_popcount_clz():
    vals = np.array([0, 1, 0x80000000, 0xFFFFFFFF, 0x0F0F0F0F], dtype=np.uint32)
    pc = np.asarray(bitops.popcount(jnp.asarray(vals)))
    assert list(pc) == [0, 1, 1, 32, 16]
    cz = np.asarray(bitops.clz(jnp.asarray(vals)))
    assert list(cz) == [32, 31, 0, 0, 4]


def test_java_bytes_hash_matches_scalar():
    """Cross-check against a direct python port of
    java.util.Arrays.hashCode(ByteBuffer.putInt bytes)."""

    def scalar(ints):
        h = 1
        for v in ints:
            v = int(v) & 0xFFFFFFFF
            for shift in (24, 16, 8, 0):
                b = (v >> shift) & 0xFF
                if b >= 128:
                    b -= 256
                h = (h * 31 + b) & 0xFFFFFFFF
                if h >= 1 << 31:
                    h -= 1 << 32
        return h & 0xFFFFFFFF

    rng = np.random.default_rng(7)
    ints = rng.integers(-(2**31), 2**31, size=(16, 4), dtype=np.int64).astype(np.int32)
    got = np.asarray(bitops.java_bytes_hash_of_ints(jnp.asarray(ints))).astype(np.uint32)
    for i in range(16):
        assert got[i] == scalar(list(ints[i])), i


def test_known_java_hash_value():
    # Arrays.hashCode of int 1 as bytes [0,0,0,1]:
    # h=1; h=31; h=961; h=29791; h=923521*... step by step = (((1*31+0)*31+0)*31+0)*31+1
    assert int(np.asarray(
        bitops.java_bytes_hash_of_ints(jnp.asarray(np.array([[1]], dtype=np.int32)))
    )[0]) == (((31 * 31) * 31) * 31 + 1)
