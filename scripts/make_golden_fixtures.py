"""Generate golden-bytes wire-format fixtures for tests/fixtures/.

The bytes are constructed DIRECTLY from the JVM format specifications the
reference codecs target — java.io.DataOutput (big-endian two's-complement
ints/longs, IEEE-754 doubles; `Serializers.scala:16-102` is plain
writeInt/writeLong/writeDouble sequences) and MapDB's packed varints
(`DataIO.java:60-130`: 7-bit groups, most-significant first, continuation
bit 0x80 on every byte but the last) — using only `struct`, NOT the
package's own serializers. The fixture tests then assert
`storage/serializers.py` and the native batch codec reproduce these bytes
exactly, closing the "bit-compatible" claim against an implementation-
independent rendering of the format.

Run once; outputs are checked in. Rerunning must be byte-stable.
"""

import os
import struct

HERE = os.path.dirname(os.path.abspath(__file__))
FIX = os.path.join(HERE, "..", "tests", "fixtures")


def jint(v):      # DataOutput.writeInt
    return struct.pack(">i", v)


def jlong(v):     # DataOutput.writeLong
    return struct.pack(">q", v)


def jdouble(v):   # DataOutput.writeDouble
    return struct.pack(">d", v)


def pack_varint(value):
    """MapDB DataIO packed varint (packInt/packLong share the scheme):
    big-endian 7-bit groups, 0x80 continuation on all but the last."""
    assert value >= 0
    groups = [value & 0x7F]
    value >>= 7
    while value:
        groups.append((value & 0x7F) | 0x80)
        value >>= 7
    return bytes(reversed(groups))


def main():
    os.makedirs(FIX, exist_ok=True)

    # dense vectors: (writeInt id, writeInt len, writeDouble * len)
    dense = b"".join([
        jint(3) + jint(3) + jdouble(1.0) + jdouble(2.0) + jdouble(3.0),
        jint(4) + jint(3) + jdouble(4.0) + jdouble(5.0) + jdouble(6.0),
        jint(2**31 - 1) + jint(2)
        + jdouble(-0.3333333333333333) + jdouble(1e300),
    ])
    open(os.path.join(FIX, "densevectors_golden.bin"), "wb").write(dense)

    # sparse vectors: (writeInt id, writeInt size, writeInt nnz,
    #                  writeInt * nnz, writeDouble * nnz)
    sparse = b"".join([
        jint(3) + jint(3) + jint(3)
        + jint(0) + jint(1) + jint(2)
        + jdouble(1.0) + jdouble(2.0) + jdouble(3.0),
        jint(5) + jint(2) + jint(2)
        + jint(0) + jint(1) + jdouble(1.0) + jdouble(2.0),
        jint(7) + jint(1 << 20) + jint(1)
        + jint((1 << 20) - 1) + jdouble(-2.5),
    ])
    open(os.path.join(FIX, "sparsevectors_golden.bin"), "wb").write(sparse)

    # (vectorId, hash) pairs: (writeInt id, writeLong hash)
    pairs = b"".join([
        jint(42) + jlong(0x12345678),
        jint(0) + jlong(-1),
        jint(-7) + jlong(2**63 - 1),
    ])
    open(os.path.join(FIX, "idhashpairs_golden.bin"), "wb").write(pairs)

    # packed varints, int and long ranges (values listed in the test)
    ints = [0, 1, 127, 128, 300, 16383, 16384, 2**31 - 1]
    longs = [0, 1, 127, 128, 2**31, 2**63 - 1]
    buf = b"".join(pack_varint(v) for v in ints + longs)
    open(os.path.join(FIX, "packed_varints_golden.bin"), "wb").write(buf)
    print("wrote fixtures to", FIX)


if __name__ == "__main__":
    main()
