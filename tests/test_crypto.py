"""XTEA + CRC32 record wrapping (`storage/crypto.py`) — the reference
store's encrypt/checksum flags (`Store.java:296-316`,
`EncryptionXTEA.java`). The cipher is cross-checked against an
INDEPENDENT scalar XTEA (textbook sum-accumulating loop, Needham &
Wheeler 1997) with the same SHA-256 key derivation, so the vectorized
numpy implementation cannot be self-consistently wrong."""

import hashlib
import struct
import zlib

import numpy as np
import pytest

from similaritysearchbyrdf_tpu.storage.crypto import (
    ALIGN,
    DataCorruptionError,
    WrongConfigError,
    XTEA,
    unwrap_record,
    wrap_record,
)

M = 0xFFFFFFFF
DELTA = 0x9E3779B9


def scalar_xtea_encrypt_block(key4, y, z):
    """Textbook 32-round XTEA, sum accumulated in-loop (no precomputed
    subkey table — an independent formulation of the same cipher)."""
    s = 0
    for _ in range(16):
        y = (y + (((((z << 4) & M) ^ (z >> 5)) + z) ^ (s + key4[s & 3]))) & M
        s = (s + DELTA) & M
        z = (z + (((((y << 4) & M) ^ (y >> 5)) + y)
                  ^ (s + key4[(s >> 11) & 3]))) & M
    return y, z


def test_xtea_matches_independent_scalar():
    password = b"hunter2"
    key4 = struct.unpack(">4I", hashlib.sha256(password).digest()[:16])
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, 64, dtype=np.uint8).tobytes()
    got = XTEA(password).encrypt(data)
    want = b""
    for off in range(0, len(data), 8):
        y, z = struct.unpack(">2I", data[off:off + 8])
        y2, z2 = scalar_xtea_encrypt_block(list(key4), y, z)
        want += struct.pack(">2I", (y2 + 0) & M, (z2 + 0) & M)
    # NOTE the subkey-table form adds key via (sum + key[..]) without the
    # extra masking differences — both are mod-2^32 exact
    assert got == want


def test_xtea_roundtrip_and_key_sensitivity():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 1024, dtype=np.uint8).tobytes()
    c = XTEA(b"pw")
    enc = c.encrypt(data)
    assert enc != data
    assert c.decrypt(enc) == data
    assert XTEA(b"pw2").decrypt(enc) != data


def test_wrap_unwrap_all_flag_combinations():
    rng = np.random.default_rng(2)
    for n in (0, 1, 15, 16, 17, 1000):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        for pw in (None, b"secret"):
            for ck in (False, True):
                w = wrap_record(data, password=pw, checksum=ck)
                if pw is not None:
                    # encrypted body is 16-aligned + 1 pad byte (+4 CRC)
                    assert (len(w) - 1 - (4 if ck else 0)) % ALIGN == 0
                assert unwrap_record(w, password=pw, checksum=ck) == data


def test_crc_detects_corruption():
    data = b"attack at dawn, bucket 7"
    w = bytearray(wrap_record(data, checksum=True))
    w[3] ^= 0x40
    with pytest.raises(DataCorruptionError):
        unwrap_record(bytes(w), checksum=True)
    # zlib.crc32 is the same polynomial as java.util.zip.CRC32: the
    # trailer equals the direct digest of the body
    w2 = wrap_record(data, checksum=True)
    assert struct.unpack(">I", w2[-4:])[0] == (zlib.crc32(data) & M)


def test_forest_checkpoint_encrypted_roundtrip(tmp_path):
    from similaritysearchbyrdf_tpu import (
        DenseBatch, RDFConfig, RDFForest, load_forest, save_forest)
    from similaritysearchbyrdf_tpu.config import TableConfig

    rng = np.random.default_rng(3)
    x = rng.normal(size=(512, 16)).astype(np.float32)
    conf = RDFConfig(
        vector_dim=16, table_num=2, permutation_num=1, top_k=5,
        lsh_table=TableConfig(chain_length=8, bucket_overflow=32),
        max_candidates=256, query_batch_size=64)
    f = RDFForest(conf).fit(DenseBatch(np.arange(512, dtype=np.int32), x))
    base = str(tmp_path / "enc")
    save_forest(f, base, password=b"pw", checksum=True)
    # the file is not a plain npz (encrypted + checksummed)
    raw = open(base + ".npz", "rb").read()
    assert raw[:4] == b"RDFX" and not raw[5:].startswith(b"PK")
    g = load_forest(base, password=b"pw", checksum=True)
    ids_f, _ = f.query(x[:16])
    ids_g, _ = g.query(x[:16])
    np.testing.assert_array_equal(ids_f, ids_g)
    # mismatched open options raise WrongConfig, as in Store.java:150-174
    with pytest.raises(WrongConfigError):
        load_forest(base, password=b"pw")            # missing checksum
    with pytest.raises(WrongConfigError):
        load_forest(base, checksum=True)             # missing password
    # wrong password -> CRC passes only on the outer layer? (CRC covers
    # ciphertext) -> decrypt garbage fails inside np.load
    with pytest.raises(Exception):
        load_forest(base, password=b"wrong", checksum=True)
    # plain saves reject crypto open options
    base2 = str(tmp_path / "plain")
    save_forest(f, base2)
    with pytest.raises(WrongConfigError):
        load_forest(base2, password=b"pw")
