"""Pure-numpy scalar oracle of the reference semantics, for parity tests.

Implements, one int at a time, the behavioral contract extracted from the
reference (SURVEY.md §2-3): chain hashing + packing, the partitioner, the
adaptive-prefix bucket rule, step-wise search, multi-probe, dedup, and exact
re-rank. The production code must agree with this oracle bit-for-bit on ids.
"""

from __future__ import annotations

import numpy as np

U32 = np.uint32
MASK32 = 0xFFFFFFFF


def i32(x: int) -> int:
    """wrap to signed 32-bit"""
    x &= MASK32
    return x - (1 << 32) if x >= (1 << 31) else x


# -- hashing ---------------------------------------------------------------


def angle_chain_hash(proj_chain: np.ndarray, x: np.ndarray) -> int:
    """`AngleHashChain.compute` (`AngleHashFamily.scala:187-195`)."""
    result = 0
    c = proj_chain.shape[0]
    for j in range(c):
        dot = float(np.dot(proj_chain[j].astype(np.float64), x.astype(np.float64)))
        s = 0 if dot <= 0 else 1
        result = ((result << 1) | s) & MASK32
    return (result << (32 - c)) & MASK32


def pstable_chain_hash(
    proj_chain: np.ndarray, b_chain: np.ndarray, w: int, x: np.ndarray
) -> int:
    """`PStableHashChain.compute` (`PStableHashFamily.scala:122-143`):
    per-function ints → big-endian bytes → java Arrays.hashCode."""
    ints = []
    for j in range(proj_chain.shape[0]):
        dot = float(np.dot(proj_chain[j].astype(np.float64), x.astype(np.float64)))
        ints.append(int(np.float32((np.float32(dot) + np.float32(b_chain[j])) / np.float32(w))))
    h = 1
    for v in ints:
        v &= MASK32
        for shift in (24, 16, 8, 0):
            byte = (v >> shift) & 0xFF
            if byte >= 128:
                byte -= 256
            h = i32(h * 31 + byte)
    return h & MASK32


def partition_of(h: int, q: np.ndarray) -> int:
    """`LocalitySensitivePartitioner.getPartition`
    (`utils/Partitioner.scala:40-64`): bit i of h → component i; angle chain;
    top pbits bits."""
    bits = np.array([(h >> i) & 1 for i in range(32)], dtype=np.float64)
    pbits = q.shape[0]
    result = 0
    for j in range(pbits):
        dot = float(np.dot(q[j].astype(np.float64), bits))
        s = 0 if dot <= 0 else 1
        result = (result << 1) | s
    return result  # == packed << (32-pbits) >>> (32-pbits)


# -- bucket structure ------------------------------------------------------


def composite_key(h: int, part: int, pbits: int, seg_bits: int, consumed: int) -> int:
    bucket_bits = 32 - seg_bits
    seg = h >> bucket_bits
    trie = h & ((1 << consumed) - 1)
    return (part << (seg_bits + consumed)) | (seg << consumed) | trie


def leaf_depth_of_key(
    sorted_keys: np.ndarray, key: int, pbits: int, seg_bits: int,
    bits_per_level: int, num_levels: int, overflow: int,
) -> tuple:
    """Smallest depth whose prefix population <= overflow (capped at the
    deepest level) — the steady state of `putInner`'s dynamic split
    (`RandomDrawTreeMap.java:1719-1768`). Returns (lo, hi) candidate range
    for `key` (possibly empty)."""
    consumed = bits_per_level * num_levels
    for d in range(num_levels):
        shift = consumed - bits_per_level * (d + 1)
        pref = key >> shift
        lo = np.searchsorted(sorted_keys, pref << shift, side="left")
        hi = np.searchsorted(sorted_keys, ((pref + 1) << shift) - 1, side="right")
        if hi - lo <= overflow or d == num_levels - 1:
            return int(lo), int(hi)
    raise AssertionError


def query_candidates(
    sorted_keys_per_table: list,
    sorted_rows_per_table: list,
    hashes: np.ndarray,        # [L] per-table hash of the query
    homes: np.ndarray,         # [L] home partition per table
    pbits: int,
    seg_bits: int,
    bits_per_level: int,
    num_levels: int,
    overflow: int,
    steps: int,
    multiprobe: bool,
) -> set:
    """Union of candidates across tables × step-partitions × probes —
    `getSimilarWithStepWiseFaster` (`RandomDrawTreeMap.java:686-797`)."""
    consumed = bits_per_level * num_levels
    bucket_bits = 32 - seg_bits
    out = set()
    for t in range(len(sorted_keys_per_table)):
        h = int(hashes[t])
        home = int(homes[t])
        parts = [
            p for p in range(1 << pbits) if bin(p ^ home).count("1") <= steps
        ]
        if multiprobe:
            nlz = 32 - h.bit_length()
            probes = [h ^ (1 << i) for i in range(max(0, 32 - nlz - seg_bits))]
        else:
            probes = [h]
        for pro in probes:
            for part in parts:
                # seg always from original h; pro's flips stay below seg bits
                key = composite_key(
                    (h >> bucket_bits << bucket_bits) | (pro & ((1 << bucket_bits) - 1)),
                    part, pbits, seg_bits, consumed,
                )
                lo, hi = leaf_depth_of_key(
                    sorted_keys_per_table[t], key, pbits, seg_bits,
                    bits_per_level, num_levels, overflow,
                )
                for i in range(lo, hi):
                    row = sorted_rows_per_table[t][i]
                    if row >= 0:
                        out.add(int(row))
    return out


def exact_topk(corpus: np.ndarray, cand: set, q: np.ndarray, k: int,
               exclude: int = -1) -> list:
    """breeze argsort re-rank (`DensevectorRDFInit.scala:487-490`)."""
    cand = sorted(c for c in cand if c != exclude)
    if not cand:
        return []
    scores = corpus[cand].astype(np.float64) @ q.astype(np.float64)
    order = np.argsort(-scores, kind="stable")
    return [cand[i] for i in order[:k]]
