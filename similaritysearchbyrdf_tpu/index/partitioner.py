"""Content-based partitioners — the paper's distributed indexing scheme.

The reference's `LocalitySensitivePartitioner` (`utils/Partitioner.scala:27-65`)
treats the 32-bit table hash as a 32-dim 0/1 vector and applies a second,
`partitionBits`-long angle chain to it; the top `partitionBits` bits of that
hash are the sub-index id. Each lshTable constructs its *own* partitioner LSH
(`DensevectorRDFInit.scala:71-86`), so here the partition projections are a
single tensor `Q[L, partitionBits, 32]` and partition ids for a whole hash
batch come from one einsum + sign + pack.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RDFConfig, partition_config
from ..models.families import generate_angle_model
from ..ops.bitops import bits_of, pack_bits_msb_first


def generate_partition_projections(
    conf: RDFConfig, seed: Optional[int] = None
) -> jax.Array:
    """Q[L, partitionBits, 32]: one independent partition chain per table,
    drawn the same way the reference synthesizes each table's partitioner LSH
    (vectorDim=32, tableNum=1, chainLength=partitionBits — synthesized config
    at `DensevectorRDFInit.scala:63-70`).

    When `conf.partition_family_file_path` is set, the chains load from that
    checkpoint instead — the reference's `confType=partition` flow, where
    each `LocalitySensitivePartitioner` spawns a file-configured LSH
    (`utils/Partitioner.scala:31`, `LSH.scala:71-77`, checked-in
    `partition-bestHashFamily-angle` resources)."""
    if conf.partition_family_file_path is not None:
        return load_partition_file(conf.partition_family_file_path, conf)
    pconf = partition_config(conf)
    base_seed = conf.seed if seed is None else seed
    qs = []
    for table in range(conf.hash_tables):
        m = generate_angle_model(pconf, seed=base_seed + 7919 * (table + 1))
        # pconf has table_num=1, permutation_num=1: proj is [1, pbits, 32]
        qs.append(np.asarray(m.proj[0]))
    return jnp.asarray(np.stack(qs), dtype=jnp.float32)


def save_partition_file(part_proj: jax.Array, path: str) -> None:
    """Write partition chains in the reference's hash-family text format
    (one 32-dim function per line, `chainLength=partitionBits` lines per
    chain — the `partition-bestHashFamily-angle` artifact layout produced by
    `LSH.outPutTheHashFunctionsIntoFile`, `LSH.scala:173-195`)."""
    from ..models.families import _sparse_vector_str

    q = np.asarray(part_proj)                       # [L, pbits, 32]
    lines = []
    vid = 0
    for t in range(q.shape[0]):
        for j in range(q.shape[1]):
            lines.append(_sparse_vector_str(vid, q[t, j]))
            vid += 1
    with open(path, "w") as fh:
        fh.write("\r\n".join(lines) + "\r\n")


def load_partition_file(path: str, conf: RDFConfig) -> jax.Array:
    """Load partition chains from the reference text format. A file holding
    ONE chain (partitionBits functions) is broadcast to every table — the
    reference gives every lshTable a partitioner built from the same file
    (`DensevectorRDFInit.scala:71-86`); a file holding `total_tables` chains
    assigns one per table (the per-table-independent layout
    `generate_partition_projections` produces)."""
    from ..vectors import from_string

    pbits = conf.partition_bits
    rows = []
    with open(path, "r") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            _, size, idx, val = from_string(line)
            dense = np.zeros(size, dtype=np.float32)
            dense[idx] = val
            rows.append(dense)
    if len(rows) % pbits != 0:
        raise ValueError(
            f"{path}: {len(rows)} functions not divisible by "
            f"partitionBits {pbits}"
        )
    chains = np.stack(rows).reshape(-1, pbits, rows[0].shape[0])
    l = conf.hash_tables
    if chains.shape[0] == 1:
        chains = np.broadcast_to(chains, (l,) + chains.shape[1:])
    elif chains.shape[0] != l:
        raise ValueError(
            f"{path}: {chains.shape[0]} partition chains for {l} tables "
            "(expected 1 or total_tables)"
        )
    if chains.shape[2] != 32:
        raise ValueError(f"{path}: partition functions must be 32-dim")
    return jnp.asarray(chains, dtype=jnp.float32)


@jax.jit
def partition_of_hash(hashes: jax.Array, q: jax.Array) -> jax.Array:
    """Sub-index id for each (point, table) hash.

    hashes: uint32 [B, L]; q: f32 [L, pbits, 32] → int32 [B, L] in
    [0, 2**pbits).

    Mirrors `LocalitySensitivePartitioner.getPartition`
    (`utils/Partitioner.scala:40-64`): bit i of the hash is component i of a
    32-dim vector (LSB at index 0); the angle chain packs its sign bits
    MSB-first then the top `pbits` bits are taken — i.e. the packed pbits
    value itself.
    """
    bits = bits_of(hashes).astype(jnp.float32)          # [B, L, 32]
    dots = jnp.einsum(
        "blk,lpk->blp", bits, q, preferred_element_type=jnp.float32
    )                                                    # [B, L, pbits]
    signs = (dots > 0).astype(jnp.int32)
    pbits = q.shape[1]
    packed = pack_bits_msb_first(signs, total_bits=32)   # signs at top bits
    return (packed >> jnp.uint32(32 - pbits)).astype(jnp.int32)


def hash_partition(values: jax.Array, num_partitions: int) -> jax.Array:
    """The dataTable's `HashPartitioner`: `value.hashCode % numPartitions`
    (`utils/Partitioner.scala:14-18`). For int keys hashCode is identity."""
    return jnp.abs(values.astype(jnp.int32)) % jnp.int32(num_partitions)


def stepwise_patterns(partition_bits: int, steps: int) -> np.ndarray:
    """All XOR patterns within Hamming distance <= steps of a partition id —
    the "multiple-step search strategy" (`findStepWiseSubIndexIDs`,
    `RandomDrawTreeMap.java:613-621`). Static per (pbits, steps), so the
    query fan-out is a fixed dimension of the probe tensor."""
    n = 1 << partition_bits
    pats = [p for p in range(n) if bin(p).count("1") <= steps]
    return np.asarray(pats, dtype=np.uint32)
