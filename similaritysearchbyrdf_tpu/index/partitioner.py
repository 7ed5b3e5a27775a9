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

import functools
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
    at `DensevectorRDFInit.scala:63-70`)."""
    pconf = partition_config(conf)
    base_seed = conf.seed if seed is None else seed
    qs = []
    for table in range(conf.total_tables):
        m = generate_angle_model(pconf, seed=base_seed + 7919 * (table + 1))
        # pconf has table_num=1, permutation_num=1: proj is [1, pbits, 32]
        qs.append(np.asarray(m.proj[0]))
    return jnp.asarray(np.stack(qs), dtype=jnp.float32)


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
