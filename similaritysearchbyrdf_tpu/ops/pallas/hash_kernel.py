"""Pallas fused angle-hash kernel: projection matmul + sign + permuted
bit-pack in one VMEM-resident pass.

The XLA path (`ops/hashing.hash_dense`) materializes the `[B, T, C]` dot
tensor and the `[B, T, P, C]` permuted sign tensor in HBM between ops; this
kernel keeps both in VMEM: each grid step loads a query tile, runs the
`[TB, D] x [D, T*C]` contraction on the MXU, applies sign and the
permutation-aware bit weights on the VPU, and writes only the final
`[TB, T*P]` packed hashes.

The permutation bit-pack is expressed as a second (sign-matrix × weight)
contraction: hash[b, t, p] = Σ_c sign[b, t, c] · W[t, p, c] with
W[t, p, c] = 2^(31 - j) where perm[t, p, j] = c. Powers up to 2^31 exceed
f32's exact-integer range, so W is split into a high and a low 16-bit half,
each exactly representable, combined with a shift — keeping BOTH
contractions on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.families import HashModel
from ...models.transforms import apply_type_of_index


def _pack_weights(perm: np.ndarray, chain_length: int) -> tuple:
    """W split into high/low halves: W = W_hi * 2^16 + W_lo, each half's
    entries < 2^16 so f32 matmuls are exact."""
    t, p, c = perm.shape
    w = np.zeros((t, p, c), dtype=np.int64)
    for ti in range(t):
        for pi in range(p):
            for j in range(c):
                w[ti, pi, perm[ti, pi, j]] = 1 << (31 - j)
    w_hi = (w >> 16).astype(np.float32)
    w_lo = (w & 0xFFFF).astype(np.float32)
    return w_hi, w_lo


def _hash_kernel(x_ref, proj_ref, whi_ref, wlo_ref, out_ref, *, t, c, tp):
    x = x_ref[:]                                   # [TB, D]
    proj = proj_ref[:]                             # [T*C, D]
    dots = jax.lax.dot_general(
        x, proj,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [TB, T*C]
    signs = (dots > 0).astype(jnp.float32)
    # block-diagonal contraction over tables: W arranged [T*C, T*P] with
    # zeros off-block, so one matmul covers all tables
    hi = jax.lax.dot_general(
        signs, whi_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                              # [TB, T*P]
    lo = jax.lax.dot_general(
        signs, wlo_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # Mosaic has no f32->u32 cast; round-trip through int32 (values are
    # exact integers < 2^16 so the signed cast is lossless)
    hi_i = hi.astype(jnp.int32).astype(jnp.uint32)
    lo_i = lo.astype(jnp.int32).astype(jnp.uint32)
    out_ref[:] = (hi_i << jnp.uint32(16)) + lo_i


def _prepare_weights(model: HashModel):
    """Host-side one-time build of the block-diagonal pack-weight matrices
    (needs the concrete permutation, so this runs outside jit)."""
    if model.family != "angle":
        raise ValueError("pallas hash kernel covers the angle family")
    t, c, d = model.proj.shape
    p = model.perm.shape[1]
    tp = t * p
    w_hi, w_lo = _pack_weights(np.asarray(model.perm), c)
    whi_bd = np.zeros((t * c, tp), dtype=np.float32)
    wlo_bd = np.zeros((t * c, tp), dtype=np.float32)
    for ti in range(t):
        whi_bd[ti * c:(ti + 1) * c, ti * p:(ti + 1) * p] = w_hi[ti].T
        wlo_bd[ti * c:(ti + 1) * c, ti * p:(ti + 1) * p] = w_lo[ti].T
    return jnp.asarray(whi_bd), jnp.asarray(wlo_bd)


def _call(model, whi_bd, wlo_bd, x, block_b, interpret):
    b, d = x.shape
    t, c, _ = model.proj.shape
    tp = whi_bd.shape[1]
    proj_flat = model.proj.reshape(t * c, d)
    block_b = min(block_b, b)
    if b % block_b != 0:
        pad = block_b - b % block_b
        x = jnp.pad(x, ((0, pad), (0, 0)))
    nb = x.shape[0] // block_b

    out = pl.pallas_call(
        functools.partial(_hash_kernel, t=t, c=c, tp=tp),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], tp), jnp.uint32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((block_b, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t * c, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t * c, tp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t * c, tp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, tp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x, proj_flat, whi_bd, wlo_bd)
    h = out[:b]
    return apply_type_of_index(h, model.type_of_index, model.sampling_perm)


def pallas_hash_dense(
    model: HashModel,
    x: jax.Array,                # f32[B, D]
    block_b: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for `hash_dense` (angle family), Pallas-fused.
    Returns u32[B, T*P] with the typeOfIndex transform applied. For repeated
    calls use :func:`make_pallas_hash_fn` (prebuilds weights, jitted)."""
    whi_bd, wlo_bd = _prepare_weights(model)
    return _call(model, whi_bd, wlo_bd, x, block_b, interpret)


def make_pallas_hash_fn(model: HashModel, block_b: int = 256):
    """Returns a jitted `x -> hashes` closure with the weight matrices
    prebuilt once for this model."""
    whi_bd, wlo_bd = _prepare_weights(model)
    return jax.jit(
        lambda x: _call(model, whi_bd, wlo_bd, x, block_b, False)
    )
