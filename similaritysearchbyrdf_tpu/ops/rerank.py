"""Exact top-k re-ranking of candidate sets.

Replaces the reference's breeze `argsort(dataMatrix * queryVec)` re-rank
(HOT LOOP #4, `DensevectorRDFInit.scala:487-490`) with a batched
gather → dot → masked `lax.top_k`. Scoring is inner-product similarity,
matching the reference. A fused Pallas variant lives in
`ops/pallas/rerank_kernel.py` and is selected by the front-end when
profitable.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


@functools.partial(jax.jit, static_argnames=("k", "compute_dtype"))
def rerank_dense(
    corpus: jax.Array,      # f32[N, D]
    cand: jax.Array,        # i32[B, M] candidate row positions (-1 = invalid)
    queries: jax.Array,     # f32[B, D]
    k: int,
    compute_dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (ids i32[B, k] with -1 padding, scores f32[B, k])."""
    valid = cand >= 0
    safe = jnp.maximum(cand, 0)
    vecs = jnp.take(corpus, safe, axis=0)  # [B, M, D]
    scores = jnp.einsum(
        "bmd,bd->bm",
        vecs.astype(compute_dtype),
        queries.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    scores = jnp.where(valid, scores, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_ids = jnp.take_along_axis(cand, top_idx, axis=1)
    top_ids = jnp.where(top_scores > NEG_INF, top_ids, -1)
    return top_ids, top_scores


@functools.partial(jax.jit, static_argnames=("k", "refine"))
def rerank_dense_two_stage(
    corpus_lp: jax.Array,    # bf16[N, D] low-precision copy (coarse pass)
    corpus: jax.Array,       # f32[N, D] exact copy (refinement pass)
    cand: jax.Array,         # i32[B, M] (-1 = invalid)
    queries: jax.Array,      # f32[B, D]
    k: int,
    refine: int = 128,
) -> Tuple[jax.Array, jax.Array]:
    """Coarse bf16 scoring of all M candidates (half the gather traffic),
    then exact f32 re-scoring of the top `refine` — exact final ranking as
    long as the true top-k sits within the bf16 top-`refine` (bf16 relative
    error ~0.4%; refine=128 gives a wide margin)."""
    refine = min(refine, cand.shape[1])
    valid = cand >= 0
    safe = jnp.maximum(cand, 0)
    coarse = jnp.einsum(
        "bmd,bd->bm",
        jnp.take(corpus_lp, safe, axis=0).astype(jnp.bfloat16),
        queries.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    coarse = jnp.where(valid, coarse, NEG_INF)
    _, top_idx = jax.lax.top_k(coarse, refine)                  # [B, refine]
    sub_cand = jnp.take_along_axis(cand, top_idx, axis=1)
    return rerank_dense(corpus, sub_cand, queries, k)


@functools.partial(jax.jit, static_argnames=("k",))
def rerank_sparse(
    corpus_indices: jax.Array,  # i32[N, NNZ]
    corpus_values: jax.Array,   # f32[N, NNZ]
    cand: jax.Array,            # i32[B, M] (-1 = invalid)
    query_dense: jax.Array,     # f32[B, D] (densified queries)
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Sparse-corpus re-rank: gather candidate rows' (idx, val) pairs and
    accumulate val * query[idx]. The query side is densified (queries are a
    small batch; the corpus stays sparse). This computes the *correct*
    sparse·dense dot — deliberately not the reference's positional-zip bug
    (`SimilarityCalculator.scala:40-49`, flagged by SURVEY.md §7(f))."""
    valid = cand >= 0
    safe = jnp.maximum(cand, 0)
    c_idx = jnp.take(corpus_indices, safe, axis=0)  # [B, M, NNZ]
    c_val = jnp.take(corpus_values, safe, axis=0)   # [B, M, NNZ]
    q_gather = jnp.take_along_axis(
        query_dense[:, None, :], c_idx, axis=2
    )                                                # [B, M, NNZ]
    scores = jnp.sum(c_val * q_gather, axis=-1)
    scores = jnp.where(valid, scores, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_ids = jnp.take_along_axis(cand, top_idx, axis=1)
    top_ids = jnp.where(top_scores > NEG_INF, top_ids, -1)
    return top_ids, top_scores


def dedup_sorted(cand: jax.Array, sentinel: int = 2**31 - 1) -> jax.Array:
    """Sort candidate ids per row and mark duplicates invalid (-1).

    The reference unions per-table candidate lists into a scala Set
    (`DensevectorRDFInit.scala:426-429`); on TPU the set is a sort + adjacent
    compare over a fixed-width buffer.
    """
    x = jnp.where(cand >= 0, cand, sentinel)
    x = jnp.sort(x, axis=-1)
    dup = jnp.concatenate(
        [jnp.zeros_like(x[..., :1], dtype=bool), x[..., 1:] == x[..., :-1]], axis=-1
    )
    return jnp.where((x == sentinel) | dup, -1, x)
