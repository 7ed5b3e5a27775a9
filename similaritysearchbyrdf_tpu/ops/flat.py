"""Quantized-flat engine: brute-force sketch scan on the MXU + exact refine.

The reference's whole design (LSH forest, partitions, multi-step search —
`RandomDrawTreeMap.java`, `LSH.scala`) exists because exhaustive scoring is
unaffordable on a CPU (its published 1.2M GloVe operating point is ~40 QPS,
`results.png`). A TPU inverts that calculus: a low-precision copy of the
corpus streams through the MXU at HBM bandwidth, so scoring EVERY vector
costs ~N·2 bytes of memory traffic per query batch — at 8M×96d that is
milliseconds per 1024 queries, faster than any pruning structure whose
per-candidate cost is a random gather. This module is that engine:

  stage 1  scores = q̂ · sketchᵀ      (bf16 or int8 matmul, blocked scan)
  stage 2  per-block approx top-`refine` (PartialReduce on TPU)
  stage 3  exact f32 re-score of the merged survivors, final top-k

Block size dominates throughput: per-block costs (approx_max_k launch +
survivor merge) amortize with block width, and the score-tile traffic is
block-size independent — measured at 8M×96d/1024 queries on v5e:
block 32k → 1.4k qps, 512k → 7.9k, 2M → 11.7k qps at recall 0.986
(scripts/tune_flat.py). Default 1M keeps the [B, block] f32 score tile at
4 GB for B=1024; raise to 2M when HBM allows.

It is a deliberate TPU-native extension (COVERAGE.md divergence #9), not a
reference behavior: same query surface as the forest, recall ≈ exact. The
forest remains the engine with reference candidate-set semantics, dynamic
insert/remove, sparse data, and tiered persistence.

int8 notes: corpus rows quantize with one global scale (127/max|x|); each
query quantizes with its own scale — a per-query positive factor that
leaves per-query ranking unchanged. int8 scores fit f32 exactly
(≤ D·127² < 2²⁴ for D ≤ 1024).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .exact import _top_k


def build_flat_sketch(
    corpus: jax.Array,            # f32[N, D]
    dtype: str = "int8",
) -> Tuple[jax.Array, float]:
    """Low-precision scoring copy of the corpus. Returns (sketch, scale);
    scale is the int8 quantization factor (1.0 for bf16)."""
    if dtype == "bfloat16":
        return corpus.astype(jnp.bfloat16), 1.0
    if dtype != "int8":
        raise ValueError(f"unsupported flat sketch dtype: {dtype}")
    amax = float(jnp.max(jnp.abs(corpus)))
    scale = 127.0 / max(amax, 1e-30)
    q = jnp.clip(jnp.round(corpus * scale), -127, 127).astype(jnp.int8)
    return q, scale


@functools.partial(
    jax.jit, static_argnames=("k", "refine", "block", "exclude_self")
)
def flat_topk(
    sketch: jax.Array,            # int8/bf16 [N, D]
    corpus: jax.Array,            # f32[N, D] (exact tier)
    row_ids: jax.Array,           # i32[N] user ids (-1 = dead row)
    queries: jax.Array,           # f32[B, D]
    query_ids: jax.Array,         # i32[B] (-1 = no self-exclusion)
    k: int,
    refine: int = 128,
    block: int = 1 << 20,
    exclude_self: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (ids i32[B,k] user ids, scores f32[B,k]); -1 pads. One jit
    program; peak memory is one [B, block] score tile plus the running
    [B, refine] survivor set."""
    n, d = sketch.shape
    b = queries.shape[0]
    block = min(block, n)
    n_pad = int(np.ceil(n / block)) * block
    sk = jnp.pad(sketch, ((0, n_pad - n), (0, 0)))
    n_blocks = n_pad // block
    if sketch.dtype == jnp.int8:
        qs = 127.0 / jnp.maximum(jnp.max(jnp.abs(queries), axis=1,
                                         keepdims=True), 1e-30)
        q_lp = jnp.clip(jnp.round(queries * qs), -127, 127).astype(jnp.int8)
    else:
        q_lp = queries.astype(sketch.dtype)
    refine_blk = min(refine, block)

    def body(carry, ci):
        best_s, best_i = carry
        rows = jax.lax.dynamic_slice_in_dim(sk, ci * block, block)
        scores = jnp.einsum(
            "bd,nd->bn", q_lp, rows, preferred_element_type=jnp.float32
        )                                               # [B, block] f32
        ids = ci * block + jnp.arange(block, dtype=jnp.int32)[None, :]
        scores = jnp.where(ids < n, scores, -jnp.inf)
        s_blk, ti = jax.lax.approx_max_k(scores, refine_blk)
        i_blk = jnp.take_along_axis(
            jnp.broadcast_to(ids, (b, block)), ti, axis=1
        )
        cat_s = jnp.concatenate([best_s, s_blk], axis=1)
        cat_i = jnp.concatenate([best_i, i_blk], axis=1)
        return _top_k(cat_s, cat_i, refine), None

    init = (
        jnp.full((b, refine), -jnp.inf, dtype=jnp.float32),
        jnp.full((b, refine), -1, dtype=jnp.int32),
    )
    (sk_s, cand), _ = jax.lax.scan(
        body, init, jnp.arange(n_blocks, dtype=jnp.int32)
    )

    # exact refine: f32 row gather (embedding-lookup fast path) + rescore
    safe = jnp.maximum(cand, 0)
    rows = corpus[safe]                                 # [B, refine, D]
    exact = jnp.einsum(
        "brd,bd->br", rows, queries, preferred_element_type=jnp.float32
    )
    uid = row_ids[safe]
    valid = (cand >= 0) & jnp.isfinite(sk_s) & (uid >= 0)
    if exclude_self:
        valid &= uid != query_ids[:, None]
    exact = jnp.where(valid, exact, -jnp.inf)
    top_s, top_u = _top_k(exact, uid, k)
    return jnp.where(jnp.isfinite(top_s), top_u, -1), top_s


class FlatIndex:
    """Host orchestrator for the quantized-flat engine — the TPU-native
    fast path for dense corpora (same query surface as `RDFForest`)."""

    def __init__(self, sketch_dtype: str = "int8", refine: int = 128,
                 block: int = 1 << 20, query_batch: int = 1024):
        self.sketch_dtype = sketch_dtype
        self.refine = refine
        self.block = block
        self.query_batch = query_batch
        self.corpus = None
        self.sketch = None
        self.row_ids = None

    def fit(self, batch) -> "FlatIndex":
        """batch: vectors.DenseBatch."""
        self.corpus = jnp.asarray(batch.values, dtype=jnp.float32)
        self.sketch, self.scale = build_flat_sketch(
            self.corpus, self.sketch_dtype
        )
        self.row_ids = jnp.asarray(np.asarray(batch.ids, dtype=np.int32))
        return self

    def query(
        self,
        queries: np.ndarray,
        k: int = 10,
        query_ids: Optional[np.ndarray] = None,
        exclude_self: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        if self.corpus is None:
            print("need to fit the data first")
            return (np.full((len(queries), k), -1, np.int32),
                    np.full((len(queries), k), -np.inf, np.float32))
        q = np.asarray(queries, dtype=np.float32)
        nq = len(q)
        qids = (np.asarray(query_ids, dtype=np.int32)
                if query_ids is not None
                else np.full((nq,), -1, np.int32))
        bsz = self.query_batch
        out_i, out_s = [], []
        for s0 in range(0, nq, bsz):
            s1 = min(s0 + bsz, nq)
            pad = bsz - (s1 - s0)
            qc = jnp.asarray(np.pad(q[s0:s1], ((0, pad), (0, 0))))
            qi = jnp.asarray(np.pad(qids[s0:s1], (0, pad),
                                    constant_values=-1))
            ids, scores = flat_topk(
                self.sketch, self.corpus, self.row_ids, qc, qi, k,
                refine=self.refine, block=self.block,
                exclude_self=exclude_self,
            )
            out_i.append(np.asarray(ids[: s1 - s0]))
            out_s.append(np.asarray(scores[: s1 - s0]))
        return np.concatenate(out_i), np.concatenate(out_s)
