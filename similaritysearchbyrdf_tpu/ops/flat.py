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
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .exact import _top_k

# group-max kernel schedule knobs (env-overridable for on-hardware tuning,
# scripts/tune_gmax_nsub.py / attrib_flat_r03.py): block_b sets the MXU
# tile's query width (wider = fewer sketch re-reads from HBM: the sketch
# streams B/block_b times); nsub software-pipelines each tile so the MXU
# matmul and VPU group-max reduce overlap instead of adding. Default 512:
# measured 11.0 ms vs 14.6 at bb=128 / 16.6 at bb=256 at 8M x 96 B1024
# (results/attrib_flat_r03.json gmax_bb* rows).
_GMAX_BLOCK_B = int(os.environ.get("FLAT_GMAX_BLOCK_B", "512"))
_GMAX_NSUB = int(os.environ.get("FLAT_GMAX_NSUB", "1"))

# group-select stage knobs. The select is the grouped pipeline's most
# expensive stage after the gmax kernel (35 ms of 58 at NG=131k/B=1024,
# results/attrib_flat_r03.json) and its cost is ALL gather elements: the
# two-level exact select gathers rg*sg child maxes per query at ~16
# ns/element (CLAUDE.md cost model). Modes: "exact2" two-level exact
# (supergroup max -> top-rg supergroups -> row-gather children -> top-rg;
# FLAT_SELECT_SG sets the supergroup width = the gather size/level-1
# top_k tradeoff), "approx" flat approx_max_k over [B, NG], "topk" flat
# exact lax.top_k, "argpack" argmax-packed kernel output (int8 only: the
# top-refine groups' best rows are the candidates — no window rescore),
# "auto" = argpack at large N (where the per-group collision loss is
# negligible), exact2 otherwise.
_SELECT_MODE = os.environ.get("FLAT_SELECT_MODE", "auto")
# supergroup width default is MODE-dependent when the env is unset: 64 for
# the exact2 two-level select (tune_select_r03.json), 32 for argpack where
# the packed-key level-1 fold is cheaper than the level-2 gather
# (33,919 vs 32,310 qps at sg=64, results/tune_argpack.json batch 35)
_SELECT_SG_ENV = os.environ.get("FLAT_SELECT_SG")
_SELECT_SG = int(_SELECT_SG_ENV) if _SELECT_SG_ENV is not None else 64


def _default_select_sg(mode: str) -> int:
    if _SELECT_SG_ENV is not None:
        return int(_SELECT_SG_ENV)
    return 32 if mode == "argpack" else 64


# argpack level-2 formulation: "approx" (approx_max_k on the f32 score) or
# "sort" (exact 2-operand descending sort on the packed i32 key). Default
# sort: exact AND faster at the narrow sg=32 level-2 width (batch 33/35,
# results/tune_argpack.json).
_ARGPACK_L2 = os.environ.get("FLAT_ARGPACK_L2", "sort")
# FLAT_GMAX_QLANE: the lane-reduction gmax kernel (query-major output
# with NO in-kernel transpose — the transpose costs ~4.2 ms at 8M x 96
# B1024; +1.2k qps over qmajor, results/tune_argpack.json batch 35).
# Needs the strided sketch copy (gmax_halved machinery); engages only
# when the caller supplies it (FlatIndex builds it for argpack-eligible
# corpora at qmajor-plan widths). Default on.
_GMAX_QLANE = os.environ.get("FLAT_GMAX_QLANE", "1") == "1"
# FLAT_GMAX_EMIT_SG=16: qlane additionally emits the level-1 supergroup
# maxima (16 adjacent groups each) as a fused second output, deleting the
# argpack select's full [B, NG] HBM re-read (3.22 ms of the 31.1 ms wall,
# results/bisect_argpack.json). Coarser select_sg folds from the emitted
# tier in XLA. Only meaningful with FLAT_GMAX_QLANE=1.
_GMAX_EMIT_SG = int(os.environ.get("FLAT_GMAX_EMIT_SG", "0"))

# argpack trades non-argmax rows of multiply-hit groups for more groups;
# the per-query chance that two true top-10 rows share a 64-row group is
# ~C(10,2)/NG, so gate "auto" on NG >= 16384 (N >= 1M): loss < 0.03%/10,
# far below int8 sketch ordering noise.
_ARGPACK_MIN_ROWS = 1 << 20


def _resolve_select_mode(mode: str, sketch_dtype, nrows: int,
                         d: int = 0) -> str:
    # packed = score*64 + member must fit int32: |score| <= d*127^2, so
    # argpack is only sound for d <= ~2081 lanes (the sparse flat engine's
    # densified 4096d sketches stay on exact2)
    pack_ok = sketch_dtype == jnp.int8 and d * 127 * 127 * _GROUP < 2**31
    if mode != "auto":
        if mode == "argpack" and not pack_ok:
            return "exact2"
        return mode
    if pack_ok and nrows >= _ARGPACK_MIN_ROWS:
        return "argpack"
    return "exact2"

# halved group-max: feed the gmax kernel a STRIDED second copy of the
# sketch (built once at fit) so the in-kernel group reduce is log2(group)
# contiguous half-tile maxima instead of a cross-sublane reshape-reduce —
# see flat_groupmax._gmax_kernel. Costs one extra int8 sketch copy in HBM
# (128 B/vector at d<=128), used only by the grouped path's gmax stage.
_GMAX_HALVED = os.environ.get("FLAT_GMAX_HALVED", "0") == "1"

_GROUP = 64          # rows per gmax group == window rows (win floor 64)
_BLOCK_N = 8192      # gmax kernel sketch tile rows (npad rounds to this)


def stride_for_halved_gmax(
    sketch_padded: jax.Array,     # [Npad, D], Npad % _BLOCK_N == 0
    block_n: int = _BLOCK_N,
    group: int = _GROUP,
) -> jax.Array:
    """Block-local strided permutation for the halved gmax kernel: within
    each `block_n`-row block, member m of group j (original row j*group+m)
    moves to row m*J + j (J = block_n//group), so every contiguous half of
    the block holds members of ALL J groups and the group-max reduces by
    pairwise halving. Group numbering (and the kernel's output layout) is
    unchanged."""
    npad, d = sketch_padded.shape
    assert npad % block_n == 0, (npad, block_n)
    j = block_n // group
    return (
        sketch_padded.reshape(-1, j, group, d)
        .swapaxes(1, 2)
        .reshape(npad, d)
    )


def _pad_lanes(a: jax.Array) -> jax.Array:
    """Pad the minor dim to a 128-lane multiple: the TPU's tiled layout
    already allocates those lanes, zero columns add nothing to dots, and
    Pallas DMA slices require whole 128-lane tiles (the grouped path's
    window rescoring kernel)."""
    d = a.shape[-1]
    dp = int(np.ceil(d / 128.0) * 128)
    return a if dp == d else jnp.pad(a, ((0, 0), (0, dp - d)))


def _gmax_tile_plan(dpad: int, group: int = 64):
    """(qmajor_ok, block_n): scoped-vmem plan for the gmax kernels at
    lane-padded width `dpad`. The kernel's Mosaic frame holds the
    double-buffered streamed sketch tile (2·block_n·dpad int8 bytes) plus,
    at small NG, XLA's VMEM-promoted copy of the whole [B, NG] output
    (`grouped_vmem_safe_batch` caps that term). The query-major kernels
    (qmajor/qlane) pin block_n ≥ group·128 — their output lane dim must be
    a 128 multiple — so past dpad=256 the 8192-row tile alone crowds the
    16 MB scoped budget (200k×784d, batch 29: 14.7 MB tile + 9.8 MB
    promoted output OOMed the compile). High D therefore routes to the
    transposed-output kernel with block_n shrunk to keep the tile ≤ 2 MB,
    paying one XLA transpose of [NG, B] — cheap exactly when NG is small
    or B is already capped."""
    if dpad <= 256:
        return True, _BLOCK_N
    block_n = _BLOCK_N
    while block_n > group and 2 * block_n * dpad > (4 << 20):
        block_n //= 2
    return False, block_n


def grouped_vmem_safe_batch(nrows: int, bsz: int, group: int = 64,
                            dpad: int | None = None) -> int:
    """Mid-size-corpus scoped-vmem guard for grouped mode: when
    NG = Npad/group is small, XLA VMEM-promotes the gmax kernel's full
    [B, NG] result (double-buffered) and the COMPILE fails once 2·B·NG·4 B
    exceeds the 16 MB scoped limit — hit at 200k×784d with B=1024
    (NG=3200 → 25.4 MB). Returns bsz capped so the promoted buffer plus
    the kernel's streamed sketch tile (2·block_n·dpad bytes, the term the
    first batch-29 guard missed) stays ≤ 12 MB; large NG (≥16384, every
    ≥1M-row corpus) is not promoted (measured fine at 1.2M/8M rows with
    B=1024)."""
    npad = -(-int(nrows) // _BLOCK_N) * _BLOCK_N
    ng = npad // group
    if ng >= 16384:
        return bsz
    budget = 12 << 20
    if dpad is not None:
        _, block_n = _gmax_tile_plan(dpad, group)
        budget -= 2 * block_n * dpad
    return min(bsz, max(128, budget // (ng * 8) // 128 * 128))


def effective_query_batch(nq: int, query_batch: int) -> int:
    """Clamp the padded dispatch batch to the work actually present: the
    next power of two >= nq (floor 32), capped at `query_batch`. Large
    callers (nq >= query_batch) are unchanged — benches keep their exact
    warmed shapes — but a 32-query call no longer pays for 1024 padded
    rows of window gathers (32x wasted work on small probes/tests). The
    pow2 rounding bounds the number of distinct compiled programs."""
    if nq >= query_batch:
        return query_batch
    b = 32
    while b < nq:
        b <<= 1
    return min(b, query_batch)


def build_flat_sketch(
    corpus: jax.Array,            # f32[N, D]
    dtype: str = "int8",
) -> Tuple[jax.Array, float]:
    """Low-precision scoring copy of the corpus, lane-padded to 128.
    Returns (sketch, scale); scale is the int8 quantization factor
    (1.0 for bf16)."""
    if dtype == "bfloat16":
        return _pad_lanes(corpus.astype(jnp.bfloat16)), 1.0
    if dtype != "int8":
        raise ValueError(f"unsupported flat sketch dtype: {dtype}")
    amax = float(jnp.max(jnp.abs(corpus)))
    scale = 127.0 / max(amax, 1e-30)
    # fused quantize: eager op-by-op dispatch materializes TWO full-size
    # f32 temporaries (mul, round) — at 8M x 128 that is +8.2 GB and the
    # difference between fitting and OOMing a 16 GB chip next to the
    # cluster-ordered tiers (batch-65 finding); one jit emits a single
    # read-f32/write-i8 pass
    q = _quantize_int8(corpus, jnp.float32(scale))
    return _pad_lanes(q), scale


@jax.jit
def _quantize_int8(corpus: jax.Array, scale: jax.Array) -> jax.Array:
    return jnp.clip(jnp.round(corpus * scale), -127, 127).astype(jnp.int8)


def _exact_refine(corpus, row_ids, queries, cand, pre_valid, query_ids, k,
                  exclude_self):
    """Exact f32 re-score + final top-k, tolerant of a lane-padded corpus
    (zero columns add nothing to the dot; queries pad to match)."""
    n = row_ids.shape[0]
    safe = jnp.clip(cand, 0, n - 1)
    rows = corpus[safe]
    qx = queries
    if corpus.shape[1] != queries.shape[1]:
        qx = jnp.pad(queries,
                     ((0, 0), (0, corpus.shape[1] - queries.shape[1])))
    # HIGHEST: the TPU MXU's default f32 matmul truncates both operands to
    # bfloat16 — measured 0.9875 top-10 agreement with true-f32 ordering on
    # the clustered deep corpus (near-tie flips; the deep8m "recall
    # ceiling" of 0.9861 across every engine/knob was exactly this, not
    # candidate saturation). The refine slab is [B, refine, D] — six MXU
    # passes of it are noise next to the scan, so the exact tier is made
    # actually exact.
    exact = jnp.einsum("brd,bd->br", rows, qx,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    uid = row_ids[safe]
    valid = pre_valid & (uid >= 0)
    if exclude_self:
        valid &= uid != query_ids[:, None]
    exact = jnp.where(valid, exact, -jnp.inf)
    top_s, top_u = _top_k(exact, uid, k)
    return jnp.where(jnp.isfinite(top_s), top_u, -1), top_s


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
    q_lp = _pad_lanes(q_lp)[:, :d]        # match a lane-padded sketch
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
    return _exact_refine(corpus, row_ids, queries, cand,
                         (cand >= 0) & jnp.isfinite(sk_s), query_ids, k,
                         exclude_self)


class FlatIndex:
    """Host orchestrator for the quantized-flat engine — the TPU-native
    fast path for dense corpora (same query surface as `RDFForest`)."""

    def __init__(self, sketch_dtype: str = "int8", refine: int = 128,
                 block: int = 1 << 20, query_batch: int = 1024,
                 mode: str = "grouped", r_groups: int = 24,
                 gmax_halved: Optional[bool] = None,
                 corpus_dtype: str = "float32"):
        self.sketch_dtype = sketch_dtype
        self.refine = refine
        self.block = block
        self.query_batch = query_batch
        self.mode = mode            # "grouped" (fused kernel) | "scan"
        self.r_groups = r_groups
        # exact-tier residency: "bfloat16" halves the refine-gather traffic
        # AND the engine's dominant HBM term (8M×96d: 4.1 → 2.0 GB — the
        # Deep-100M plan's memory model, cf. build_ivf_streamed); refine
        # dots accumulate in f32, so only near-ties below bf16's ~3-digit
        # mantissa can reorder (recall impact measured in bench_flat A/B)
        self.corpus_dtype = corpus_dtype
        # strided second sketch copy for the halved gmax reduce (grouped
        # mode, TPU only); env default so benches can A/B without code
        self.gmax_halved = _GMAX_HALVED if gmax_halved is None else (
            gmax_halved)
        self.corpus = None
        self.sketch = None
        self.sketch_gmax = None
        self.row_ids = None

    def _ensure_gmax_sketch(self):
        """Lazily derive the strided gmax copy from the sketch (one device
        relayout; covers fit, save/load, and direct construction). Built
        when the halved kernel asks for it (gmax_halved) OR when the
        default qlane kernel will consume it — i.e. the select resolves to
        argpack (int8, >=1M rows) at a query-major tile-plan width; at
        high D the transposed-kernel route ignores the copy, so skip the
        2x sketch HBM cost there."""
        if self.mode != "grouped" or self.sketch is None:
            return None
        need = self.gmax_halved
        if not need and _GMAX_QLANE:
            d = self.sketch.shape[1]
            need = (_resolve_select_mode(
                        _SELECT_MODE, self.sketch.dtype,
                        self.sketch.shape[0], d) == "argpack"
                    and _gmax_tile_plan(d)[0])
        if not need:
            return None
        if self.sketch_gmax is None and self.sketch is not None:
            nrows = self.sketch.shape[0]
            npad = int(np.ceil(nrows / _BLOCK_N)) * _BLOCK_N
            skp = jnp.pad(self.sketch, ((0, npad - nrows), (0, 0)))
            self.sketch_gmax = stride_for_halved_gmax(skp)
        return self.sketch_gmax

    def fit(self, batch) -> "FlatIndex":
        """batch: vectors.DenseBatch."""
        corpus = jnp.asarray(batch.values, dtype=jnp.float32)
        self.sketch, self.scale = build_flat_sketch(
            corpus, self.sketch_dtype
        )
        # drop any cached strided gmax copy: it was derived from the OLD
        # sketch and, when the new corpus pads to the same npad, would
        # silently score against stale rows (ADVICE r2)
        self.sketch_gmax = None
        # lane-pad the exact tier too: 128-multiple f32 rows gather ~2x
        # faster in the refine's latency-bound regime (bench_rowgather.py)
        self.corpus = _pad_lanes(corpus)
        if self.corpus_dtype == "bfloat16":
            self.corpus = self.corpus.astype(jnp.bfloat16)
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
        bsz = effective_query_batch(nq, self.query_batch)
        if self.mode == "grouped" and self.sketch is not None:
            bsz = grouped_vmem_safe_batch(self.sketch.shape[0], bsz,
                                          dpad=self.sketch.shape[1])
        out_i, out_s = [], []
        for s0 in range(0, nq, bsz):
            s1 = min(s0 + bsz, nq)
            pad = bsz - (s1 - s0)
            qc = jnp.asarray(np.pad(q[s0:s1], ((0, pad), (0, 0))))
            qi = jnp.asarray(np.pad(qids[s0:s1], (0, pad),
                                    constant_values=-1))
            if self.mode == "grouped":
                # no-drop guideline for group-max preselection: >= 3k groups
                # (see flat_groupmax docs) — derive from k so a caller's
                # larger top_k can't silently under-select
                rg = max(self.r_groups, 3 * k)
                sk_gmax = self._ensure_gmax_sketch()
                ids, scores = flat_topk_grouped(
                    self.sketch, self.corpus, self.row_ids, qc, qi, k,
                    refine=self.refine, r_groups=rg,
                    exclude_self=exclude_self,
                    sketch_gmax=sk_gmax,
                    gmax_halved=sk_gmax is not None,
                )
            else:
                ids, scores = flat_topk(
                    self.sketch, self.corpus, self.row_ids, qc, qi, k,
                    refine=self.refine, block=self.block,
                    exclude_self=exclude_self,
                )
            # keep per-batch outputs on device: converting inside the loop
            # blocks dispatch on a host round trip per batch (~34 ms through
            # the remote tunnel, CLAUDE.md); the tiny [bsz, k] slices convert
            # together after every batch has been dispatched
            out_i.append(ids[: s1 - s0])
            out_s.append(scores[: s1 - s0])
        return (np.concatenate([np.asarray(a) for a in out_i]),
                np.concatenate([np.asarray(a) for a in out_s]))


_I32_DEAD = -(2**31 - 1)     # dead-group sentinel; negation-safe (not MIN)


def _fold_emitted_sgmax(sgmax_pre, p3, n, group, sg, emit_sg):
    """Fold the kernel-emitted emit_sg level-1 tier to select_sg-wide
    supergroup maxima instead of re-reading the full [B, NG] packed slab.
    The emitted tier is UNMASKED (the kernel sees the zero-padded strided
    copy, not the g_live mask), but live groups are a PREFIX: supergroups
    fully inside the prefix are exact, so only the boundary-plus-dead tail
    columns (a tiny static slice) are recomputed from the masked packed
    reshape `p3` [B, NSG, sg]."""
    b, nsg, _ = p3.shape
    spre = (sgmax_pre if sg == emit_sg else
            sgmax_pre.reshape(b, nsg, sg // emit_sg).max(axis=-1))
    full_sg = (-(-n // group)) // sg         # fully-live supergroups
    if full_sg >= nsg:
        return spre
    tail = p3[:, full_sg:, :].max(axis=-1)
    return jnp.concatenate([spre[:, :full_sg], tail], axis=1)


def _argpack_candidates(
    sketch: jax.Array,            # int8 [N, D]
    queries: jax.Array,           # f32[B, D]
    refine: int,
    group: int,
    use_pallas: bool,
    select_sg: Optional[int] = None,
    n_live: Optional[int] = None,
    sketch_gmax: Optional[jax.Array] = None,
    gmax_halved: bool = False,
    l2: str = _ARGPACK_L2,
    qlane: bool = _GMAX_QLANE,
    emit_sg: int = _GMAX_EMIT_SG,
) -> Tuple[jax.Array, jax.Array]:
    """Argmax-packed grouped preselection: the gmax kernel emits
    int32 `score*group + member` per group, so the top-`refine` GROUPS by
    packed key directly name their best rows — no window re-score, no
    second select (the round-2 tail: select 4.6 + windows 5.8 + select2
    1.8 ms of a 24.8 ms wall, results/attrib_flat_r04.json).

    Candidate-set quality: any global sketch-top-`refine` row that is its
    group's argmax IS captured (its group's gmax ≥ its score, and at most
    refine-1 groups can rank above it, each needing a strictly better row).
    Only non-argmax rows of multiply-hit groups are traded for the next
    best groups' argmaxes — at corpus-random row order the chance that two
    true top-10 rows share one 64-row group is ~refine/NG per pair
    (≈0.03% at 8M), far below the int8 sketch's own ordering noise.

    Returns (cand i32[B, refine] row positions, sel_s f32[B, refine];
    -inf = invalid)."""
    assert sketch.dtype == jnp.int8, "argpack needs the int8 sketch"
    assert group & (group - 1) == 0, group
    nrows, d = sketch.shape
    n = nrows if n_live is None else n_live
    b = queries.shape[0]
    npad = int(np.ceil(nrows / 8192)) * 8192
    sk = jnp.pad(sketch, ((0, npad - nrows), (0, 0)))
    qs = 127.0 / jnp.maximum(jnp.max(jnp.abs(queries), axis=1,
                                     keepdims=True), 1e-30)
    q_lp = jnp.clip(jnp.round(queries * qs), -127, 127).astype(jnp.int8)
    q_lp = _pad_lanes(q_lp)[:, :d]
    ng = npad // group
    shift = group.bit_length() - 1

    bpad = int(np.ceil(b / 128)) * 128
    sgmax_pre = None        # fused level-1 tier (qlane emit_sg path only)
    qmajor_ok, plan_block_n = _gmax_tile_plan(d, group)
    if use_pallas and jax.default_backend() == "tpu" and not qmajor_ok:
        # high-D route: the query-major kernels pin block_n >= group*128
        # and their 8192-row sketch tile blows scoped vmem past dpad=256 —
        # use the transposed-output kernel with the planned smaller tile
        # (natural layout: the strided halved/qlane copy is laid out for
        # _BLOCK_N tiles) and transpose [NG, B] once in XLA.
        from .pallas.flat_groupmax import pallas_flat_groupmax

        q_in = jnp.pad(q_lp, ((0, bpad - b), (0, 0)))
        packed = pallas_flat_groupmax(
            sk, q_in, group=group, block_b=min(128, bpad),
            block_n=plan_block_n, pack_arg=True,
        ).T[:b]                                         # i32 [B, NG]
    elif use_pallas and jax.default_backend() == "tpu":
        from .pallas.flat_groupmax import pallas_flat_groupmax_qmajor

        q_in = jnp.pad(q_lp, ((0, bpad - b), (0, 0)))
        block_n = 8192
        bb = min(_GMAX_BLOCK_B, bpad)
        while bpad % bb:
            bb -= 128
        nsub = _GMAX_NSUB if block_n % (_GMAX_NSUB * group) == 0 else 1
        use_halved = (gmax_halved and sketch_gmax is not None
                      and group % nsub == 0)
        if use_halved:
            assert sketch_gmax.shape == (npad, d), (
                sketch_gmax.shape, npad, d)
        if qlane and sketch_gmax is not None:
            # lane-reduction kernel: query-major output with no in-kernel
            # transpose; consumes the same strided copy as `halved`
            from .pallas.flat_groupmax import pallas_flat_groupmax_qlane

            assert sketch_gmax.shape == (npad, d), (
                sketch_gmax.shape, npad, d)
            if emit_sg:
                # fused level-1 tier: the kernel emits the supergroup
                # maxima while the gmax tile is still in VMEM — the
                # two-level select below then skips its [B, NG] re-read
                packed, sgmax_t = pallas_flat_groupmax_qlane(
                    sketch_gmax, q_in, group=group, block_b=bb,
                    block_n=block_n, pack_arg=True, emit_sg=emit_sg,
                )
                packed = packed[:b]                     # i32 [B, NG]
                sgmax_pre = sgmax_t.T[:b]               # i32 [B, NG/esg]
            else:
                packed = pallas_flat_groupmax_qlane(
                    sketch_gmax, q_in, group=group, block_b=bb,
                    block_n=block_n, pack_arg=True,
                )[:b]                                   # i32 [B, NG]
        else:
            packed = pallas_flat_groupmax_qmajor(
                sketch_gmax if use_halved else sk, q_in, group=group,
                block_b=bb, block_n=block_n, nsub=nsub, halved=use_halved,
                pack_arg=True,
            )[:b]                                       # i32 [B, NG]
    else:
        # XLA fallback (CPU/tests): identical packed-key math
        scores = jnp.einsum(
            "bd,nd->bn", q_lp.astype(jnp.int32), sk.astype(jnp.int32)
        )
        member = jnp.arange(npad, dtype=jnp.int32) % group
        pk = (scores << shift) | member[None, :]
        packed = pk.reshape(b, ng, group).max(axis=-1)
    g_live = (jnp.arange(ng, dtype=jnp.int32) * group) < n
    packed = jnp.where(g_live[None, :], packed, _I32_DEAD)
    return select_packed_rows(
        packed, group=group, refine=refine, n=n, select_sg=select_sg,
        l2=l2, sgmax_pre=sgmax_pre, emit_sg=emit_sg,
    )


def packed_groupmax_qmajor(
    sk: jax.Array,        # int8 [npad, d]; npad % 8192 == 0 on TPU
    q_i8: jax.Array,      # int8 [B, d] (pre-quantized, pre-lane-padded)
    group: int = 64,
    use_pallas: bool = True,
) -> jax.Array:
    """Argmax-packed group maxima i32[B, npad/group] for a PRE-QUANTIZED
    int8 query slab — the producer half of the argpack pipeline, exposed
    for callers (the forest's scan-mode coarse tier) that manage their own
    quantization so scores stay comparable across multiple sketch slabs.
    TPU: the query-major Pallas kernel; elsewhere the bit-identical XLA
    einsum fallback."""
    npad, d = sk.shape
    b = q_i8.shape[0]
    shift = group.bit_length() - 1
    if use_pallas and jax.default_backend() == "tpu":
        from .pallas.flat_groupmax import pallas_flat_groupmax_qmajor

        bpad = int(np.ceil(b / 128)) * 128
        q_in = jnp.pad(q_i8, ((0, bpad - b), (0, 0)))
        bb = min(_GMAX_BLOCK_B, bpad)
        while bpad % bb:
            bb -= 128
        return pallas_flat_groupmax_qmajor(
            sk, q_in, group=group, block_b=bb, block_n=8192, pack_arg=True,
        )[:b]
    scores = jnp.einsum(
        "bd,nd->bn", q_i8.astype(jnp.int32), sk.astype(jnp.int32)
    )
    member = jnp.arange(npad, dtype=jnp.int32) % group
    pk = (scores << shift) | member[None, :]
    return pk.reshape(b, npad // group, group).max(axis=-1)


def select_packed_rows(
    packed: jax.Array,    # i32[B, NG] argmax-packed group maxima
    group: int,
    refine: int,
    n: int,               # live row count (cand >= n masked out)
    select_sg: Optional[int] = None,
    l2: str = _ARGPACK_L2,
    sgmax_pre: Optional[jax.Array] = None,
    emit_sg: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Two-level exact top-`refine` row select over an argmax-packed slab
    (the consumer half of the argpack pipeline; see `_argpack_candidates`
    for the containment proof). Returns (cand i32[B, refine] row
    positions, sel_s f32[B, refine]; -inf = invalid)."""
    b, ng = packed.shape
    shift = group.bit_length() - 1
    rg = min(refine, ng)
    sg = (select_sg if select_sg is not None
          else _default_select_sg("argpack"))
    if ng % sg == 0 and ng // sg >= 2 * rg:
        # two-level EXACT select (same containment proof as exact2: every
        # top-rg group's supergroup max beats the rg-th best group, and at
        # most rg supergroups can)
        nsg = ng // sg
        p3 = packed.reshape(b, nsg, sg)
        if sgmax_pre is not None and sg % emit_sg == 0:
            sgmax = _fold_emitted_sgmax(sgmax_pre, p3, n, group, sg,
                                        emit_sg)
        else:
            sgmax = p3.max(axis=-1)                      # [B, NSG]
        _, sgi = jax.lax.sort((-sgmax, jnp.broadcast_to(
            jnp.arange(nsg, dtype=jnp.int32), (b, nsg))), num_keys=1)
        sgi = sgi[:, :rg]                                # [B, RG]
        cg = jnp.take_along_axis(p3, sgi[:, :, None], axis=1).reshape(
            b, rg * sg)
        child = (sgi[:, :, None] * sg
                 + jnp.arange(sg, dtype=jnp.int32)).reshape(b, rg * sg)
        # level-2 over the [B, rg*sg] child slab. Two formulations:
        #   approx: approx_max_k over the UNSHIFTED score as f32 — int8
        #     scores are < 2^24 so the f32 value is exact (ordering
        #     identical up to member tie-breaks). Measured 7.41 ms at
        #     [1024, 8192]→128 (results/bisect_argpack.json) — approx_max_k
        #     is compute-bound, not HBM-bound, at these shapes.
        #   sort: one 2-operand descending sort keyed on the packed i32 —
        #     EXACT, and lax.sort at [1024, 2048] costs only 0.49 ms
        #     (same bisect), so the wider slab should still undercut
        #     approx. Payload packs (level-1 rank, child slot) into one
        #     int32 so the sort stays 2-operand (sort cost scales with
        #     operand count, CLAUDE.md).
        if l2 == "sort":
            slot = jnp.broadcast_to(
                jnp.arange(rg * sg, dtype=jnp.int32), cg.shape)
            _, slot_s = jax.lax.sort((-cg, slot), dimension=1, num_keys=1)
            li = slot_s[:, :rg]
        else:
            sc_f = (cg >> shift).astype(jnp.float32)
            _, li = jax.lax.approx_max_k(sc_f, rg, recall_target=0.998)
        gidx = jnp.take_along_axis(child, li, axis=1)
        gpk = jnp.take_along_axis(cg, li, axis=1)
    else:
        sc_f = (packed >> shift).astype(jnp.float32)
        _, li = jax.lax.approx_max_k(sc_f, rg, recall_target=0.998)
        gidx = li
        gpk = jnp.take_along_axis(packed, li, axis=1)

    cand = gidx * group + (gpk & (group - 1))
    sel_s = (gpk >> shift).astype(jnp.float32)
    sel_s = jnp.where((gpk > _I32_DEAD) & (cand < n), sel_s, -jnp.inf)
    if rg < refine:
        cand = jnp.pad(cand, ((0, 0), (0, refine - rg)))
        sel_s = jnp.pad(sel_s, ((0, 0), (0, refine - rg)),
                        constant_values=-np.inf)
    return cand, sel_s


def _grouped_candidates(
    sketch: jax.Array,            # int8/bf16 [N, D]
    queries: jax.Array,           # f32[B, D] (dense or densified)
    refine: int,
    r_groups: int,
    group: int,
    use_pallas: bool,
    recall_target: float,
    select_mode: str = _SELECT_MODE,
    select_sg: Optional[int] = None,
    n_live: Optional[int] = None,
    sketch_gmax: Optional[jax.Array] = None,
    gmax_halved: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Shared grouped preselection: fused matmul+group-max → top groups →
    row-wise window re-score → (cand i32[B, refine] row positions,
    sel_s f32[B, refine] sketch scores; -inf = invalid). Engine-specific
    exact tails (dense f32 rows / sparse merge) consume the output.

    `sketch_gmax` (with gmax_halved=True) is the fit-time strided copy fed
    to the halved gmax kernel; `n_live` is the true row count when `sketch`
    arrives pre-padded (masking uses it, not the padded shape)."""
    if select_mode in ("auto", "argpack"):     # callers resolve; be safe
        select_mode = "exact2"
    nrows, d = sketch.shape
    n = nrows if n_live is None else n_live
    b = queries.shape[0]
    npad = int(np.ceil(nrows / 8192)) * 8192
    sk = jnp.pad(sketch, ((0, npad - nrows), (0, 0)))
    if sketch.dtype == jnp.int8:
        qs = 127.0 / jnp.maximum(jnp.max(jnp.abs(queries), axis=1,
                                         keepdims=True), 1e-30)
        q_lp = jnp.clip(jnp.round(queries * qs), -127, 127).astype(jnp.int8)
    else:
        q_lp = queries.astype(sketch.dtype)
    q_lp = _pad_lanes(q_lp)[:, :d]        # match a lane-padded sketch

    bpad = int(np.ceil(b / 128)) * 128
    if use_pallas and jax.default_backend() == "tpu":
        q_in = jnp.pad(q_lp, ((0, bpad - b), (0, 0)))
        qmajor_ok, block_n = _gmax_tile_plan(d, group)
        if qmajor_ok and (block_n // group) % 128 == 0:
            # query-major output: no XLA transpose of [NG, B] (the select
            # stage's measured wall, results/attrib_flat_r02.json)
            from .pallas.flat_groupmax import pallas_flat_groupmax_qmajor

            bb = min(_GMAX_BLOCK_B, bpad)
            while bpad % bb:                   # both are 128-multiples
                bb -= 128
            nsub = _GMAX_NSUB if block_n % (_GMAX_NSUB * group) == 0 else 1
            use_halved = (gmax_halved and sketch_gmax is not None
                          and group % nsub == 0
                          and group & (group - 1) == 0)
            if use_halved:
                assert sketch_gmax.shape == (npad, d), (
                    "sketch_gmax must be the padded strided copy",
                    sketch_gmax.shape, npad, d)
            gmax = pallas_flat_groupmax_qmajor(
                sketch_gmax if use_halved else sk, q_in, group=group,
                block_b=bb, block_n=block_n, nsub=nsub, halved=use_halved,
            )[:b]                                       # [B, NG]
        else:
            from .pallas.flat_groupmax import pallas_flat_groupmax

            gmax = pallas_flat_groupmax(
                sk, q_in, group=group,
                block_b=min(128, bpad), block_n=block_n,
            ).T[:b]                                     # [B, NG]
    else:
        # XLA fallback (CPU/tests): same math, scores materialized
        scores = jnp.einsum("bd,nd->bn", q_lp, sk,
                            preferred_element_type=jnp.float32)
        gmax = scores.reshape(b, npad // group, group).max(axis=-1)
    ng = npad // group
    # mask all-padding groups (first padded group may be partial — its real
    # rows keep it live; pure-pad groups score garbage zeros → mask)
    g_live = (jnp.arange(ng, dtype=jnp.int32) * group) < n
    gmax = jnp.where(g_live[None, :], gmax, -jnp.inf)
    rg = min(r_groups, ng)
    # the group select bounds end recall: a missed group loses all its rows
    # (refine can't recover it). At large NG a flat approx_max_k over
    # [B, NG] is the pipeline's single most expensive stage (12.2 ms of
    # sort overhead at NG=125k/B=1024 vs 0.64 ms of reads,
    # results/attrib_flat_r02.json) — use an EXACT two-level select
    # instead: any top-rg group's 64-group supergroup has super-max >= the
    # rg-th best group max, and at most rg supergroups can (each needs a
    # >= rg-th-best group inside), so the top-rg supergroups provably
    # contain every top-rg group.
    sg = (select_sg if select_sg is not None
          else _default_select_sg(select_mode))
    if (select_mode == "exact2" and ng % sg == 0
            and ng // sg >= 4 * rg):
        nsg = ng // sg
        g3 = gmax.reshape(b, nsg, sg)
        sgmax = g3.max(axis=-1)                           # [B, NSG]
        _, sgi = jax.lax.top_k(sgmax, rg)                 # exact, [B, RG]
        # row-gather the selected supergroups' children (minor dim fully
        # spanned -> vectorized gather): rg*sg elements/query is the
        # stage's whole cost, so sg trades gather bytes against the
        # level-1 top_k's O(nsg*rg) scan
        cg = jnp.take_along_axis(
            g3, sgi[:, :, None], axis=1
        ).reshape(b, rg * sg)                             # [B, RG*sg]
        child = (
            sgi[:, :, None] * sg + jnp.arange(sg, dtype=jnp.int32)
        ).reshape(b, rg * sg)
        _, ci = jax.lax.top_k(cg, rg)
        gidx = jnp.take_along_axis(child, ci, axis=1)     # [B, RG]
    elif select_mode == "topk":
        _, gidx = jax.lax.top_k(gmax, rg)
    else:
        _, gidx = jax.lax.approx_max_k(gmax, rg,
                                       recall_target=recall_target)

    # row-wise sketch re-score of every selected group's rows. Large groups
    # (>64 rows) expand into 64-row windows for the DMA kernel — win=group
    # would blow the kernel's per-step [grp*win, B] VMEM score buffer and
    # shrink grp below the SMEM block-divisibility floor.
    win = min(group, 64)
    wpg = group // win                                  # windows per group
    blk_start = (
        (gidx * group)[:, :, None]
        + (jnp.arange(wpg, dtype=jnp.int32) * win)[None, None, :]
    ).reshape(b, rg * wpg)                              # 8-aligned starts
    if use_pallas and jax.default_backend() == "tpu":
        from .pallas.coarse_gather import pallas_coarse_scores_aligned

        w_scores = pallas_coarse_scores_aligned(
            sk[None], _pad_lanes(queries.astype(jnp.bfloat16))[:, :d],
            jnp.zeros_like(blk_start), blk_start, win,
        )                                               # [B, RG*wpg, win]
    else:
        rows_i = blk_start[:, :, None] + jnp.arange(win, dtype=jnp.int32)
        w_rows = sk[jnp.clip(rows_i, 0, npad - 1)]      # [B, RG*wpg, win, D]
        w_scores = jnp.einsum(
            "brgd,bd->brg", w_rows.astype(jnp.bfloat16),
            _pad_lanes(queries.astype(jnp.bfloat16))[:, :d],
            preferred_element_type=jnp.float32,
        )
    pos = (blk_start[:, :, None]
           + jnp.arange(win, dtype=jnp.int32)[None, None, :])
    m = rg * group
    w_scores = jnp.where(pos < n, w_scores, -jnp.inf).reshape(b, m)
    pos = pos.reshape(b, m)
    r2 = min(refine, m)
    _, sel = jax.lax.approx_max_k(w_scores, r2, recall_target=recall_target)
    cand = jnp.take_along_axis(pos, sel, axis=1)        # [B, refine]
    sel_s = jnp.take_along_axis(w_scores, sel, axis=1)
    sel_s = jnp.where(cand < n, sel_s, -jnp.inf)
    return cand, sel_s


@functools.partial(
    jax.jit,
    static_argnames=("k", "refine", "r_groups", "group", "exclude_self",
                     "use_pallas", "recall_target", "select_mode",
                     "select_sg", "gmax_halved", "argpack_l2",
                     "gmax_qlane", "gmax_emit_sg"),
)
def flat_topk_grouped(
    sketch: jax.Array,            # int8/bf16 [N, D]
    corpus: jax.Array,            # f32[N, D] (may be lane-padded)
    row_ids: jax.Array,           # i32[N]
    queries: jax.Array,           # f32[B, D]
    query_ids: jax.Array,         # i32[B]
    k: int,
    refine: int = 128,
    r_groups: int = 32,
    group: int = 64,
    exclude_self: bool = True,
    use_pallas: bool = True,
    recall_target: float = 0.998,
    select_mode: str = _SELECT_MODE,
    select_sg: Optional[int] = None,
    sketch_gmax: Optional[jax.Array] = None,
    gmax_halved: bool = False,
    argpack_l2: str = _ARGPACK_L2,
    gmax_qlane: bool = _GMAX_QLANE,
    gmax_emit_sg: int = _GMAX_EMIT_SG,
) -> Tuple[jax.Array, jax.Array]:
    """Grouped flat scan: fused matmul+group-max (never materializes the
    [B, N] scores — a `group`× HBM-traffic cut vs `flat_topk`), then top
    `r_groups` groups per query are re-scored row-wise (contiguous 64-row
    windows through the aligned-window DMA kernel on TPU) and the top
    `refine` rows get the exact f32 re-score. Group-max preselection with
    r_groups ≥ 3k cannot drop a true top-k row (see flat_groupmax docs)
    PROVIDED the group select runs at a high recall target; recall is
    int8-sketch-bound, same as `flat_topk`.

    select_mode="argpack" (int8 sketches only) replaces the select →
    window-rescore → select2 tail with the argmax-packed kernel output
    (`_argpack_candidates`): top-`refine` groups each contribute their
    best row directly."""
    select_mode = _resolve_select_mode(select_mode, sketch.dtype,
                                       sketch.shape[0], sketch.shape[1])
    if select_mode == "argpack" and sketch.dtype == jnp.int8:
        cand, sel_s = _argpack_candidates(
            sketch, queries, refine, group, use_pallas,
            select_sg=select_sg, n_live=row_ids.shape[0],
            sketch_gmax=sketch_gmax, gmax_halved=gmax_halved,
            l2=argpack_l2, qlane=gmax_qlane, emit_sg=gmax_emit_sg,
        )
    else:
        cand, sel_s = _grouped_candidates(
            sketch, queries, refine, r_groups, group, use_pallas,
            recall_target, select_mode, select_sg,
            n_live=row_ids.shape[0],
            sketch_gmax=sketch_gmax, gmax_halved=gmax_halved,
        )
    return _exact_refine(corpus, row_ids, queries, cand,
                         jnp.isfinite(sel_s), query_ids, k, exclude_self)


# ---------------------------------------------------------------------------
# Sparse flat engine: densified int8 sketch scan + exact sparse-merge refine
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("size", "chunk"))
def _densify_quantize(
    indices: jax.Array,   # i32[N, NNZ]
    values: jax.Array,    # f32[N, NNZ] (padding values 0)
    scale: jax.Array,     # f32 scalar
    size: int,
    chunk: int = 65536,
) -> jax.Array:
    """int8[N, size_pad] densified sketch, built in row chunks so the f32
    dense intermediate never exceeds chunk×size."""
    n, nnz = indices.shape
    size_pad = int(np.ceil(size / 128.0) * 128)
    npad = int(np.ceil(n / chunk)) * chunk
    idx = jnp.pad(indices, ((0, npad - n), (0, 0)))
    val = jnp.pad(values, ((0, npad - n), (0, 0)))

    def one(args):
        ic, vc = args
        rows = jnp.zeros((chunk, size_pad), jnp.float32)
        rows = rows.at[
            jnp.arange(chunk, dtype=jnp.int32)[:, None], ic
        ].add(vc)
        return jnp.clip(jnp.round(rows * scale), -127, 127).astype(jnp.int8)

    out = jax.lax.map(
        one, (idx.reshape(-1, chunk, nnz), val.reshape(-1, chunk, nnz))
    )
    return out.reshape(npad, size_pad)[:n]


def build_flat_sketch_sparse(
    indices: jax.Array, values: jax.Array, size: int,
) -> Tuple[jax.Array, float]:
    """Densified int8 sketch of a padded-COO sparse corpus. The densified
    copy costs N × pad128(size) bytes (1M × 4096d → 4.1 GB) — affordable
    exactly because int8 is 4× smaller than the f32 densification the
    sparse path could never hold. Returns (sketch, scale)."""
    amax = float(jnp.max(jnp.abs(values)))
    scale = 127.0 / max(amax, 1e-30)
    return (
        _densify_quantize(indices, values, jnp.float32(scale), size),
        scale,
    )


def _densify_queries(q_indices, q_values, size_pad):
    b = q_indices.shape[0]
    q = jnp.zeros((b, size_pad), jnp.float32)
    return q.at[jnp.arange(b, dtype=jnp.int32)[:, None], q_indices].add(
        q_values
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "refine", "r_groups", "group", "exclude_self",
                     "use_pallas", "recall_target"),
)
def flat_topk_sparse(
    sketch: jax.Array,            # int8[N, size_pad] densified corpus
    corpus_indices: jax.Array,    # i32[N, NNZ] exact tier (sparse)
    corpus_values: jax.Array,     # f32[N, NNZ]
    row_ids: jax.Array,           # i32[N]
    q_indices: jax.Array,         # i32[B, NNZq]
    q_values: jax.Array,          # f32[B, NNZq]
    query_ids: jax.Array,         # i32[B]
    k: int,
    refine: int = 128,
    r_groups: int = 24,
    group: int = 64,
    exclude_self: bool = True,
    use_pallas: bool = True,
    recall_target: float = 0.998,
) -> Tuple[jax.Array, jax.Array]:
    """Sparse flat search: queries densify to the sketch's dense space, the
    grouped MXU scan preselects candidates, and the exact tail is the
    sort-merge sparse·sparse dot (`rerank.sparse_merge_scores`) — the
    sparse corpus itself is never densified at f32."""
    from .rerank import sparse_merge_scores

    qd = _densify_queries(q_indices, q_values, sketch.shape[1])
    mode = _resolve_select_mode(_SELECT_MODE, sketch.dtype,
                                sketch.shape[0], sketch.shape[1])
    if mode == "argpack" and sketch.dtype == jnp.int8:
        cand, sel_s = _argpack_candidates(
            sketch, qd, refine, group, use_pallas,
            n_live=row_ids.shape[0],
        )
    else:
        cand, sel_s = _grouped_candidates(
            sketch, qd, refine, r_groups, group, use_pallas, recall_target,
            select_mode=mode,
        )
    exact = sparse_merge_scores(
        corpus_indices, corpus_values,
        jnp.where(jnp.isfinite(sel_s), cand, -1), q_indices, q_values,
    )
    n = row_ids.shape[0]
    safe = jnp.clip(cand, 0, n - 1)
    uid = row_ids[safe]
    valid = jnp.isfinite(sel_s) & jnp.isfinite(exact) & (uid >= 0)
    if exclude_self:
        valid &= uid != query_ids[:, None]
    exact = jnp.where(valid, exact, -jnp.inf)
    top_s, top_u = _top_k(exact, uid, k)
    return jnp.where(jnp.isfinite(top_s), top_u, -1), top_s


class SparseFlatIndex:
    """Host orchestrator for the sparse flat engine (same query surface as
    `SparseRDFForest`; `steps` has no meaning — every row is scored)."""

    def __init__(self, refine: int = 128, r_groups: int = 24,
                 query_batch: int = 1024):
        self.refine = refine
        self.r_groups = r_groups
        self.query_batch = query_batch
        self.sketch = None

    def fit(self, batch) -> "SparseFlatIndex":
        """batch: vectors.SparseBatch."""
        from .rerank import check_sparse_size_for_merge

        check_sparse_size_for_merge(int(batch.size))
        self.c_idx = jnp.asarray(batch.indices)
        self.c_val = jnp.asarray(batch.values)
        self.size = int(batch.size)
        self.sketch, self.scale = build_flat_sketch_sparse(
            self.c_idx, self.c_val, self.size
        )
        self.row_ids = jnp.asarray(np.asarray(batch.ids, dtype=np.int32))
        return self

    def query(
        self,
        q_indices: np.ndarray,
        q_values: np.ndarray,
        k: int = 10,
        query_ids: Optional[np.ndarray] = None,
        exclude_self: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        if self.sketch is None:
            print("need to fit the data first")
            return (np.full((len(q_indices), k), -1, np.int32),
                    np.full((len(q_indices), k), -np.inf, np.float32))
        nq = len(q_indices)
        qids = (np.asarray(query_ids, dtype=np.int32)
                if query_ids is not None
                else np.full((nq,), -1, np.int32))
        bsz = effective_query_batch(nq, self.query_batch)
        # the sparse path runs the identical gmax kernel over the
        # densified sketch — same scoped-vmem guard
        bsz = grouped_vmem_safe_batch(self.sketch.shape[0], bsz,
                                      dpad=self.sketch.shape[1])
        out_i, out_s = [], []
        for s0 in range(0, nq, bsz):
            s1 = min(s0 + bsz, nq)
            pad = bsz - (s1 - s0)
            qi = jnp.asarray(np.pad(np.asarray(q_indices[s0:s1], np.int32),
                                    ((0, pad), (0, 0))))
            qv = jnp.asarray(np.pad(np.asarray(q_values[s0:s1], np.float32),
                                    ((0, pad), (0, 0))))
            qid = jnp.asarray(np.pad(qids[s0:s1], (0, pad),
                                     constant_values=-1))
            ids, scores = flat_topk_sparse(
                self.sketch, self.c_idx, self.c_val, self.row_ids,
                qi, qv, qid, k, refine=self.refine,
                r_groups=max(self.r_groups, 3 * k),
                exclude_self=exclude_self,
            )
            # keep per-batch outputs on device: converting inside the loop
            # blocks dispatch on a host round trip per batch (~34 ms through
            # the remote tunnel, CLAUDE.md); the tiny [bsz, k] slices convert
            # together after every batch has been dispatched
            out_i.append(ids[: s1 - s0])
            out_s.append(scores[: s1 - s0])
        return (np.concatenate([np.asarray(a) for a in out_i]),
                np.concatenate([np.asarray(a) for a in out_s]))
