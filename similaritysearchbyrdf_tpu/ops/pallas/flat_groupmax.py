"""Pallas fused sketch-matmul + group-max for the flat engine.

The plain flat scan materializes the full [B, N] score matrix in HBM and
reads it back through approx_max_k — 2×N×4 bytes of traffic per query row,
the measured wall at large N (scripts/tune_flat.py). This kernel never
writes the scores: each grid step computes a [NT, BT] tile on the MXU in
VMEM and reduces it to per-GROUP maxima (G consecutive rows per group),
emitting only [N/G, B] — a G× traffic reduction. Group-max preselection is
sound for top-k: the group of the true i-th best row ranks at most
(i + #better-scoring groups) ≤ 2i, so `r_groups` ≈ 3k+ groups cannot miss
the true top-k (`ops/flat.flat_topk_grouped` then rescores every row of
every selected group) — provided the group SELECTION itself runs at a high
recall target (a missed group loses all its rows).

Grid order matters: the batch axis is the INNER grid dim so the sketch
tile (the big operand) streams through VMEM exactly once; the tiny query
tile is re-fetched per inner step instead. With batch outermost the whole
sketch would be re-read B/block_b times (measured +8 ms at 8M×96, B=1024).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gmax_kernel(q_ref, sk_ref, out_ref, *, g, int8_mxu, transpose_out,
                 nsub=1, halved=False, pack_arg=False):
    # q_ref [BT, D] int8/bf16; sk_ref [NT, D]; out_ref f32[NT//g, BT]
    # (or f32[BT, NT//g] when transpose_out).
    #
    # pack_arg (int8 path only): emit int32 `score*g + member` instead of
    # f32 score — the group-ARGMAX rides along for free. score is the exact
    # i32 MXU output (|s| <= D*127^2, guarded by the wrapper), member is
    # the row's index within its group; shifting left by log2(g) keeps the
    # packed key monotone in score (low bits are zero in two's complement
    # regardless of sign), so the same max-reduce tree selects the max
    # score and carries WHICH row achieved it. The caller unpacks
    # row = group_idx*g + (packed & (g-1)) and skips the window-rescore +
    # second-select stages entirely (ops/flat._argpack_candidates).
    # TRANSPOSED score tile: the group split must land on the SUBLANE dim —
    # splitting the minor (lane) dim is an unsupported Mosaic shape cast.
    #
    # nsub > 1 SOFTWARE-PIPELINES the tile: the block's matmul and its
    # group-max reduce run on different units (MXU vs VPU) whose costs ADD
    # when the body is one matmul followed by one reduce (measured 13.5 ms
    # at 8M x 96 x B1024 int8 = ~4.2 ms MXU + ~8.9 ms VPU, exactly serial).
    # Splitting the NT dim into nsub chunks and issuing chunk s+1's matmul
    # before chunk s's reduce lets in-order issue overlap the units: the
    # reduce of chunk s depends only on chunk s's scores, so the VPU works
    # while the MXU fills chunk s+1.
    nt = sk_ref.shape[0]
    sub = nt // nsub

    def mm(s):
        blk = sk_ref[pl.ds(s * sub, sub), :]
        if int8_mxu:
            return jax.lax.dot_general(
                blk, q_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )                                           # [sub, BT] i32
        return jax.lax.dot_general(
            blk.astype(jnp.bfloat16), q_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # [sub, BT] f32

    # halved: the sketch tile is STRIDED (group j's member m sits at
    # block-local row m*J + j, J = nt//g — `ops.flat.stride_for_halved_gmax`)
    # so the group-max is log2(sub/J) full-tile pairwise maxima over
    # CONTIGUOUS halves — pure vector maxes on whole vregs, none of the
    # cross-sublane shuffles/relayouts the reshape-reduce pays (measured
    # ~8.9 ms of VPU per 8M×96 B1024 pass vs ~4.2 ms of MXU,
    # results/tune_gmax_nsub.json). Row j of the halved result ≡ j (mod J)
    # throughout, so it is exactly group j's max — same output layout.
    j_rows = nt // g
    shift = max(g.bit_length() - 1, 0)          # log2(g); g is a pow2

    def pack(scores, s):
        # scores i32[sub, BT] (int8 MXU path). member index of block-local
        # row r: halved strided layout puts group j's member m at row
        # m*J + j (J = nt//g) -> m = row // J; natural layout -> row % g.
        # member depends on the ROW only: compute it on a [sub, 1] column
        # (div/mod on sub elements, not sub*BT) and let the OR broadcast —
        # the per-element cost of packing is then one shift + one or.
        row = s * sub + jax.lax.broadcasted_iota(
            jnp.int32, (scores.shape[0], 1), 0
        )
        member = (row // j_rows) if halved else (row % g)
        return (scores << shift) | member

    def reduce(scores):
        if halved:
            s = scores
            while s.shape[0] > j_rows:
                h = s.shape[0] // 2
                s = jnp.maximum(s[:h], s[h:])
            return s
        bt = scores.shape[1]
        return jnp.max(scores.reshape(sub // g, g, bt), axis=1)

    pieces = []
    prev = mm(0)
    if pack_arg:
        prev = pack(prev, 0)
    for s in range(1, nsub):
        cur = mm(s)              # issue next chunk's MXU work first...
        if pack_arg:
            cur = pack(cur, s)
        pieces.append(reduce(prev))  # ...then reduce the previous on VPU
        prev = cur
    pieces.append(reduce(prev))
    if nsub == 1:
        gmax = pieces[0]
    elif halved:
        # strided layout: every sub-chunk holds a member subset of ALL
        # J groups, so chunks combine by elementwise max, not concat
        gmax = functools.reduce(jnp.maximum, pieces)
    else:
        gmax = jnp.concatenate(pieces, axis=0)
    if not pack_arg:
        gmax = gmax.astype(jnp.float32)
    if transpose_out:
        # in-kernel transpose: emitting query-major gmax saves the XLA
        # transpose of the full [NG, B] matrix (measured at 8M x 96,
        # B=1024: the select stage dropped from +12.2 ms to ~+1 ms). One
        # whole-tile store at the end — per-chunk stores would be narrow
        # (sub/g < 128) lane slices.
        out_ref[:] = gmax.T
    else:
        out_ref[:] = gmax


def _check_halved(halved, group, nsub):
    if not halved:
        return
    assert group & (group - 1) == 0, ("halved needs a power-of-2 group",
                                      group)
    assert group % nsub == 0, ("halved needs nsub | group", group, nsub)


def _check_pack(pack_arg, group, d, use_int8):
    if not pack_arg:
        return
    assert use_int8, "pack_arg needs the int8 MXU path (i32 scores)"
    assert group & (group - 1) == 0, ("pack_arg needs a power-of-2 group",
                                      group)
    # packed = score*group + member must fit int32: |score| <= d*127^2
    assert d * 127 * 127 * group < 2**31, (
        "pack_arg int32 overflow", d, group)


@functools.partial(
    jax.jit,
    static_argnames=("group", "block_b", "block_n", "int8_mxu", "interpret",
                     "nsub", "halved", "pack_arg"),
)
def pallas_flat_groupmax(
    sketch: jax.Array,      # int8/bf16 [Npad, D]; Npad % block_n == 0
    q_lp: jax.Array,        # int8/bf16 [B, D];   B % block_b == 0
    group: int = 64,
    block_b: int = 128,
    block_n: int = 8192,
    int8_mxu: bool = True,
    interpret: bool = False,
    nsub: int = 1,
    halved: bool = False,
    pack_arg: bool = False,
) -> jax.Array:
    """Per-group score maxima, TRANSPOSED: f32[Npad/group, B] (the caller
    transposes once in XLA; inside the kernel the group split must stay on
    the sublane dim). [block_n, block_b] scores must fit VMEM (~16 MB) —
    the defaults use 4 MB. int8_mxu uses the int8 MXU path (2× bf16 rate)
    when both operands are int8; int8 scores fit i32/f32 exactly."""
    npad, d = sketch.shape
    b = q_lp.shape[0]
    assert npad % block_n == 0 and block_n % group == 0, (npad, block_n)
    block_b = min(block_b, b)
    assert b % block_b == 0, (b, block_b)
    use_int8 = bool(int8_mxu) and sketch.dtype == jnp.int8 and (
        q_lp.dtype == jnp.int8
    )
    assert block_n % (nsub * group) == 0, (block_n, nsub, group)
    _check_halved(halved, group, nsub)
    _check_pack(pack_arg, group, d, use_int8)
    return pl.pallas_call(
        functools.partial(_gmax_kernel, g=group, int8_mxu=use_int8,
                          transpose_out=False, nsub=nsub, halved=halved,
                          pack_arg=pack_arg),
        out_shape=jax.ShapeDtypeStruct(
            (npad // group, b), jnp.int32 if pack_arg else jnp.float32),
        grid=(npad // block_n, b // block_b),
        in_specs=[
            pl.BlockSpec((block_b, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_n // group, block_b), lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(q_lp, sketch)


@functools.partial(
    jax.jit,
    static_argnames=("group", "block_b", "block_n", "int8_mxu", "interpret",
                     "nsub", "halved", "pack_arg"),
)
def pallas_flat_groupmax_qmajor(
    sketch: jax.Array,      # int8/bf16 [Npad, D]; Npad % block_n == 0
    q_lp: jax.Array,        # int8/bf16 [B, D];   B % block_b == 0
    group: int = 64,
    block_b: int = 128,
    block_n: int = 8192,
    int8_mxu: bool = True,
    interpret: bool = False,
    nsub: int = 1,
    halved: bool = False,
    pack_arg: bool = False,
) -> jax.Array:
    """Per-group score maxima in QUERY-MAJOR layout f32[B, Npad/group] —
    the layout `approx_max_k` consumes — via an in-kernel tile transpose.
    Skips the XLA transpose of the full [NG, B] matrix that dominated the
    group-select stage (results/attrib_flat_r02.json: +12.2 ms at 8M x 96).
    Requires block_n // group to be a 128 multiple (output lane dim)."""
    npad, d = sketch.shape
    b = q_lp.shape[0]
    assert npad % block_n == 0 and block_n % group == 0, (npad, block_n)
    assert (block_n // group) % 128 == 0, (
        "qmajor output needs block_n/group % 128 == 0", block_n, group)
    block_b = min(block_b, b)
    assert b % block_b == 0, (b, block_b)
    use_int8 = bool(int8_mxu) and sketch.dtype == jnp.int8 and (
        q_lp.dtype == jnp.int8
    )
    assert block_n % (nsub * group) == 0, (block_n, nsub, group)
    _check_halved(halved, group, nsub)
    _check_pack(pack_arg, group, d, use_int8)
    return pl.pallas_call(
        functools.partial(_gmax_kernel, g=group, int8_mxu=use_int8,
                          transpose_out=True, nsub=nsub, halved=halved,
                          pack_arg=pack_arg),
        out_shape=jax.ShapeDtypeStruct(
            (b, npad // group), jnp.int32 if pack_arg else jnp.float32),
        grid=(npad // block_n, b // block_b),
        in_specs=[
            pl.BlockSpec((block_b, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, block_n // group), lambda i, j: (j, i),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(q_lp, sketch)


def _gmax_qlane_kernel(q_ref, sk_ref, out_ref, *refs, g, j_rows, chunk_lanes,
                       pack_arg, emit_sg=0):
    # q_ref [BT, D] int8; sk_ref [NT, D] int8 in the STRIDED layout
    # (stride_for_halved_gmax: block-local row m*J + j holds group j's
    # member m, J = NT//g). Computes scores QUERY-MAJOR [BT, NT] on the
    # MXU in `chunk_lanes`-wide chunks and reduces each chunk's lanes to
    # the J group maxima by pairwise halving — the strided layout puts a
    # fixed member-range of ALL J groups in every chunk, so halves align
    # group-for-group and the reduce is pure full-vreg maxima: no
    # cross-sublane shuffles and, unlike `_gmax_kernel(transpose_out=True)`,
    # no in-kernel transpose (measured +4.2 ms at 8M x 96 x B1024:
    # qmajor 15.1 ms vs plain 10.9, results/tune_gmax_nsub.json /
    # tune_gmax_halved.json). out_ref [BT, J] i32 (packed) or f32.
    #
    # emit_sg > 0 additionally emits the SUPERGROUP maxima (emit_sg
    # adjacent groups each) as a second output in TRANSPOSED layout
    # [J//emit_sg, BT] — the level-1 two-level-select tier that the
    # argpack consumer otherwise recomputes with a full HBM re-read of
    # the [B, NG] packed output (3.22 ms of the 31.1 ms argpack wall at
    # 8M x 96 x B1024, results/bisect_argpack.json). The acc tile is
    # already in VMEM here, so the extra cost is one minor-axis segmented
    # max + one [BT, J/sg] tile transpose per grid step. Transposed
    # because J/sg (8 at the defaults) is far below the 128-lane store
    # floor but is a legal sublane count; the caller pays one XLA
    # transpose of [NSG, B] (~17 MB) instead of the [B, NG] re-read.
    sg_ref = refs[0] if emit_sg else None
    nt = sk_ref.shape[0]
    bt = q_ref.shape[0]
    n_chunks = nt // chunk_lanes
    shift = max(g.bit_length() - 1, 0)

    acc = None
    for c in range(n_chunks):
        blk = sk_ref[pl.ds(c * chunk_lanes, chunk_lanes), :]
        scores = jax.lax.dot_general(
            q_ref[:], blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                          # [BT, chunk_lanes] i32
        if pack_arg:
            # strided row r = m*J + j -> member m = r // J; lane l of this
            # chunk is row c*chunk_lanes + l. One iota row, broadcast OR.
            lane = c * chunk_lanes + jax.lax.broadcasted_iota(
                jnp.int32, (1, chunk_lanes), 1)
            scores = (scores << shift) | (lane // j_rows)
        s = scores
        while s.shape[1] > j_rows:
            h = s.shape[1] // 2
            s = jnp.maximum(s[:, :h], s[:, h:])    # [BT, J] after log2
        acc = s if acc is None else jnp.maximum(acc, s)
    out_ref[:] = acc if pack_arg else acc.astype(jnp.float32)
    if emit_sg:
        # Mosaic cannot lower a lane-dim-splitting reshape
        # ((BT, J) -> (BT, J/esg, esg) fails infer-vector-layout:
        # "unsupported shape cast", batch-39 capture). Fold each
        # supergroup's esg ADJACENT lanes with a static slice + in-slice
        # halving instead: max over a contiguous lane run is order-free,
        # so halving within the slice is exact.
        cols = []
        for s in range(j_rows // emit_sg):
            c = acc[:, s * emit_sg:(s + 1) * emit_sg]
            while c.shape[1] > 1:
                h = c.shape[1] // 2
                c = jnp.maximum(c[:, :h], c[:, h:])
            cols.append(c)                    # [BT, 1]
        sgm = jnp.concatenate(cols, axis=1)   # [BT, J/esg]
        sg_ref[:] = (sgm if pack_arg else sgm.astype(jnp.float32)).T


@functools.partial(
    jax.jit,
    static_argnames=("group", "block_b", "block_n", "chunk_lanes",
                     "interpret", "pack_arg", "emit_sg"),
)
def pallas_flat_groupmax_qlane(
    sketch_strided: jax.Array,   # int8 [Npad, D], STRIDED layout
    q_lp: jax.Array,             # int8 [B, D]; B % block_b == 0
    group: int = 64,
    block_b: int = 512,
    block_n: int = 8192,
    chunk_lanes: int = 1024,
    interpret: bool = False,
    pack_arg: bool = True,
    emit_sg: int = 0,
):
    """Query-major per-group maxima f32/i32[B, Npad/group] via lane-axis
    reduction over the strided sketch copy — the no-transpose alternative
    to `pallas_flat_groupmax_qmajor`. Requires the int8 MXU path and the
    `stride_for_halved_gmax` sketch layout; [BT, chunk_lanes] i32 score
    chunks keep VMEM at ~2 MB for the defaults.

    emit_sg > 0 returns (gmax, sgmax_t): sgmax_t is the per-supergroup
    (emit_sg ADJACENT groups) maxima in TRANSPOSED layout
    [Npad/group/emit_sg, B] — fused emission of the argpack consumer's
    level-1 select tier, saving its full [B, NG] HBM re-read. Requires
    (block_n/group/emit_sg) % 8 == 0 (the transposed tile's sublane
    count), so emit_sg <= 16 at the block_n=8192/group=64 defaults;
    fold coarser supergroups from the emitted ones in XLA."""
    npad, d = sketch_strided.shape
    b = q_lp.shape[0]
    assert sketch_strided.dtype == jnp.int8 and q_lp.dtype == jnp.int8, (
        "qlane kernel is int8-only (i32 MXU scores)")
    assert npad % block_n == 0 and block_n % group == 0, (npad, block_n)
    j_rows = block_n // group
    assert j_rows % 128 == 0, (
        "qlane output lane dim must be a 128 multiple", block_n, group)
    assert block_n % chunk_lanes == 0 and chunk_lanes % j_rows == 0, (
        "chunk_lanes must tile block_n and hold whole member ranges",
        block_n, chunk_lanes, j_rows)
    block_b = min(block_b, b)
    assert b % block_b == 0, (b, block_b)
    assert group & (group - 1) == 0, group
    if pack_arg:
        assert d * 127 * 127 * group < 2**31, (
            "pack_arg int32 overflow", d, group)
    out_dt = jnp.int32 if pack_arg else jnp.float32
    out_shape = jax.ShapeDtypeStruct((b, npad // group), out_dt)
    out_specs = pl.BlockSpec(
        (block_b, block_n // group), lambda i, j: (j, i),
        memory_space=pltpu.VMEM,
    )
    if emit_sg:
        assert emit_sg & (emit_sg - 1) == 0 and j_rows % emit_sg == 0, (
            emit_sg, j_rows)
        assert (j_rows // emit_sg) % 8 == 0, (
            "transposed sgmax tile needs >= 8 sublanes per block",
            j_rows, emit_sg)
        out_shape = (out_shape, jax.ShapeDtypeStruct(
            (npad // group // emit_sg, b), out_dt))
        out_specs = (out_specs, pl.BlockSpec(
            (j_rows // emit_sg, block_b), lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        ))
    return pl.pallas_call(
        functools.partial(_gmax_qlane_kernel, g=group, j_rows=j_rows,
                          chunk_lanes=chunk_lanes, pack_arg=pack_arg,
                          emit_sg=emit_sg),
        out_shape=out_shape,
        grid=(npad // block_n, b // block_b),
        in_specs=[
            pl.BlockSpec((block_b, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        interpret=interpret,
    )(q_lp, sketch_strided)
