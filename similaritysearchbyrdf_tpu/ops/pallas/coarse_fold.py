"""Pallas DMA kernel for the SLOT-FOLDED coarse tier (groupmax mode).

The aligned-window coarse gather (`coarse_gather.py`) hit the DMA engine's
~1.2 us/descriptor floor (results/check_coarse_drain_static.json): at
Deep-8M shapes the coarse stage pays one descriptor per 512-slot window
and the wide [B, m_cap] score slab then costs a ~30 ms select
(results/bisect_deep8m_window.json). This module attacks both at once:

* FOLDED LAYOUT — `fold = 128 // cs` CONSECUTIVE slots of one table pack
  into a single 128-lane physical row (a pure row-major reshape of the
  per-table coarse matrix, `forest._build_folded_tier`), so a window of
  `win` slots is `win/fold` physical rows: the same 64 KB descriptor now
  covers 8x more candidates at cd=16, letting `win` grow ~8x at a fixed
  per-query descriptor budget. (The lane-PACKED tier reads 128 bytes per
  slot and uses cs of them; folding makes every fetched byte a candidate
  byte.)

* IN-KERNEL ARGMAX PACKING — instead of the raw f32[B, m_cap] score slab,
  the kernel emits one int32 `(score << mshift) | member` per PHYSICAL ROW
  (the max over the row's `fold` slots, member = slot index within the
  row's 64-slot group). The caller reduces rows to groups with a cheap
  XLA max and selects over a `m_cap/64`-wide slab — the same two-level
  trick that carries the flat engine's argpack select
  (`ops/flat.select_packed_rows`), shrunk 64x before it leaves the kernel.

Scoring is int8 x int8 on the MXU: the per-query coarse vector is placed
block-diagonally into a [fold, 128] matrix (segment s holds the query at
lanes [s*cs, (s+1)*cs)), so ONE dot_general against the staged rows yields
every slot's dot exactly — no lane-splitting reshapes (the Mosaic
`vector<...x128xi32> -> ...x8x16xi32` shape cast is unsupported; batch-39
capture).

Numerics are integer-exact, so the XLA fallback (`rowmax_fallback`, used
on CPU and in tests) is asserted BIT-IDENTICAL to the kernel.

Replaces the candidate-scoring half of the reference's exhaustive rerank
(`RandomDrawTreeMap.java:742-797` gathers every bucket member's vector);
the candidate-set contract (equal or superset of the probed buckets) is
preserved by the window flatten upstream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NSEM = 16          # DMA semaphores cycled across the group's copies

# dead-row sentinel: NOT int32 min, so `-pk` sort keys never overflow
I32_DEAD = -(2**31 - 1)


def _member_bits(gsl: int) -> int:
    assert gsl & (gsl - 1) == 0, ("group slots must be a power of 2", gsl)
    return gsl.bit_length() - 1


_QB = 8             # queries per grid step (the out block's second-minor
#                     dim must be divisible by 8 — Mosaic VMEM tiling)


def _kernel(idx_ref, qmat_ref, tier_ref, out_ref, *rest, grp, wpr, fold,
            rpg, mshift, max_run=1, emit2=False):
    """One grid step = `_QB` queries x `grp` windows each. Issues every
    (query, window) copy (wpr folded rows each; up to _QB*grp in flight),
    drains, then per query scores every staged slot with ONE int8 MXU
    matmul against that query's block-diagonal [fold, lanes] matrix, packs
    `(score << mshift) | member` and writes the per-row max (max over the
    row's `fold` lane segments). Dead windows (rs8 < 0) skip their DMA;
    their stale scratch rows are masked by the caller.

    max_run > 1: idx carries a 3rd field — the dyadic run class from
    `coarse_gather._run_classes` (adjacent windows of one probed range are
    consecutive tier rows) — and a class-c head fetches c*wpr rows in ONE
    descriptor; covered members (class 0, live) skip their DMA. This is
    the same descriptor-count attack as the lane path's coalesce=True.

    emit2: a second output carries each row's SECOND-best packed value
    (max over the fold segments excluding the argmax segment) — the
    slot-level rerank mode (forest rows_keep=2 at rpg==1) reranks the top
    2 slots of each selected group instead of all gsl, trading exact-
    gather count for group coverage."""
    if emit2:
        out2_ref, scratch, sems = rest
    else:
        scratch, sems = rest
    if max_run == 1:
        def issue(c, _):
            qq = c // grp
            g = c % grp
            rs8 = idx_ref[qq, g, 1]

            @pl.when(rs8 >= 0)
            def _():
                t = idx_ref[qq, g, 0]
                pltpu.make_async_copy(
                    tier_ref.at[t, pl.ds(rs8 * 8, wpr), :],
                    scratch.at[pl.ds(c * wpr, wpr), :],
                    sems.at[c % _NSEM],
                ).start()

            return 0

        jax.lax.fori_loop(0, _QB * grp, issue, 0)

        def drain(c, _):
            @pl.when(idx_ref[c // grp, c % grp, 1] >= 0)
            def _():
                pltpu.make_async_copy(
                    tier_ref.at[0, pl.ds(0, wpr), :],
                    scratch.at[pl.ds(c * wpr, wpr), :],
                    sems.at[c % _NSEM],
                ).wait()

            return 0

        jax.lax.fori_loop(0, _QB * grp, drain, 0)
    else:
        classes = tuple(1 << i for i in range(max_run.bit_length()))

        def issue(c, _):
            qq = c // grp
            g = c % grp
            cls = idx_ref[qq, g, 2]
            for cw in classes:
                @pl.when(cls == cw)
                def _(cw=cw):
                    t = idx_ref[qq, g, 0]
                    rs8 = idx_ref[qq, g, 1]
                    pltpu.make_async_copy(
                        tier_ref.at[t, pl.ds(rs8 * 8, cw * wpr), :],
                        scratch.at[pl.ds(c * wpr, cw * wpr), :],
                        sems.at[c % _NSEM],
                    ).start()

            return 0

        jax.lax.fori_loop(0, _QB * grp, issue, 0)

        def drain(c, _):
            cls = idx_ref[c // grp, c % grp, 2]
            for cw in classes:
                @pl.when(cls == cw)
                def _(cw=cw):
                    pltpu.make_async_copy(
                        tier_ref.at[0, pl.ds(0, cw * wpr), :],
                        scratch.at[pl.ds(c * wpr, cw * wpr), :],
                        sems.at[c % _NSEM],
                    ).wait()

            return 0

        jax.lax.fori_loop(0, _QB * grp, drain, 0)

    r = grp * wpr
    # member within the row's gsl-slot group: (row % rpg) * fold + segment.
    # The row part is constant per COLUMN — compute it on a [1, R] row and
    # let the broadcast OR pay one cheap op per element (the int-mod-at-
    # tile-scale rule, see flat_groupmax pack_arg).
    mrow = (
        jax.lax.broadcasted_iota(jnp.int32, (1, r), 1) % rpg
    ) * fold                                               # [1, R]
    mseg = jax.lax.broadcasted_iota(jnp.int32, (fold, 1), 0)
    member = mrow | mseg                                   # [fold, R]
    for qq in range(_QB):                                  # static unroll
        rows = scratch[pl.ds(qq * r, r), :]                # [R, lanes] i8
        # [fold, R] i32 = every slot's int8 dot: row j's lane segment s is
        # the dot of tier slot (j*fold + s) with the query (block-diagonal)
        scores = jax.lax.dot_general(
            qmat_ref[qq], rows,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        pk = (scores << mshift) | member
        top1 = jnp.max(pk, axis=0, keepdims=True)
        out_ref[qq:qq + 1, :] = top1
        if emit2:
            # packed values are unique per segment (member bits differ),
            # so equality identifies exactly the argmax segment
            pk2 = jnp.where(pk == top1, jnp.int32(I32_DEAD), pk)
            out2_ref[qq:qq + 1, :] = jnp.max(pk2, axis=0, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=("wpr", "rpg", "mshift", "grp", "max_run", "emit2"),
)
def pallas_coarse_rowmax(
    folded: jax.Array,       # i8[L, capf, lanes] slot-folded coarse tier
    qmat: jax.Array,         # i8[B, fold, lanes] block-diagonal query rows
    table_b2: jax.Array,     # i32[B, MB]
    row_start: jax.Array,    # i32[B, MB] physical row start; -1 = dead;
    #                          multiple of 8 (64-slot window alignment)
    wpr: int,                # physical rows per window (win // fold)
    rpg: int,                # rows per member group (gsl // fold)
    mshift: int,             # member bits (log2 gsl)
    grp: int = 8,
    max_run: int = 1,        # dyadic DMA run classes (1 = per-window copies)
    emit2: bool = False,     # also return per-row SECOND-best packed value
) -> jax.Array:
    """Per-row packed maxima i32[B, MB * wpr] for every candidate window.
    Row j of window m covers slots [blk_start + j*fold, +fold); its output
    is max over those slots of `(score << mshift) | member`. Dead windows'
    rows are UNDEFINED (stale scratch) — the caller masks them to a dead
    sentinel by window liveness."""
    l_n, capf, lanes = folded.shape
    b, mb_cap = table_b2.shape
    fold = qmat.shape[1]
    assert wpr % 8 == 0, wpr
    grp = min(grp, mb_cap)
    # VMEM: scratch _QB*grp*wpr*lanes i8 + out _QB*grp*wpr i32 (≤ ~6 MB);
    # the out block minor (grp*wpr) must stay a 128 multiple — RAISE grp
    # to the floor for small windows (win 64 at fold 8 → wpr 8 needs
    # grp 16; the window axis pads with dead windows below)
    floor_grp = max(1, 128 // wpr)
    grp = max(grp, floor_grp)
    while grp > floor_grp and _QB * grp * wpr * (lanes + 4) > (6 << 20):
        grp //= 2
    assert (grp * wpr) % 128 == 0, (grp, wpr)
    padw = (-mb_cap) % grp
    padb = (-b) % _QB
    if padw or padb:
        table_b2 = jnp.pad(table_b2, ((0, padb), (0, padw)))
        row_start = jnp.pad(row_start, ((0, padb), (0, padw)),
                            constant_values=-1)
        qmat = jnp.pad(qmat, ((0, padb), (0, 0), (0, 0)))
    mb = mb_cap + padw
    bp = b + padb
    start_clip = jnp.clip(row_start, 0, capf - wpr)
    rs8 = jnp.where(row_start >= 0, start_clip >> 3, -1)
    fields = [jnp.clip(table_b2, 0, l_n - 1), rs8]
    mrun = 1
    if max_run > 1:
        from .coarse_gather import _run_classes

        mrun = 1 << (min(max_run, grp).bit_length() - 1)
        # adjacency on CLIPPED starts (mirrors the lane path): a class-c
        # head's copy covers exactly the rows its members would fetch
        cls = _run_classes(
            jnp.clip(table_b2, 0, l_n - 1), start_clip,
            row_start >= 0, wpr, grp, max_run=mrun,
        )
        fields.append(cls)
    idx = jnp.stack(fields, axis=-1).astype(jnp.int32)     # [B, MB, 2|3]
    nf = len(fields)
    one_out = jax.ShapeDtypeStruct((bp, mb * wpr), jnp.int32)
    one_spec = pl.BlockSpec((_QB, grp * wpr), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, grp=grp, wpr=wpr, fold=fold, rpg=rpg,
                          mshift=mshift, max_run=mrun, emit2=emit2),
        out_shape=(one_out, one_out) if emit2 else one_out,
        grid=(bp // _QB, mb // grp),
        in_specs=[
            pl.BlockSpec((_QB, grp, nf), lambda i, j: (i, j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((_QB, fold, lanes), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),          # tier stays in HBM
        ],
        out_specs=(one_spec, one_spec) if emit2 else one_spec,
        scratch_shapes=[
            pltpu.VMEM((_QB * grp * wpr, lanes), folded.dtype),
            pltpu.SemaphoreType.DMA((_NSEM,)),
        ],
    )(idx, qmat, folded)
    outs = out if emit2 else (out,)

    def crop(o):
        if padw:
            o = o.reshape(bp, mb, wpr)[:, :mb_cap].reshape(
                bp, mb_cap * wpr
            )
        return o[:b] if padb else o

    outs = tuple(crop(o) for o in outs)
    return outs if emit2 else outs[0]


def rowmax_fallback(
    folded: jax.Array,       # i8[L, capf, lanes]
    qmat: jax.Array,         # i8[B, fold, lanes]
    table_b2: jax.Array,     # i32[B, MB]
    row_start: jax.Array,    # i32[B, MB] (-1 = dead; clipped like the kernel)
    wpr: int,
    rpg: int,
    mshift: int,
    emit2: bool = False,
) -> jax.Array:
    """XLA path, BIT-IDENTICAL to `pallas_coarse_rowmax` on live rows
    (integer math throughout); dead windows emit I32_DEAD instead of stale
    scratch. Used on CPU (tests) and as the interpret-mode oracle."""
    l_n, capf, lanes = folded.shape
    b, mb_cap = table_b2.shape
    fold = qmat.shape[1]
    rs = jnp.clip(row_start, 0, capf - wpr)
    idx = jnp.stack(
        [jnp.clip(table_b2, 0, l_n - 1), rs], axis=-1
    ).astype(jnp.int32)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3), collapsed_slice_dims=(0,), start_index_map=(0, 1)
    )
    rows = jax.lax.gather(
        folded, idx, dn, slice_sizes=(1, wpr, lanes),
        mode=jax.lax.GatherScatterMode.CLIP,
    )                                                  # [B, MB, wpr, lanes]
    scores = jnp.einsum(
        "bmrl,bfl->bmrf", rows.astype(jnp.int32), qmat.astype(jnp.int32)
    )                                                  # [B, MB, wpr, fold]
    r_i = jnp.arange(wpr, dtype=jnp.int32) % rpg
    s_i = jnp.arange(fold, dtype=jnp.int32)
    member = (r_i[:, None] * fold) | s_i[None, :]      # [wpr, fold]
    pk = (scores << mshift) | member[None, None]
    rowpk = jnp.max(pk, axis=3)                        # [B, MB, wpr]
    live = (row_start >= 0)[:, :, None]
    dead = jnp.int32(I32_DEAD)
    rowpk = jnp.where(live, rowpk, dead)
    if not emit2:
        return rowpk.reshape(b, mb_cap * wpr)
    pk2 = jnp.where(pk == jnp.max(pk, axis=3, keepdims=True), dead, pk)
    rowpk2 = jnp.where(live, jnp.max(pk2, axis=3), dead)
    return (rowpk.reshape(b, mb_cap * wpr),
            rowpk2.reshape(b, mb_cap * wpr))
