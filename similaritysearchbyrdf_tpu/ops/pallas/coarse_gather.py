"""Pallas DMA gather+score kernel for the table-ordered coarse tier.

STATUS: experiment, NOT wired into the query path. Measured on v5e at the
1.2M bench shapes (B=128, 4096 blocks/query, 800B slices): 32.6 ms —
exactly XLA's gather (32-34 ms, ~13 GB/s). The per-transfer issue overhead
(~60 ns/DMA here, ~same per-index inside XLA's gather engine) is the wall
for both; beating it needs FEWER, BIGGER transfers (range-aligned 64-row
windows), which costs ~2x candidate-slot padding and extra flatten payload
channels — parked until the coarse gather is again the top cost.

Mechanically the kernel is sound and numerically equivalent to the XLA
scoring path (f32-accumulation-order differences only): each grid step
issues `GRP` independent slice copies HBM→VMEM (hundreds in flight), waits,
and runs one MXU matmul over the staged rows.

Mosaic requires DMA slice starts in the tiled (second-minor) dimension to be
8-aligned, and bucket starts are arbitrary — so each block's copy reads the
ALIGNED 2*bs-row window containing its rows and the kernel emits 2*bs
scores; the caller selects the 8 in-window scores with a static 8-way
shifted-slice select (pure XLA elementwise, see `shift_select`).

Numerically identical to the XLA scoring path (same int8 rows, same bf16
dot) — asserted in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NSEM = 16          # DMA semaphores cycled across the group's copies


def _kernel(idx_ref, q_ref, cbt_ref, out_ref, scratch, sems, *, grp, win, cd):
    # issue the whole group's copies (deep DMA pipeline)
    def issue(g, _):
        t = idx_ref[0, g, 0]
        s8 = idx_ref[0, g, 1]          # window start / 8 (host-precomputed)
        pltpu.make_async_copy(
            cbt_ref.at[t, pl.ds(s8 * 8, win), :],
            scratch.at[g],
            sems.at[g % _NSEM],
        ).start()
        return 0

    jax.lax.fori_loop(0, grp, issue, 0)

    # barrier: consume one completion signal per issued copy
    def drain(g, _):
        pltpu.make_async_copy(
            cbt_ref.at[0, pl.ds(0, win), :],
            scratch.at[g],
            sems.at[g % _NSEM],
        ).wait()
        return 0

    jax.lax.fori_loop(0, grp, drain, 0)

    rows = scratch[:].reshape(grp * win, cd).astype(jnp.bfloat16)
    # score against ALL query rows (clean MXU shapes), then select this grid
    # step's column with a one-hot matmul — dynamic row/lane indexing of
    # VMEM vectors is not lowerable, and the extra flops are negligible
    b_all = q_ref.shape[0]
    scores_all = jax.lax.dot_general(
        rows, q_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                     # [grp*win, B]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (b_all, 1), 0) == pl.program_id(0)
    ).astype(jnp.float32)
    scores = jax.lax.dot_general(
        scores_all, onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                     # [grp*win, 1]
    out_ref[0] = scores[:, 0].reshape(grp, win)


@functools.partial(jax.jit, static_argnames=("bs_block", "grp"))
def pallas_coarse_scores(
    coarse_by_table: jax.Array,   # int8/bf16[L, caprows, Cd] (HBM-resident)
    q_low: jax.Array,             # bf16/f32[B, Cd]
    table_b2: jax.Array,          # i32[B, MB] (will be clipped)
    blk_start: jax.Array,         # i32[B, MB] (will be clipped)
    bs_block: int,
    grp: int = 512,
) -> jax.Array:
    """Coarse scores f32[B, MB, bs] for every candidate block (shift-
    selected to the true block rows)."""
    l, caprows, cd = coarse_by_table.shape
    b, mb_cap = table_b2.shape
    grp = min(grp, mb_cap)
    assert mb_cap % grp == 0, (mb_cap, grp)
    win = 2 * bs_block
    start = jnp.clip(blk_start, 0, caprows - win)
    idx = jnp.stack(
        [jnp.clip(table_b2, 0, l - 1), start >> 3],
        axis=-1,
    ).astype(jnp.int32)                                    # [B, MB, 2]
    shift = start - ((start >> 3) << 3)                    # [B, MB] in [0, 8)

    scores_w = pl.pallas_call(
        functools.partial(_kernel, grp=grp, win=win, cd=cd),
        out_shape=jax.ShapeDtypeStruct((b, mb_cap, win), jnp.float32),
        grid=(b, mb_cap // grp),
        in_specs=[
            pl.BlockSpec((1, grp, 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.SMEM),
            # whole query matrix resident (tiny); a (1, cd) block would
            # violate the (8, 128) VMEM tiling rule
            pl.BlockSpec((b, cd), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),          # stays in HBM
        ],
        out_specs=pl.BlockSpec((1, grp, win), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((grp, win, cd), coarse_by_table.dtype),
            pltpu.SemaphoreType.DMA((_NSEM,)),
        ],
    )(idx, q_low.astype(jnp.bfloat16), coarse_by_table)

    # static 8-way shifted-slice select: out[.., j] = scores_w[.., shift+j]
    out = jnp.zeros((b, mb_cap, bs_block), jnp.float32)
    for o in range(8):
        out = jnp.where(
            (shift == o)[:, :, None], scores_w[:, :, o:o + bs_block], out
        )
    return out


def _kernel_aligned(idx_ref, q_ref, cbt_ref, out_ref, scratch, sems, *,
                    grp, win, cd):
    """Aligned-window variant: block starts are 8-aligned by construction
    (the window flatten), so each window is ONE exact DMA — no shift
    select. Measured ~125 GB/s at 64-row windows (vs ~13 GB/s XLA gather).

    Windows with no live rows (flatten padding past a query's last range;
    s8 < 0 sentinel from the caller) issue NO copy — per-DMA issue cost is
    the wall at these shapes (~60 ns each on the scalar core), and a
    typical query only fills ~60% of the slot budget. Their scratch rows
    are stale; the caller masks those scores by position validity."""
    def issue(g, _):
        s8 = idx_ref[0, g, 1]

        @pl.when(s8 >= 0)
        def _():
            t = idx_ref[0, g, 0]
            pltpu.make_async_copy(
                cbt_ref.at[t, pl.ds(s8 * 8, win), :],
                scratch.at[g],
                sems.at[g % _NSEM],
            ).start()

        return 0

    jax.lax.fori_loop(0, grp, issue, 0)

    def drain(g, _):
        @pl.when(idx_ref[0, g, 1] >= 0)
        def _():
            pltpu.make_async_copy(
                cbt_ref.at[0, pl.ds(0, win), :],
                scratch.at[g],
                sems.at[g % _NSEM],
            ).wait()

        return 0

    jax.lax.fori_loop(0, grp, drain, 0)

    rows = scratch[:].reshape(grp * win, cd).astype(jnp.bfloat16)
    b_all = q_ref.shape[0]
    scores_all = jax.lax.dot_general(
        rows, q_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                     # [grp*win, B]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (b_all, 1), 0) == pl.program_id(0)
    ).astype(jnp.float32)
    scores = jax.lax.dot_general(
        scores_all, onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                     # [grp*win, 1]
    out_ref[0] = scores[:, 0].reshape(grp, win)


def _kernel_aligned_packed(idx_ref, qrow_ref, cbt_ref, out_ref, scratch,
                           sems, *, grp, win, cd):
    """Lane-packed variant: the caller pre-selects each BLOCK's segment-
    placed query row (qrow_ref [1, grp, lanes] bf16 — zero outside the
    block's lane segment), so scoring is a VPU multiply + lane reduce;
    foreign segments in the packed rows contribute exactly 0.

    The issue/drain loops are FULLY UNROLLED (grp is static): the measured
    per-window cost was ~1.57 µs at any grp and ~independent of the live
    fraction (results/tune_coarse_kernel.json) — the scalar core's
    fori_loop iteration + descriptor construction, not the DMA engine, is
    the wall at these shapes."""
    for g in range(grp):
        s8 = idx_ref[0, g, 1]

        @pl.when(s8 >= 0)
        def _(g=g, s8=s8):
            t = idx_ref[0, g, 0]
            pltpu.make_async_copy(
                cbt_ref.at[t, pl.ds(s8 * 8, win), :],
                scratch.at[g],
                sems.at[g % _NSEM],
            ).start()

    for g in range(grp):
        @pl.when(idx_ref[0, g, 1] >= 0)
        def _(g=g):
            pltpu.make_async_copy(
                cbt_ref.at[0, pl.ds(0, win), :],
                scratch.at[g],
                sems.at[g % _NSEM],
            ).wait()

    rows = scratch[:].astype(jnp.float32)                 # [grp, win, lanes]
    q = qrow_ref[0].astype(jnp.float32)                   # [grp, lanes]
    out_ref[0] = jnp.sum(rows * q[:, None, :], axis=2)    # [grp, win]


def _kernel_aligned_packed_static(idx_ref, qrow_ref, cbt_ref, out_ref,
                                  scratch, sem, *, grp, win, cd):
    """Static-drain variant of `_kernel_aligned_packed`. The per-window
    scalar-core work is the kernel's wall (~1.57 µs/window,
    results/tune_coarse_kernel.json) and ~half of it was the drain loop's
    per-copy waits plus the issue loop's liveness predicates. Here EVERY
    window issues its copy unconditionally (dead windows fetch clipped
    real rows — their scores are masked by position validity in the
    caller, and the extra HBM bytes are ~60 ns/window against a ~1.5 µs
    issue cost), all copies signal ONE semaphore, and the drain is a
    SINGLE wait whose descriptor spans the whole grp*win-row scratch:
    Mosaic DMA semaphores count transfer units, so the sum of grp
    identical win-row copies equals one grp*win-row wait exactly
    (validated on-device: scripts/check_coarse_drain_static.py,
    exact-equal to the per-copy kernel).

    MEASURED OUTCOME (results/check_coarse_drain_static.json): 40.6 ms vs
    39.7 ms per-copy at b64/mb512/win512 — i.e. NOT faster. Eliminating
    the whole drain loop and all issue predicates changed nothing, so the
    ~1.2 us/window wall is the DMA engine's own descriptor-processing
    rate, not scalar-core work. Kept as the documented probe of that
    conclusion; per_copy stays the default. The gather path is therefore
    at its floor (>= one descriptor per bucket range) and further coarse
    wins must come from issuing FEWER descriptors, not cheaper ones."""
    def issue(g, _):
        t = idx_ref[0, g, 0]
        s8 = idx_ref[0, g, 1]
        pltpu.make_async_copy(
            cbt_ref.at[t, pl.ds(s8 * 8, win), :],
            scratch.at[pl.ds(g * win, win), :],
            sem,
        ).start()
        return 0

    jax.lax.fori_loop(0, grp, issue, 0)
    pltpu.make_async_copy(
        scratch.at[pl.ds(0, grp * win), :],
        scratch.at[pl.ds(0, grp * win), :],
        sem,
    ).wait()

    rows = scratch[:].reshape(grp, win, cd).astype(jnp.float32)
    q = qrow_ref[0].astype(jnp.float32)                   # [grp, lanes]
    out_ref[0] = jnp.sum(rows * q[:, None, :], axis=2)    # [grp, win]


def _run_classes(
    table_b2: jax.Array,   # i32[B, MB]
    blk_start: jax.Array,  # i32[B, MB] window start rows
    live: jax.Array,       # bool[B, MB]
    win: int,
    grp: int,
    max_run: int = 8,
) -> jax.Array:
    """DMA run-coalescing classes (the descriptor-count attack the static-
    drain probe concluded was the only remaining coarse win — see
    `_kernel_aligned_packed_static`). Consecutive window SLOTS of one range
    are consecutive SOURCE rows (the window flatten allocates ranges as
    whole windows), so a run of R adjacent live windows can be fetched by
    ceil-pow2 pieces: cls[g] ∈ {8,4,2,1} marks g as the head of a copy of
    cls windows; 0 = no copy (dead, or covered by an earlier head).

    Decomposition per run: the largest c ∈ {8,4,2,1} with pos % c == 0 and
    pos + c <= run_len heads a segment at run-relative pos; dyadic nesting
    makes the segments an exact partition (tests/test_pallas_kernels.py
    brute-forces this). Runs never cross the kernel's grp-block boundary
    (forced head at g % grp == 0) so scratch stays block-local."""
    b, mb = table_b2.shape
    g = jnp.broadcast_to(jnp.arange(mb, dtype=jnp.int32)[None, :], (b, mb))
    prev_t = jnp.concatenate([table_b2[:, :1], table_b2[:, :-1]], axis=1)
    prev_s = jnp.concatenate([blk_start[:, :1] - win, blk_start[:, :-1]],
                             axis=1)
    prev_live = jnp.concatenate(
        [jnp.zeros((b, 1), bool), live[:, :-1]], axis=1)
    cont = ((g % grp) != 0) & live & prev_live & (table_b2 == prev_t) & (
        blk_start == prev_s + win)
    head = ~cont
    r0 = jax.lax.associative_scan(
        jnp.maximum, jnp.where(head, g, -1), axis=1)       # run start index
    pos = g - r0
    nh = jnp.concatenate(
        [jnp.where(head, g, mb)[:, 1:],
         jnp.full((b, 1), mb, jnp.int32)], axis=1)
    run_end = jnp.flip(
        jax.lax.associative_scan(jnp.minimum, jnp.flip(nh, 1), axis=1), 1)
    length = run_end - r0

    classes = _dyadic_classes(max_run)

    def cfor(p):
        c = jnp.full_like(p, 1)
        for a in classes[1:]:
            c = jnp.where((p % a == 0) & (p + a <= length), a, c)
        return c

    cls = cfor(pos)
    covered = jnp.zeros((b, mb), bool)
    for a in classes[1:]:
        h = pos - (pos % a)
        covered |= (h < pos) & (cfor(h) > pos - h)
    return jnp.where(live & ~covered, cls, 0).astype(jnp.int32)


def _dyadic_classes(max_run: int) -> tuple:
    """(1, 2, 4, ..., max_run); max_run must be a power of two."""
    assert max_run & (max_run - 1) == 0 and max_run >= 1, max_run
    return tuple(1 << i for i in range(max_run.bit_length()))


def _issue_runs(idx_ref, cbt_ref, scratch, sems, grp, win, max_run=8):
    """Shared issue/drain for the run-coalescing kernels: one copy per run
    head, statically sized by its class; per-copy waits with matching
    descriptors. scratch is FLAT [grp*win, lanes] so a c-window copy lands
    in c consecutive window slots."""
    classes = _dyadic_classes(max_run)

    def issue(g, _):
        t = idx_ref[0, g, 0]
        s8 = idx_ref[0, g, 1]
        c = idx_ref[0, g, 2]
        for cw in classes:
            @pl.when(c == cw)
            def _(cw=cw):
                pltpu.make_async_copy(
                    cbt_ref.at[t, pl.ds(s8 * 8, cw * win), :],
                    scratch.at[pl.ds(g * win, cw * win), :],
                    sems.at[g % _NSEM],
                ).start()

        return 0

    jax.lax.fori_loop(0, grp, issue, 0)

    def drain(g, _):
        c = idx_ref[0, g, 2]
        for cw in classes:
            @pl.when(c == cw)
            def _(cw=cw):
                pltpu.make_async_copy(
                    cbt_ref.at[0, pl.ds(0, cw * win), :],
                    scratch.at[pl.ds(g * win, cw * win), :],
                    sems.at[g % _NSEM],
                ).wait()

        return 0

    jax.lax.fori_loop(0, grp, drain, 0)


def _kernel_aligned_runs(idx_ref, q_ref, cbt_ref, out_ref, scratch, sems, *,
                         grp, win, cd, max_run=8):
    """Run-coalescing variant of `_kernel_aligned` (same scoring tail)."""
    _issue_runs(idx_ref, cbt_ref, scratch, sems, grp, win, max_run)
    rows = scratch[:].astype(jnp.bfloat16)                # [grp*win, cd]
    b_all = q_ref.shape[0]
    scores_all = jax.lax.dot_general(
        rows, q_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (b_all, 1), 0) == pl.program_id(0)
    ).astype(jnp.float32)
    scores = jax.lax.dot_general(
        scores_all, onehot,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = scores[:, 0].reshape(grp, win)


def _kernel_aligned_packed_runs(idx_ref, qrow_ref, cbt_ref, out_ref, scratch,
                                sems, *, grp, win, cd, max_run=8):
    """Run-coalescing variant of `_kernel_aligned_packed`."""
    _issue_runs(idx_ref, cbt_ref, scratch, sems, grp, win, max_run)
    rows = scratch[:].reshape(grp, win, cd).astype(jnp.float32)
    q = qrow_ref[0].astype(jnp.float32)                   # [grp, lanes]
    out_ref[0] = jnp.sum(rows * q[:, None, :], axis=2)    # [grp, win]


@functools.partial(
    jax.jit,
    static_argnames=("win", "grp", "groups", "drain", "coalesce", "max_run"),
)
def pallas_coarse_scores_aligned(
    coarse_by_table: jax.Array,   # int8/bf16[Lg, caprows, lanes]
    q_low: jax.Array,             # bf16[B, lanes] (B*groups rows if packed)
    table_b2: jax.Array,          # i32[B, MB] group index (lg)
    blk_start: jax.Array,         # i32[B, MB]; 8-ALIGNED by construction
    win: int,
    grp: int = 64,
    live: "jax.Array | None" = None,   # bool[B, MB] window has live rows
    groups: int = 1,                   # lane-packed tables per row (G)
    seg_b: "jax.Array | None" = None,  # i32[B, MB] lane segment per block
    drain: str = "per_copy",           # "per_copy" | "counted" (packed only)
    coalesce: bool = False,            # run-coalesced DMA (fewer descriptors)
    max_run: int = 8,                  # largest dyadic run class (pow2)
) -> jax.Array:
    """Jitted entry — see `_scores_aligned_impl` for the format contract
    (kept unjitted so the sub-8 padding recursion traces inline instead of
    creating a nested jit-cache entry)."""
    return _scores_aligned_impl(
        coarse_by_table, q_low, table_b2, blk_start, win, grp, live,
        groups, seg_b, drain, coalesce, max_run,
    )


def _scores_aligned_impl(
    coarse_by_table, q_low, table_b2, blk_start, win, grp=64, live=None,
    groups=1, seg_b=None, drain="per_copy", coalesce=False, max_run=8,
) -> jax.Array:
    """Coarse scores f32[B, MB, win] for aligned windows (window flatten).
    Windows marked dead in `live` are neither copied nor scored validly —
    the caller must mask their scores (it already does, by position).

    groups > 1: the tier is lane-packed (G tables per 128-lane row,
    `forest._build_coarse_tier`); q_low carries B*G segment-placed query
    rows and seg_b names each block's segment. The per-block query row is
    pre-selected in XLA and the kernel scores by VPU multiply+lane-reduce
    (`_kernel_aligned_packed`).

    coalesce=True fetches runs of adjacent windows (same table, source rows
    consecutive — every multi-window range produces one) with ceil-pow2
    copies of up to 8 windows (`_run_classes`), attacking the ~1.2 us
    PER-DESCRIPTOR DMA-engine floor the static-drain probe identified."""
    l, caprows, cd = coarse_by_table.shape
    b, mb_cap = table_b2.shape
    if b < 8:
        # sub-8 query batches fail Mosaic vector-op verification (the B=1
        # serving probes): pad the query axis to 8 with DEAD rows (live =
        # False, so their windows issue no DMA; the static drain fetches
        # clipped real rows whose scores are discarded by the slice) and
        # crop after. This keeps single-query serving on the kernel path
        # instead of the XLA gather fallback (VERDICT r4 item 2).
        pb = 8 - b
        out = _scores_aligned_impl(
            coarse_by_table,
            jnp.pad(q_low, ((0, pb * groups), (0, 0))),
            jnp.pad(table_b2, ((0, pb), (0, 0))),
            jnp.pad(blk_start, ((0, pb), (0, 0))),
            win, grp=grp,
            live=jnp.pad(
                live if live is not None
                else jnp.ones((b, mb_cap), bool),
                ((0, pb), (0, 0)),
            ),
            groups=groups,
            seg_b=(jnp.pad(seg_b, ((0, pb), (0, 0)))
                   if seg_b is not None else None),
            drain=drain, coalesce=coalesce, max_run=max_run,
        )
        return out[:b]
    grp = min(grp, mb_cap)
    # the unpacked kernel scores the whole group against ALL B queries
    # before the one-hot column select: keep that [grp*win, B] f32 buffer
    # ≤ 8 MB of the ~16 MB VMEM (large-B callers like the grouped flat
    # engine); the packed kernel's buffers are B-independent
    if groups == 1:
        while grp > 8 and grp * win * b * 4 > (8 << 20):
            grp //= 2
        # grp can't drop below 8 (Mosaic second-minor constraint). If the
        # floor still blows the budget, fail loudly here rather than deep
        # inside Mosaic with a VMEM-exhaustion error (ADVICE r2): the
        # caller must lower win or the query batch.
        if grp * win * b * 4 > (12 << 20):
            raise ValueError(
                f"pallas_coarse_scores_aligned: score buffer "
                f"grp({grp})*win({win})*B({b})*4 = "
                f"{grp * win * b * 4 >> 20} MB exceeds the VMEM budget "
                f"even at the minimum group size; reduce win or the "
                f"query batch"
            )
    # Mosaic requires the second-minor block dim (grp) to be divisible by 8
    # or equal to the whole window axis. Pad the window axis with DEAD
    # windows rather than collapsing grp to a ragged divisor of mb_cap
    # (e.g. a 94-window budget would force grp=2, which fails to lower).
    if grp != mb_cap:
        grp = max(8, grp - grp % 8)
    pad = (-mb_cap) % grp
    if pad:
        padw = ((0, 0), (0, pad))
        table_b2 = jnp.pad(table_b2, padw)
        blk_start = jnp.pad(blk_start, padw)
        live = jnp.pad(
            live if live is not None else jnp.ones((b, mb_cap), bool), padw
        )                                                  # pads are dead
        if seg_b is not None:
            seg_b = jnp.pad(seg_b, padw)
    mb = mb_cap + pad
    start_clip = jnp.clip(blk_start, 0, caprows - win)
    start = start_clip >> 3
    if live is not None:
        start = jnp.where(live, start, -1)                 # skip-DMA sentinel
    idx = jnp.stack(
        [jnp.clip(table_b2, 0, l - 1), start], axis=-1
    ).astype(jnp.int32)                                    # [B, MB, 2]
    if coalesce:
        live_eff = live if live is not None else jnp.ones((b, mb), bool)
        # runs of up to 8 windows must stay in-bounds: the head's copy
        # spans [start, start + c*win) — member windows are individually
        # clipped, and consecutive clipped windows remain consecutive rows
        # runs must stay within the grp block (scratch is block-local),
        # so the class cap is the largest power of two <= min(max_run, grp)
        mrun = 1 << (min(max_run, grp).bit_length() - 1)
        cls = _run_classes(jnp.clip(table_b2, 0, l - 1), start_clip,
                           live_eff, win, grp, max_run=mrun)
        idx3 = jnp.concatenate(
            [jnp.clip(table_b2, 0, l - 1)[..., None].astype(jnp.int32),
             (start_clip >> 3)[..., None].astype(jnp.int32),
             cls[..., None]], axis=-1)                     # [B, MB, 3]
        if groups == 1:
            out = pl.pallas_call(
                functools.partial(_kernel_aligned_runs, grp=grp, win=win,
                                  cd=cd, max_run=mrun),
                out_shape=jax.ShapeDtypeStruct((b, mb, win), jnp.float32),
                grid=(b, mb // grp),
                in_specs=[
                    pl.BlockSpec((1, grp, 3), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((b, cd), lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((1, grp, win), lambda i, j: (i, j, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((grp * win, cd), coarse_by_table.dtype),
                    pltpu.SemaphoreType.DMA((_NSEM,)),
                ],
            )(idx3, q_low.astype(jnp.bfloat16), coarse_by_table)
            return out[:, :mb_cap] if pad else out
        q_rows = jnp.take_along_axis(
            q_low.reshape(b, groups, cd),
            jnp.broadcast_to(seg_b[:, :, None], (b, mb, cd)),
            axis=1,
        ).astype(jnp.bfloat16)                             # [B, MB, lanes]
        out = pl.pallas_call(
            functools.partial(_kernel_aligned_packed_runs, grp=grp,
                              win=win, cd=cd, max_run=mrun),
            out_shape=jax.ShapeDtypeStruct((b, mb, win), jnp.float32),
            grid=(b, mb // grp),
            in_specs=[
                pl.BlockSpec((1, grp, 3), lambda i, j: (i, j, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, grp, cd), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, grp, win), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((grp * win, cd), coarse_by_table.dtype),
                pltpu.SemaphoreType.DMA((_NSEM,)),
            ],
        )(idx3, q_rows, coarse_by_table)
        return out[:, :mb_cap] if pad else out
    if groups == 1:
        out = pl.pallas_call(
            functools.partial(_kernel_aligned, grp=grp, win=win, cd=cd),
            out_shape=jax.ShapeDtypeStruct((b, mb, win), jnp.float32),
            grid=(b, mb // grp),
            in_specs=[
                pl.BlockSpec((1, grp, 2), lambda i, j: (i, j, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((b, cd), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, grp, win), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((grp, win, cd), coarse_by_table.dtype),
                pltpu.SemaphoreType.DMA((_NSEM,)),
            ],
        )(idx, q_low.astype(jnp.bfloat16), coarse_by_table)
        return out[:, :mb_cap] if pad else out

    # packed path: per-block query rows [B, MB, lanes]
    q_rows = jnp.take_along_axis(
        q_low.reshape(b, groups, cd),
        jnp.broadcast_to(seg_b[:, :, None], (b, mb, cd)),
        axis=1,
    ).astype(jnp.bfloat16)                                 # [B, MB, lanes]
    if drain == "static":
        # unpredicated issue: dead windows fetch clipped REAL rows (their
        # scores are masked by position validity in the caller)
        idx = jnp.stack(
            [
                jnp.clip(table_b2, 0, l - 1),
                jnp.clip(blk_start, 0, caprows - win) >> 3,
            ],
            axis=-1,
        ).astype(jnp.int32)
        out = pl.pallas_call(
            functools.partial(
                _kernel_aligned_packed_static, grp=grp, win=win, cd=cd
            ),
            out_shape=jax.ShapeDtypeStruct((b, mb, win), jnp.float32),
            grid=(b, mb // grp),
            in_specs=[
                pl.BlockSpec((1, grp, 2), lambda i, j: (i, j, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, grp, cd), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, grp, win), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((grp * win, cd), coarse_by_table.dtype),
                pltpu.SemaphoreType.DMA(()),
            ],
        )(idx, q_rows, coarse_by_table)
        return out[:, :mb_cap] if pad else out
    out = pl.pallas_call(
        functools.partial(_kernel_aligned_packed, grp=grp, win=win, cd=cd),
        out_shape=jax.ShapeDtypeStruct((b, mb, win), jnp.float32),
        grid=(b, mb // grp),
        in_specs=[
            pl.BlockSpec((1, grp, 2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, grp, cd), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, grp, win), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((grp, win, cd), coarse_by_table.dtype),
            pltpu.SemaphoreType.DMA((_NSEM,)),
        ],
    )(idx, q_rows, coarse_by_table)
    return out[:, :mb_cap] if pad else out
