"""Pallas kernels vs their XLA references (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
from similaritysearchbyrdf_tpu.models.families import generate_angle_model
from similaritysearchbyrdf_tpu.ops.hashing import hash_dense
from similaritysearchbyrdf_tpu.ops.pallas.hash_kernel import pallas_hash_dense


def _conf(**kw):
    base = dict(
        vector_dim=32,
        table_num=3,
        permutation_num=2,
        family_size=40,
        lsh_table=TableConfig(chain_length=16),
        seed=5,
    )
    base.update(kw)
    return RDFConfig(**base)


@pytest.mark.parametrize("chain", [8, 16, 32])
def test_pallas_hash_matches_xla(chain):
    conf = _conf(lsh_table=TableConfig(chain_length=chain))
    model = generate_angle_model(conf)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(48, 32)).astype(np.float32)
    expect = np.asarray(hash_dense(model, jnp.asarray(x)))
    got = np.asarray(
        pallas_hash_dense(model, jnp.asarray(x), block_b=16, interpret=True)
    )
    np.testing.assert_array_equal(got, expect)


def test_pallas_hash_with_transform():
    conf = _conf(type_of_index="sampling")
    model = generate_angle_model(conf)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 32)).astype(np.float32)
    expect = np.asarray(hash_dense(model, jnp.asarray(x)))
    got = np.asarray(
        pallas_hash_dense(model, jnp.asarray(x), block_b=8, interpret=True)
    )
    np.testing.assert_array_equal(got, expect)


def test_use_pallas_hash_config_end_to_end():
    """conf.use_pallas_hash routes hashing through the kernel (interpret
    mode on CPU) and the whole fit+query must answer identically to the
    XLA path."""
    import numpy as np

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index.forest import RDFForest
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    base = dict(
        vector_dim=16, table_num=2, permutation_num=2, family_size=20,
        partition_bits=2, lsh_table=TableConfig(chain_length=12,
                                                bucket_overflow=16),
        query_batch_size=8, max_candidates=512, top_k=5, seed=21,
    )
    rng = np.random.default_rng(0)
    x = rng.normal(size=(300, 16)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    batch = DenseBatch(np.arange(300, dtype=np.int32), x)

    ref = RDFForest(RDFConfig(**base)).fit(batch)
    pal = RDFForest(RDFConfig(**base, use_pallas_hash=True)).fit(batch)
    assert pal.model.pack_whi is not None
    a, sa = ref.query(x[:8], steps=1, query_ids=np.arange(8))
    b, sb = pal.query(x[:8], steps=1, query_ids=np.arange(8))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(sa, sb, rtol=1e-6)


def _interpret_pallas(monkeypatch, module):
    """Route a module's pl.pallas_call through interpret mode (CPU)."""
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(module.pl, "pallas_call", patched)


def test_pallas_coarse_aligned_matches_reference(monkeypatch):
    """Aligned-window DMA kernel vs a numpy gather+dot reference, including
    the dead-window skip: windows masked dead in `live` issue no copy, and
    every LIVE window's scores must still be exact (the on-chip half of this
    contract is scripts/check_pallas_coarse.py)."""
    from similaritysearchbyrdf_tpu.ops.pallas import coarse_gather as cg

    _interpret_pallas(monkeypatch, cg)
    rng = np.random.default_rng(0)
    l, cap, cd, b, mb_cap, win = 3, 256, 64, 4, 8, 16
    cbt = rng.integers(-100, 100, size=(l, cap, cd)).astype(np.int8)
    q = rng.normal(size=(b, cd)).astype(np.float32)
    tb = rng.integers(0, l, size=(b, mb_cap)).astype(np.int32)
    bs = (rng.integers(0, (cap - win) // 8, size=(b, mb_cap)) * 8).astype(
        np.int32
    )
    live = rng.random(size=(b, mb_cap)) > 0.4
    out = np.asarray(
        cg.pallas_coarse_scores_aligned(
            jnp.asarray(cbt), jnp.asarray(q), jnp.asarray(tb),
            jnp.asarray(bs), win, live=jnp.asarray(live),
        )
    )
    qb = np.asarray(jnp.asarray(q).astype(jnp.bfloat16).astype(jnp.float32))
    rows = cbt[tb[:, :, None], bs[:, :, None] + np.arange(win)[None, None, :]]
    ref = np.einsum("bmwc,bc->bmw", rows.astype(np.float32), qb)
    np.testing.assert_allclose(out[live], ref[live], atol=1e-3)


def test_pallas_coarse_aligned_ragged_budget(monkeypatch):
    """Window budgets that are NOT a multiple of the group size (e.g. the
    IVF engine's wb=94 at nprobe=8) must pad the window axis with dead
    windows rather than collapse grp to a ragged divisor — the collapse
    produced a Mosaic block shape (1, 2, 2) that failed to lower on TPU.
    Checks exactness of every live window and the output's mb_cap width."""
    from similaritysearchbyrdf_tpu.ops.pallas import coarse_gather as cg

    _interpret_pallas(monkeypatch, cg)
    rng = np.random.default_rng(11)
    l, cap, cd, b, win = 3, 256, 64, 4, 16
    for mb_cap in (94, 11, 13):
        cbt = rng.integers(-100, 100, size=(l, cap, cd)).astype(np.int8)
        q = rng.normal(size=(b, cd)).astype(np.float32)
        tb = rng.integers(0, l, size=(b, mb_cap)).astype(np.int32)
        bs = (rng.integers(0, (cap - win) // 8, size=(b, mb_cap)) * 8).astype(
            np.int32
        )
        live = rng.random(size=(b, mb_cap)) > 0.4
        out = np.asarray(
            cg.pallas_coarse_scores_aligned(
                jnp.asarray(cbt), jnp.asarray(q), jnp.asarray(tb),
                jnp.asarray(bs), win, live=jnp.asarray(live),
            )
        )
        assert out.shape == (b, mb_cap, win)
        qb = np.asarray(
            jnp.asarray(q).astype(jnp.bfloat16).astype(jnp.float32)
        )
        rows = cbt[
            tb[:, :, None], bs[:, :, None] + np.arange(win)[None, None, :]
        ]
        ref = np.einsum("bmwc,bc->bmw", rows.astype(np.float32), qb)
        np.testing.assert_allclose(out[live], ref[live], atol=1e-3)


def test_pallas_coarse_aligned_ragged_budget_lowers_for_tpu():
    """Interpret mode (above) validates values but never exercises the
    Mosaic lowering constraint the ragged-budget fix targets (second-minor
    block dim divisible by 8 or spanning the whole axis). Cross-platform
    lowering via jax.export runs the real TPU pallas lowering on the CPU
    CI host, so the grp==mb_cap (11, 13) and padded (94) shapes are
    checked against Mosaic before any bench run (ADVICE r2)."""
    import jax.export

    from similaritysearchbyrdf_tpu.ops.pallas import coarse_gather as cg

    rng = np.random.default_rng(11)
    # b=5 (not 4): the interpret-mode test above traces the SAME jitted
    # wrapper at b=4 with pallas_call monkeypatched to interpret mode, and
    # jax.jit would replay that cached interpret jaxpr here — a different
    # batch size forces a fresh, real-TPU trace
    l, cap, cd, b, win = 3, 256, 64, 5, 16
    for mb_cap in (94, 11, 13):
        cbt = jnp.asarray(
            rng.integers(-100, 100, size=(l, cap, cd)).astype(np.int8)
        )
        q = jnp.asarray(rng.normal(size=(b, cd)).astype(np.float32))
        tb = jnp.asarray(rng.integers(0, l, size=(b, mb_cap), dtype=np.int32))
        bs = jnp.asarray(
            (rng.integers(0, (cap - win) // 8, size=(b, mb_cap)) * 8).astype(
                np.int32
            )
        )
        live = jnp.asarray(rng.random(size=(b, mb_cap)) > 0.4)

        def fn(cbt, q, tb, bs, live):
            return cg.pallas_coarse_scores_aligned(
                cbt, q, tb, bs, win, live=live
            )

        exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(
            cbt, q, tb, bs, live
        )
        assert "tpu_custom_call" in exp.mlir_module()


def test_pallas_coarse_unaligned_matches_reference(monkeypatch):
    """Shift-select (unaligned block) kernel vs numpy gather+dot."""
    from similaritysearchbyrdf_tpu.ops.pallas import coarse_gather as cg

    _interpret_pallas(monkeypatch, cg)
    rng = np.random.default_rng(1)
    l, cap, cd, b, mb_cap, bs_block = 2, 128, 32, 3, 8, 8
    cbt = rng.integers(-100, 100, size=(l, cap, cd)).astype(np.int8)
    q = rng.normal(size=(b, cd)).astype(np.float32)
    tb = rng.integers(0, l, size=(b, mb_cap)).astype(np.int32)
    st = rng.integers(0, cap - 2 * bs_block, size=(b, mb_cap)).astype(np.int32)
    out = np.asarray(
        cg.pallas_coarse_scores(
            jnp.asarray(cbt), jnp.asarray(q), jnp.asarray(tb),
            jnp.asarray(st), bs_block, grp=8,
        )
    )
    qb = np.asarray(jnp.asarray(q).astype(jnp.bfloat16).astype(jnp.float32))
    rows = cbt[
        tb[:, :, None], st[:, :, None] + np.arange(bs_block)[None, None, :]
    ]
    ref = np.einsum("bmwc,bc->bmw", rows.astype(np.float32), qb)
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_pallas_coarse_aligned_packed_matches_reference(monkeypatch):
    """Lane-packed aligned-window kernel (groups > 1): scores must equal a
    numpy reference that dots each block's rows against the query placed in
    the block's lane segment (foreign segments contribute 0)."""
    from similaritysearchbyrdf_tpu.ops.pallas import coarse_gather as cg

    _interpret_pallas(monkeypatch, cg)
    rng = np.random.default_rng(4)
    g, cs = 4, 32                       # 4 tables per 128-lane row
    lanes = g * cs
    lg, cap, b, mb_cap, win = 2, 256, 4, 8, 16
    cbt = rng.integers(-100, 100, size=(lg, cap, lanes)).astype(np.int8)
    q = rng.normal(size=(b, cs)).astype(np.float32)
    lg_b = rng.integers(0, lg, size=(b, mb_cap)).astype(np.int32)
    seg_b = rng.integers(0, g, size=(b, mb_cap)).astype(np.int32)
    bs = (rng.integers(0, (cap - win) // 8, size=(b, mb_cap)) * 8).astype(
        np.int32
    )
    live = rng.random(size=(b, mb_cap)) > 0.3
    q_seg = np.stack(
        [np.pad(q, ((0, 0), (s * cs, (g - 1 - s) * cs))) for s in range(g)],
        axis=1,
    )                                    # [B, G, lanes]
    out = np.asarray(
        cg.pallas_coarse_scores_aligned(
            jnp.asarray(cbt), jnp.asarray(q_seg.reshape(b * g, lanes)),
            jnp.asarray(lg_b), jnp.asarray(bs), win,
            live=jnp.asarray(live), groups=g, seg_b=jnp.asarray(seg_b),
        )
    )
    qb = np.asarray(
        jnp.asarray(q_seg).astype(jnp.bfloat16).astype(jnp.float32)
    )
    rows = cbt[lg_b[:, :, None], bs[:, :, None] + np.arange(win)[None, None]]
    q_blk = np.take_along_axis(
        qb, np.broadcast_to(seg_b[:, :, None], (b, mb_cap, lanes)), axis=1
    )
    ref = np.einsum("bmwc,bmc->bmw", rows.astype(np.float32), q_blk)
    np.testing.assert_allclose(out[live], ref[live], atol=1e-3)


def test_pallas_coarse_static_drain_matches_per_copy(monkeypatch):
    """Static-drain packed kernel (unpredicated issue of every window, one
    whole-scratch wait) must score every live window exactly like the
    per-copy-drain kernel — dead windows fetch real rows whose scores the
    caller masks, so only live positions are compared. (Interpret mode
    checks plumbing/shapes; the on-device semaphore-accounting half of the
    contract is scripts/check_pallas_coarse.py.)"""
    from similaritysearchbyrdf_tpu.ops.pallas import coarse_gather as cg

    _interpret_pallas(monkeypatch, cg)
    rng = np.random.default_rng(7)
    g, cs = 4, 32
    lanes = g * cs
    lg, cap, b, mb_cap, win = 2, 256, 4, 16, 16
    cbt = rng.integers(-100, 100, size=(lg, cap, lanes)).astype(np.int8)
    q = rng.normal(size=(b, cs)).astype(np.float32)
    lg_b = rng.integers(0, lg, size=(b, mb_cap)).astype(np.int32)
    seg_b = rng.integers(0, g, size=(b, mb_cap)).astype(np.int32)
    bs = (rng.integers(0, (cap - win) // 8, size=(b, mb_cap)) * 8).astype(
        np.int32
    )
    live = rng.random(size=(b, mb_cap)) > 0.3
    live[:, -3:] = False                 # dead tail past the prefix bound
    live[2] = False                      # a fully dead query row
    q_seg = np.stack(
        [np.pad(q, ((0, 0), (s * cs, (g - 1 - s) * cs))) for s in range(g)],
        axis=1,
    )
    args = (
        jnp.asarray(cbt), jnp.asarray(q_seg.reshape(b * g, lanes)),
        jnp.asarray(lg_b), jnp.asarray(bs),
    )
    kw = dict(live=jnp.asarray(live), groups=g, seg_b=jnp.asarray(seg_b))
    ref = np.asarray(
        cg.pallas_coarse_scores_aligned(*args, win, **kw)
    )
    out = np.asarray(
        cg.pallas_coarse_scores_aligned(*args, win, drain="static", **kw)
    )
    np.testing.assert_allclose(out[live], ref[live], atol=1e-3)


def test_pallas_groupmax_qmajor_matches_plain(monkeypatch):
    """Query-major group-max (in-kernel transpose) == plain kernel's .T."""
    from similaritysearchbyrdf_tpu.ops.pallas import flat_groupmax as fg

    rng = np.random.default_rng(5)
    n, d, b, group, block_n = 1024, 128, 16, 8, 1024
    sk = rng.integers(-100, 100, size=(n, d)).astype(np.int8)
    q = rng.integers(-100, 100, size=(b, d)).astype(np.int8)
    a = np.asarray(
        fg.pallas_flat_groupmax(
            jnp.asarray(sk), jnp.asarray(q), group=group,
            block_b=b, block_n=block_n, interpret=True,
        )
    )
    bq = np.asarray(
        fg.pallas_flat_groupmax_qmajor(
            jnp.asarray(sk), jnp.asarray(q), group=group,
            block_b=b, block_n=block_n, interpret=True,
        )
    )
    np.testing.assert_array_equal(a.T, bq)
    ref = (sk.astype(np.int32) @ q.astype(np.int32).T).reshape(
        n // group, group, b
    ).max(axis=1)
    np.testing.assert_array_equal(a, ref.astype(np.float32))


def test_pallas_groupmax_highd_small_tile_packed():
    """The high-D route (_gmax_tile_plan: transposed-output kernel with a
    shrunk block_n — 2048 at dpad 896) must produce the exact packed
    argmax keys: score*group + member, transposed to query-major."""
    from similaritysearchbyrdf_tpu.ops.pallas import flat_groupmax as fg

    rng = np.random.default_rng(11)
    n, d, b, group, block_n = 4096, 896, 32, 64, 2048
    sk = rng.integers(-100, 100, size=(n, d)).astype(np.int8)
    q = rng.integers(-100, 100, size=(b, d)).astype(np.int8)
    packed = np.asarray(
        fg.pallas_flat_groupmax(
            jnp.asarray(sk), jnp.asarray(q), group=group,
            block_b=b, block_n=block_n, pack_arg=True, interpret=True,
        )
    ).T                                                  # [B, NG]
    scores = q.astype(np.int64) @ sk.astype(np.int64).T  # [B, N]
    ref = ((scores * group) + (np.arange(n) % group)[None, :]).reshape(
        b, n // group, group
    ).max(axis=2)
    np.testing.assert_array_equal(packed, ref.astype(np.int32))


def test_pallas_groupmax_nsub_pipelined_matches(monkeypatch):
    """Software-pipelined (nsub>1) group-max == unpipelined, both layouts."""
    from similaritysearchbyrdf_tpu.ops.pallas import flat_groupmax as fg

    rng = np.random.default_rng(6)
    n, d, b, group, block_n = 2048, 128, 16, 8, 1024
    sk = rng.integers(-100, 100, size=(n, d)).astype(np.int8)
    q = rng.integers(-100, 100, size=(b, d)).astype(np.int8)
    base = np.asarray(
        fg.pallas_flat_groupmax(
            jnp.asarray(sk), jnp.asarray(q), group=group,
            block_b=b, block_n=block_n, interpret=True,
        )
    )
    for nsub in (2, 4):
        piped = np.asarray(
            fg.pallas_flat_groupmax(
                jnp.asarray(sk), jnp.asarray(q), group=group,
                block_b=b, block_n=block_n, interpret=True, nsub=nsub,
            )
        )
        np.testing.assert_array_equal(base, piped)
        piped_q = np.asarray(
            fg.pallas_flat_groupmax_qmajor(
                jnp.asarray(sk), jnp.asarray(q), group=group,
                block_b=b, block_n=block_n, interpret=True, nsub=nsub,
            )
        )
        np.testing.assert_array_equal(base.T, piped_q)


def test_pallas_groupmax_halved_matches(monkeypatch):
    """Halved reduce on the strided sketch == plain reduce on the original,
    including a partial (zero-padded) tail block and nsub pipelining."""
    from similaritysearchbyrdf_tpu.ops.flat import stride_for_halved_gmax
    from similaritysearchbyrdf_tpu.ops.pallas import flat_groupmax as fg

    rng = np.random.default_rng(7)
    n, d, b, group, block_n = 1500, 128, 16, 8, 1024
    npad = 2048
    sk = np.zeros((npad, d), np.int8)
    sk[:n] = rng.integers(-100, 100, size=(n, d)).astype(np.int8)
    q = rng.integers(-100, 100, size=(b, d)).astype(np.int8)
    skj = jnp.asarray(sk)
    strided = stride_for_halved_gmax(skj, block_n=block_n, group=group)
    # the permutation is block-local: member m of group j moves to m*J+j
    j_rows = block_n // group
    st = np.asarray(strided)
    for blk in range(npad // block_n):
        o = blk * block_n
        np.testing.assert_array_equal(
            st[o:o + block_n].reshape(group, j_rows, d).swapaxes(0, 1)
            .reshape(block_n, d),
            sk[o:o + block_n],
        )
    base = np.asarray(
        fg.pallas_flat_groupmax_qmajor(
            skj, jnp.asarray(q), group=group,
            block_b=b, block_n=block_n, interpret=True,
        )
    )
    for nsub in (1, 2, 4):
        halved = np.asarray(
            fg.pallas_flat_groupmax_qmajor(
                strided, jnp.asarray(q), group=group,
                block_b=b, block_n=block_n, interpret=True, nsub=nsub,
                halved=True,
            )
        )
        np.testing.assert_array_equal(base, halved)


def test_flat_index_ensure_gmax_sketch():
    """FlatIndex lazily derives the strided copy with the padded shape and
    leaves it absent when the mode/flag do not call for it."""
    from similaritysearchbyrdf_tpu.ops import flat as fl
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    rng = np.random.default_rng(8)
    x = rng.normal(size=(300, 24)).astype(np.float32)
    batch = DenseBatch(ids=np.arange(300, dtype=np.int32), values=x)
    idx = fl.FlatIndex(mode="grouped", gmax_halved=True).fit(batch)
    sg = idx._ensure_gmax_sketch()
    assert sg is not None and sg.shape[0] % fl._BLOCK_N == 0
    assert sg.shape[1] == idx.sketch.shape[1]
    assert idx._ensure_gmax_sketch() is sg          # cached
    idx2 = fl.FlatIndex(mode="grouped", gmax_halved=False).fit(batch)
    assert idx2._ensure_gmax_sketch() is None


def test_run_classes_partition_exact():
    """_run_classes must place every LIVE window in exactly one copy span
    (brute-force cover check over random adjacency patterns)."""
    from similaritysearchbyrdf_tpu.ops.pallas.coarse_gather import (
        _run_classes)

    rng = np.random.default_rng(0)
    win, grp, mb, b = 16, 32, 96, 6
    for trial in range(4):
        tb = rng.integers(0, 3, size=(b, mb)).astype(np.int32)
        # construct runs: random starts, with stretches of +win adjacency
        bs = np.zeros((b, mb), np.int32)
        for i in range(b):
            s = 0
            for gx in range(mb):
                if rng.random() < 0.4:
                    s = int(rng.integers(0, 64)) * 8
                    tb[i, gx:] = rng.integers(0, 3)
                else:
                    s = bs[i, gx - 1] + win if gx else 0
                    tb[i, gx] = tb[i, gx - 1] if gx else tb[i, gx]
                bs[i, gx] = s
        live = rng.random((b, mb)) > 0.25
        for max_run in (8, 16, 32):
            cls = np.asarray(_run_classes(jnp.asarray(tb), jnp.asarray(bs),
                                          jnp.asarray(live), win, grp,
                                          max_run=max_run))
            # brute-force cover: each live g covered exactly once
            cover = np.zeros((b, mb), np.int32)
            for i in range(b):
                for gx in range(mb):
                    c = cls[i, gx]
                    if c:
                        assert c <= max_run
                        cover[i, gx:gx + c] += 1
                        # a span must stay inside one grp block and be a
                        # real adjacency run
                        assert gx // grp == (gx + c - 1) // grp
                        for m in range(1, c):
                            assert tb[i, gx + m] == tb[i, gx]
                            assert bs[i, gx + m] == bs[i, gx] + m * win
                            assert live[i, gx + m]
            assert (cover[live] == 1).all(), (trial, max_run)
            assert (cover[~live] == 0).all(), (trial, max_run)


def test_pallas_coarse_aligned_coalesced_matches_percopy(monkeypatch):
    """coalesce=True must produce scores identical to the per-copy kernel
    for every live window (unpacked and lane-packed variants)."""
    from similaritysearchbyrdf_tpu.ops.pallas import coarse_gather as cg

    _interpret_pallas(monkeypatch, cg)
    rng = np.random.default_rng(5)
    l, cap, cd, b, mb_cap, win = 3, 512, 64, 4, 24, 16
    cbt = rng.integers(-100, 100, size=(l, cap, cd)).astype(np.int8)
    q = rng.normal(size=(b, cd)).astype(np.float32)
    # half the windows form +win-adjacent runs
    tb = rng.integers(0, l, size=(b, mb_cap)).astype(np.int32)
    bs = np.zeros((b, mb_cap), np.int32)
    for i in range(b):
        for g in range(mb_cap):
            if g and rng.random() < 0.6:
                tb[i, g] = tb[i, g - 1]
                bs[i, g] = bs[i, g - 1] + win
            else:
                bs[i, g] = int(rng.integers(0, (cap - 8 * win) // 8)) * 8
    live = rng.random((b, mb_cap)) > 0.3
    args = (jnp.asarray(cbt), jnp.asarray(q), jnp.asarray(tb),
            jnp.asarray(bs))
    base = np.asarray(cg.pallas_coarse_scores_aligned(
        *args, win, live=jnp.asarray(live)))
    runs = np.asarray(cg.pallas_coarse_scores_aligned(
        *args, win, live=jnp.asarray(live), coalesce=True))
    np.testing.assert_allclose(runs[live], base[live], atol=1e-3)
    # larger dyadic run classes must not change any live score
    for mr in (16, 32):
        runs_mr = np.asarray(cg.pallas_coarse_scores_aligned(
            *args, win, live=jnp.asarray(live), coalesce=True, max_run=mr))
        np.testing.assert_allclose(runs_mr[live], base[live], atol=1e-3)

    # lane-packed variant
    g_pack, lanes = 4, 64
    cs = lanes // g_pack
    lg = 2
    cbt_p = rng.integers(-100, 100, size=(lg, cap, lanes)).astype(np.int8)
    qp = rng.normal(size=(b * g_pack, lanes)).astype(np.float32)
    lg_b = rng.integers(0, lg, size=(b, mb_cap)).astype(np.int32)
    seg_b = rng.integers(0, g_pack, size=(b, mb_cap)).astype(np.int32)
    argsp = (jnp.asarray(cbt_p), jnp.asarray(qp), jnp.asarray(lg_b),
             jnp.asarray(bs))
    base_p = np.asarray(cg.pallas_coarse_scores_aligned(
        *argsp, win, live=jnp.asarray(live), groups=g_pack,
        seg_b=jnp.asarray(seg_b)))
    runs_p = np.asarray(cg.pallas_coarse_scores_aligned(
        *argsp, win, live=jnp.asarray(live), groups=g_pack,
        seg_b=jnp.asarray(seg_b), coalesce=True))
    np.testing.assert_allclose(runs_p[live], base_p[live], atol=1e-3)


def test_gmax_qlane_matches_qmajor_interpret():
    """Lane-reduction gmax kernel (no in-kernel transpose) must be
    bit-identical to the qmajor kernel on the strided sketch copy, packed
    and f32 — the transpose it deletes cost ~4.2 ms at 8M x 96 B1024
    (tune_gmax_nsub vs tune_gmax_halved artifacts)."""
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.flat import stride_for_halved_gmax
    from similaritysearchbyrdf_tpu.ops.pallas.flat_groupmax import (
        pallas_flat_groupmax_qlane, pallas_flat_groupmax_qmajor)

    rng = np.random.default_rng(3)
    npad, d, b, g = 16384, 128, 256, 64
    sk = jnp.asarray(rng.integers(-127, 128, (npad, d)), jnp.int8)
    q = jnp.asarray(rng.integers(-127, 128, (b, d)), jnp.int8)
    strided = stride_for_halved_gmax(sk, block_n=8192, group=g)
    for pack, chunk in ((True, 1024), (False, 2048)):
        ref = pallas_flat_groupmax_qmajor(
            sk, q, group=g, block_b=128, block_n=8192, pack_arg=pack,
            interpret=True)
        got = pallas_flat_groupmax_qlane(
            strided, q, group=g, block_b=128, block_n=8192,
            chunk_lanes=chunk, pack_arg=pack, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_gmax_qlane_emit_sg_matches_fold():
    """emit_sg: the fused second output must equal the adjacent-sg fold of
    the first (the level-1 tier the argpack consumer otherwise recomputes
    with a full [B, NG] re-read)."""
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.flat import stride_for_halved_gmax
    from similaritysearchbyrdf_tpu.ops.pallas.flat_groupmax import (
        pallas_flat_groupmax_qlane)

    rng = np.random.default_rng(7)
    npad, d, b, g, esg = 16384, 128, 256, 64, 16
    sk = jnp.asarray(rng.integers(-127, 128, (npad, d)), jnp.int8)
    q = jnp.asarray(rng.integers(-127, 128, (b, d)), jnp.int8)
    strided = stride_for_halved_gmax(sk, block_n=8192, group=g)
    for pack in (True, False):
        packed, sg_t = pallas_flat_groupmax_qlane(
            strided, q, group=g, block_b=128, block_n=8192,
            chunk_lanes=1024, pack_arg=pack, emit_sg=esg, interpret=True)
        ng = npad // g
        ref = np.asarray(packed).reshape(b, ng // esg, esg).max(axis=-1)
        np.testing.assert_array_equal(np.asarray(sg_t).T, ref)


def test_gmax_qlane_emit_sg_lowers_for_tpu():
    """TPU lowering check for the fused-sgmax qlane shapes (the transposed
    [J/sg, BT] second-output tile has only 8 sublanes — the constraint the
    wrapper asserts)."""
    import jax
    import jax.export
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.pallas.flat_groupmax import (
        pallas_flat_groupmax_qlane)

    sk = jnp.zeros((16384, 128), jnp.int8)
    q = jnp.zeros((1024, 128), jnp.int8)

    def f(sk, q):
        return pallas_flat_groupmax_qlane(sk, q, group=64, block_b=512,
                                          block_n=8192, chunk_lanes=1024,
                                          pack_arg=True, emit_sg=16)

    exp = jax.export.export(jax.jit(f), platforms=["tpu"])(sk, q)
    assert "tpu_custom_call" in exp.mlir_module()


def test_fold_emitted_sgmax_matches_masked_recompute():
    """The consumer fold of the kernel-emitted (UNMASKED) level-1 tier
    must equal the masked p3.max it replaces, at live-prefix boundaries
    where the emitted tail supergroups contain zero-padding garbage that
    could outrank dead (-2^31) masked entries."""
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.flat import (_I32_DEAD,
                                                    _fold_emitted_sgmax)

    rng = np.random.default_rng(13)
    b, ng, group, sg, esg = 8, 256, 64, 32, 16
    for n in (ng * group,            # all live
              ng * group - group,    # one dead group (boundary partial)
              150 * group,           # mid-array boundary
              96 * group):           # boundary ON a supergroup edge
        packed_raw = rng.integers(-2**30, 2**30, (b, ng)).astype(np.int32)
        # zero-padded dead groups score (0 << shift) | member in the
        # kernel's view — model as 0s (they beat negative live scores)
        ng_live = -(-n // group)
        unmasked = packed_raw.copy()
        unmasked[:, ng_live:] = 0
        masked = packed_raw.copy()
        masked[:, ng_live:] = _I32_DEAD
        sg_pre = jnp.asarray(
            unmasked.reshape(b, ng // esg, esg).max(axis=-1))
        p3 = jnp.asarray(masked.reshape(b, ng // sg, sg))
        ref = masked.reshape(b, ng // sg, sg).max(axis=-1)
        got = _fold_emitted_sgmax(sg_pre, p3, n, group, sg, esg)
        np.testing.assert_array_equal(np.asarray(got), ref, err_msg=str(n))


def test_gmax_qlane_lowers_for_tpu():
    """Cross-platform TPU lowering check (jax.export) for the qlane kernel
    shapes the tuner sweeps (bb 512, block_n 8192, chunk 1024) — catches
    Mosaic constraint violations on the CPU CI host before a bench run."""
    import jax
    import jax.export
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.pallas.flat_groupmax import (
        pallas_flat_groupmax_qlane)

    sk = jnp.zeros((16384, 128), jnp.int8)
    q = jnp.zeros((1024, 128), jnp.int8)

    def f(sk, q):
        return pallas_flat_groupmax_qlane(sk, q, group=64, block_b=512,
                                          block_n=8192, chunk_lanes=1024,
                                          pack_arg=True)

    exp = jax.export.export(jax.jit(f), platforms=["tpu"])(sk, q)
    assert "tpu_custom_call" in exp.mlir_module()


def test_pallas_coarse_aligned_sub8_batch_lowers_for_tpu():
    """B=1 and other sub-8 query batches must lower on the KERNEL path
    (the wrapper pads the query axis to 8 dead rows — VERDICT r4 item 2:
    single-query serving previously fell back to the XLA gather). Covers
    coalesced and per-copy drains, unpacked and lane-packed tiers."""
    import jax.export

    from similaritysearchbyrdf_tpu.ops.pallas import coarse_gather as cg

    rng = np.random.default_rng(12)
    l, cap, cd, win = 3, 256, 64, 16
    mb_cap = 16
    for b in (1, 3):
        for coalesce in (False, True):
            cbt = jnp.asarray(
                rng.integers(-100, 100, size=(l, cap, cd)).astype(np.int8)
            )
            q = jnp.asarray(rng.normal(size=(b, cd)).astype(np.float32))
            tb = jnp.asarray(
                rng.integers(0, l, size=(b, mb_cap), dtype=np.int32))
            bs = jnp.asarray(
                (rng.integers(0, (cap - win) // 8, size=(b, mb_cap)) * 8)
                .astype(np.int32)
            )
            live = jnp.asarray(rng.random(size=(b, mb_cap)) > 0.4)

            def fn(cbt, q, tb, bs, live, coalesce=coalesce):
                return cg.pallas_coarse_scores_aligned(
                    cbt, q, tb, bs, win, live=live, coalesce=coalesce
                )

            exp = jax.export.export(jax.jit(fn), platforms=["tpu"])(
                cbt, q, tb, bs, live
            )
            assert "tpu_custom_call" in exp.mlir_module()
    # lane-packed tier (G=2 tables per row), B=1
    g = 2
    cbt = jnp.asarray(
        rng.integers(-100, 100, size=(l, cap, g * cd)).astype(np.int8))
    q = jnp.asarray(rng.normal(size=(1 * g, g * cd)).astype(np.float32))
    tb = jnp.asarray(rng.integers(0, l, size=(1, mb_cap), dtype=np.int32))
    bs = jnp.asarray(
        (rng.integers(0, (cap - win) // 8, size=(1, mb_cap)) * 8)
        .astype(np.int32))
    live = jnp.asarray(rng.random(size=(1, mb_cap)) > 0.4)
    seg = jnp.asarray(rng.integers(0, g, size=(1, mb_cap), dtype=np.int32))

    def fnp(cbt, q, tb, bs, live, seg):
        return cg.pallas_coarse_scores_aligned(
            cbt, q, tb, bs, win, live=live, groups=g, seg_b=seg,
            coalesce=True,
        )

    exp = jax.export.export(jax.jit(fnp), platforms=["tpu"])(
        cbt, q, tb, bs, live, seg
    )
    assert "tpu_custom_call" in exp.mlir_module()


def test_pallas_coarse_aligned_sub8_batch_values(monkeypatch):
    """Interpret-mode value check: the padded sub-8 path returns the same
    scores as the XLA gather fallback formulation."""
    from similaritysearchbyrdf_tpu.ops.pallas import coarse_gather as cg

    _interpret_pallas(monkeypatch, cg)
    rng = np.random.default_rng(13)
    l, cap, cd, win, mb_cap, b = 2, 128, 32, 16, 8, 1
    cbt = rng.integers(-100, 100, size=(l, cap, cd)).astype(np.int8)
    q = rng.normal(size=(b, cd)).astype(np.float32)
    tb = rng.integers(0, l, size=(b, mb_cap)).astype(np.int32)
    bs = (rng.integers(0, (cap - win) // 8, size=(b, mb_cap)) * 8).astype(
        np.int32)
    live = np.ones((b, mb_cap), bool)
    out = np.asarray(cg.pallas_coarse_scores_aligned(
        jnp.asarray(cbt), jnp.asarray(q), jnp.asarray(tb), jnp.asarray(bs),
        win, live=jnp.asarray(live),
    ))
    assert out.shape == (b, mb_cap, win)
    # reference: bf16 dot of the windows' rows (kernel math — round the
    # query through bf16 exactly as the kernel does; int8 rows are exact
    # in bf16)
    qb = np.asarray(jnp.asarray(q[0]).astype(jnp.bfloat16).astype(
        jnp.float32))
    for m in range(mb_cap):
        rows = cbt[tb[0, m], bs[0, m]:bs[0, m] + win].astype(np.float32)
        want = rows @ qb
        np.testing.assert_allclose(
            out[0, m], want, rtol=0.02, atol=0.5)
