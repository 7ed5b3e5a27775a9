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
