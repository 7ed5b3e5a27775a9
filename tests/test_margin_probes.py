"""Margin-guided (query-directed) multi-probe mode."""

import numpy as np
import jax.numpy as jnp

from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
from similaritysearchbyrdf_tpu.index.forest import RDFForest
from similaritysearchbyrdf_tpu.models.families import generate_angle_model
from similaritysearchbyrdf_tpu.ops.hashing import hash_dense, hash_dense_with_margins


def _conf(**kw):
    base = dict(
        vector_dim=24,
        table_num=4,
        permutation_num=2,
        family_size=30,
        partition_bits=2,
        lsh_table=TableConfig(chain_length=16, bucket_overflow=32),
        query_batch_size=32,
        max_candidates=4096,
        seed=23,
    )
    base.update(kw)
    return RDFConfig(**base)


def _data(rng, n=1500, d=24):
    centers = rng.normal(size=(30, d))
    x = centers[rng.integers(0, 30, n)] + 0.1 * rng.normal(size=(n, d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def test_margins_consistent_with_hash():
    conf = _conf()
    model = generate_angle_model(conf)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(6, 24)).astype(np.float32)
    h0 = np.asarray(hash_dense(model, jnp.asarray(x)))
    h1, margins = hash_dense_with_margins(model, jnp.asarray(x))
    np.testing.assert_array_equal(h0, np.asarray(h1))
    m = np.asarray(margins)
    c = conf.lsh_table.chain_length
    # structural low bits are inf; functional bits carry finite |dot|
    assert np.isinf(m[..., : 32 - c]).all()
    assert np.isfinite(m[..., 32 - c :]).all()
    assert (m[..., 32 - c :] >= 0).all()


def test_margin_mode_recall_vs_reference():
    """At a fraction of the probes, margin mode should reach comparable
    recall to the reference's full blind-flip probing."""
    rng = np.random.default_rng(1)
    x = _data(rng)
    conf = _conf()
    forest = RDFForest(conf).fit(
        __import__("similaritysearchbyrdf_tpu").DenseBatch(
            np.arange(len(x), dtype=np.int32), x
        )
    )
    q = x[:64]
    sims = q @ x.T

    def recall(ids):
        r = 0.0
        for i in range(64):
            order = [j for j in np.argsort(-sims[i], kind="stable") if j != i][:10]
            r += len(set(order) & set(int(v) for v in ids[i] if v >= 0)) / 10
        return r / 64

    ids_ref, _ = forest.query(q, steps=1, query_ids=np.arange(64))
    ids_mar, _ = forest.query(
        q, steps=1, query_ids=np.arange(64), probe_mode="margin", probe_budget=6
    )
    r_ref, r_mar = recall(ids_ref), recall(ids_mar)
    assert r_mar >= r_ref - 0.05, (r_ref, r_mar)


def test_margin_mode_rejects_transforms():
    conf = _conf(type_of_index="sampling")
    rng = np.random.default_rng(2)
    x = _data(rng, n=300)
    forest = RDFForest(conf).fit(
        __import__("similaritysearchbyrdf_tpu").DenseBatch(
            np.arange(300, dtype=np.int32), x
        )
    )
    import pytest

    with pytest.raises(ValueError):
        forest.query(x[:4], probe_mode="margin")
