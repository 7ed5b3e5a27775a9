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
