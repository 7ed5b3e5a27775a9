"""Streaming sparse exact top-k vs a dense numpy reference."""

import numpy as np
import jax.numpy as jnp

from similaritysearchbyrdf_tpu.ops.exact import exact_topk_sparse
from similaritysearchbyrdf_tpu.vectors import sparse_batch_from_rows


def test_exact_sparse_matches_dense():
    rng = np.random.default_rng(0)
    n, v, nnz = 300, 50, 6
    rows = []
    for _ in range(n):
        idx = np.sort(rng.choice(v, size=nnz, replace=False))
        rows.append((idx, rng.normal(size=nnz)))
    batch = sparse_batch_from_rows(np.arange(n), v, rows, nnz_pad=nnz)
    dense = batch.densify().values

    q = dense[:20]
    ids, scores = exact_topk_sparse(
        jnp.asarray(batch.indices), jnp.asarray(batch.values),
        jnp.asarray(q), k=5, chunk=64,
    )
    sims = q @ dense.T
    for i in range(20):
        expect = np.argsort(-sims[i], kind="stable")[:5]
        np.testing.assert_array_equal(np.asarray(ids[i]), expect)


def test_exact_sparse_excludes_self():
    rng = np.random.default_rng(1)
    n, v, nnz = 100, 30, 4
    rows = []
    for _ in range(n):
        idx = np.sort(rng.choice(v, size=nnz, replace=False))
        rows.append((idx, np.abs(rng.normal(size=nnz)) + 0.1))
    batch = sparse_batch_from_rows(np.arange(n), v, rows, nnz_pad=nnz)
    dense = batch.densify().values
    ids, _ = exact_topk_sparse(
        jnp.asarray(batch.indices), jnp.asarray(batch.values),
        jnp.asarray(dense[:10]), k=3, exclude_diag_offset=0,
    )
    for i in range(10):
        assert i not in np.asarray(ids[i])
