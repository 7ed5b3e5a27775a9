"""Streaming exact top-k vs a numpy reference."""

import numpy as np

from similaritysearchbyrdf_tpu.ops.exact import exact_search


def test_exact_matches_numpy():
    rng = np.random.default_rng(0)
    corpus = rng.normal(size=(1000, 24)).astype(np.float32)
    q = rng.normal(size=(37, 24)).astype(np.float32)
    ids, scores = exact_search(corpus, q, k=7, batch=16)
    sims = q @ corpus.T
    for i in range(len(q)):
        expect = np.argsort(-sims[i], kind="stable")[:7]
        np.testing.assert_array_equal(ids[i], expect)
        np.testing.assert_allclose(scores[i], sims[i][expect], rtol=1e-5)


def test_exact_excludes_self():
    rng = np.random.default_rng(1)
    corpus = rng.normal(size=(300, 16)).astype(np.float32)
    ids, _ = exact_search(corpus, corpus[:50], k=5, batch=32, exclude_self=True)
    for i in range(50):
        assert i not in ids[i]


def test_exact_chunk_boundaries():
    rng = np.random.default_rng(2)
    corpus = rng.normal(size=(100, 8)).astype(np.float32)
    q = rng.normal(size=(4, 8)).astype(np.float32)
    import jax.numpy as jnp
    from similaritysearchbyrdf_tpu.ops.exact import exact_topk

    a, _ = exact_topk(jnp.asarray(corpus), jnp.asarray(q), 5, chunk=7)
    b, _ = exact_topk(jnp.asarray(corpus), jnp.asarray(q), 5, chunk=100)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
