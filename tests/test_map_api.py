"""RDFMap ConcurrentMap-surface semantics (put/get/remove/putIfAbsent/
replace/iterate + similarity reads) — mirrors `RandomDrawTreeMapTest.java`."""

import numpy as np

from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
from similaritysearchbyrdf_tpu.deploy.map_api import RDFMap


def _conf():
    return RDFConfig(
        vector_dim=16, table_num=3, permutation_num=1, family_size=20,
        partition_bits=2, lsh_table=TableConfig(chain_length=10,
                                                bucket_overflow=16),
        query_batch_size=8, max_candidates=512, top_k=5, seed=3,
    )


def _vecs(n, d=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(8, d))
    x = centers[rng.integers(0, 8, n)] + 0.1 * rng.normal(size=(n, d))
    return (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)


def test_put_get_replace_remove():
    m = RDFMap(_conf())
    x = _vecs(4)
    assert m.put(0, x[0]) is None
    assert m.get(0) is not None
    prev = m.put(0, x[1])                       # replace returns prior
    np.testing.assert_array_equal(prev, x[0])
    assert m.put_if_absent(0, x[2]) is not None  # present → no-op
    np.testing.assert_array_equal(m.get(0), x[1])
    assert m.replace(99, x[3]) is None           # absent → no-op
    assert m.remove(0) is not None
    assert m.get(0) is None
    assert m.size() == 0


def test_value_creator_defaults():
    m = RDFMap(_conf())
    v = m.get(7, value_creator=lambda k: np.ones(16, np.float32))
    assert v is not None and 7 in m
    np.testing.assert_array_equal(m.get(7), np.ones(16, np.float32))


def test_iteration():
    m = RDFMap(_conf())
    x = _vecs(5)
    for i in range(5):
        m.put(i, x[i])
    assert sorted(m.keys()) == [0, 1, 2, 3, 4]
    assert len(m.values()) == 5
    assert len(list(m.items())) == 5
    assert len(m) == 5


def test_similarity_after_mutation():
    m = RDFMap(_conf())
    x = _vecs(40, seed=1)
    for i in range(30):
        m.put(i, x[i])
    res = m.get_similar(0, steps=1)
    assert 0 not in res
    # mutate and re-query: lazily rebuilt
    for i in range(30, 40):
        m.put(i, x[i])
    m.remove(1)
    res2 = m.get_similar_by_vector(x[0], steps=1)
    assert 1 not in res2
    m.clear()
    assert m.size() == 0
