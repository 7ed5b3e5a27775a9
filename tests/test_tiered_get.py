"""Bloom-gated exact point lookup across tiers."""

import numpy as np

from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
from similaritysearchbyrdf_tpu.storage.persist import GenerationStore, TieredForest
from similaritysearchbyrdf_tpu.vectors import DenseBatch


def _conf():
    return RDFConfig(
        vector_dim=8, table_num=2, permutation_num=1, family_size=10,
        partition_bits=2, lsh_table=TableConfig(chain_length=8,
                                                bucket_overflow=16),
        query_batch_size=8, max_candidates=256, top_k=3, seed=9,
    )


def test_get_across_tiers(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(60, 8)).astype(np.float32)
    tiered = TieredForest(_conf(), GenerationStore(str(tmp_path), "g"))

    tiered.fit(DenseBatch(np.arange(30, dtype=np.int32), x[:30]))
    tiered.spill()
    tiered.fit(DenseBatch(np.arange(30, 60, dtype=np.int32), x[30:]))

    # device tier hit
    np.testing.assert_allclose(tiered.get(35), x[35], rtol=1e-6)
    # spilled generation hit (through the Bloom gate)
    np.testing.assert_allclose(tiered.get(5), x[5], rtol=1e-6)
    # definite miss
    assert tiered.get(9999) is None
