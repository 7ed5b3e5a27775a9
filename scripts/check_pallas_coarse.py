"""On-TPU exactness check of the Pallas aligned-window coarse kernel.

The CPU test suite asserts window-flatten parity on the XLA path only
(`use_pallas` requires the tpu backend), so this script is the hardware
half of that contract: with exhaustive refine, the Pallas window path must
return the same ids as the block-mode XLA path, and (scores allclose) —
including the dead-window DMA skip. Run: python scripts/check_pallas_coarse.py
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index.forest import RDFForest
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    assert jax.default_backend() == "tpu", jax.default_backend()
    base = dict(
        vector_dim=64, table_num=4, permutation_num=2, family_size=80,
        partition_bits=3, lsh_table=TableConfig(chain_length=32,
                                                bucket_overflow=64),
        query_batch_size=64, max_candidates=8192, top_k=10, seed=5,
        coarse_dim=64, coarse_refine=8192,   # exhaustive refine
    )
    rng = np.random.default_rng(2)
    centers = rng.normal(size=(64, 64))
    x = centers[rng.integers(0, 64, 30000)] + 0.1 * rng.normal(size=(30000, 64))
    x = (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)
    batch = DenseBatch(np.arange(30000, dtype=np.int32), x)

    fa = RDFForest(RDFConfig(**base, coarse_window=0)).fit(batch)     # XLA blocks
    fb = RDFForest(RDFConfig(**base, coarse_window=64)).fit(batch)    # Pallas DMA
    q = x[:256]
    qids = np.arange(256)
    for steps in (0, 1):
        ids_a, sc_a = fa.query(q, steps=steps, query_ids=qids)
        ids_b, sc_b = fb.query(q, steps=steps, query_ids=qids)
        np.testing.assert_array_equal(ids_a, ids_b)
        np.testing.assert_allclose(sc_a, sc_b, rtol=1e-5, atol=1e-6)
        print(f"steps={steps}: PALLAS == XLA on {len(q)} queries", flush=True)
    print("CHECK OK", flush=True)


if __name__ == "__main__":
    main()
