"""bfloat16 rerank-copy mode: near-identical recall at half the gather
traffic."""

import numpy as np

from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
from similaritysearchbyrdf_tpu.index.forest import RDFForest
from similaritysearchbyrdf_tpu.storage.persist import load_forest, save_forest
from similaritysearchbyrdf_tpu.vectors import DenseBatch


def _conf(**kw):
    base = dict(
        vector_dim=24,
        table_num=4,
        permutation_num=2,
        family_size=30,
        partition_bits=2,
        lsh_table=TableConfig(chain_length=12, bucket_overflow=32),
        query_batch_size=32,
        max_candidates=4096,
        seed=17,
    )
    base.update(kw)
    return RDFConfig(**base)


def _data(rng, n=900, d=24):
    centers = rng.normal(size=(25, d))
    x = centers[rng.integers(0, 25, n)] + 0.1 * rng.normal(size=(n, d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def test_bf16_mode_matches_f32_recall():
    rng = np.random.default_rng(0)
    x = _data(rng)
    batch = DenseBatch(np.arange(len(x), dtype=np.int32), x)

    f32 = RDFForest(_conf()).fit(batch)
    bf16 = RDFForest(_conf(rerank_dtype="bfloat16"))
    bf16.model = f32.model
    bf16.part_proj = f32.part_proj
    bf16.fit(batch)

    assert str(bf16.state.corpus_lp.dtype) == "bfloat16"
    assert str(bf16.state.corpus.dtype) == "float32"
    ids_a, _ = f32.query(x[:32], steps=1, query_ids=np.arange(32))
    ids_b, _ = bf16.query(x[:32], steps=1, query_ids=np.arange(32))

    # two-stage rerank: coarse bf16 pass, exact f32 refinement of the top
    # 128 — the final ranking must match full-f32 except when >128
    # candidates tie within bf16 resolution (not the case here)
    np.testing.assert_array_equal(ids_a, ids_b)


def test_bf16_mode_folded_matches_f32():
    """The two-stage exact tail on the FOLDED groupmax path: bf16 prescore
    + f32 top-slice must reproduce the full-f32 ranking."""
    rng = np.random.default_rng(2)
    x = _data(rng)
    batch = DenseBatch(np.arange(len(x), dtype=np.int32), x)
    kw = dict(coarse_dim=16, coarse_dtype="int8", coarse_layout="folded",
              coarse_refine=1024, coarse_window=256)
    f32 = RDFForest(_conf(**kw)).fit(batch)
    bf16 = RDFForest(_conf(rerank_dtype="bfloat16", **kw))
    bf16.model = f32.model
    bf16.part_proj = f32.part_proj
    bf16.fit(batch)
    assert str(bf16.state.corpus_lp.dtype) == "bfloat16"
    qkw = dict(steps=1, query_ids=np.arange(32))
    ids_a, _ = f32.query(x[:32], **qkw)
    ids_b, _ = bf16.query(x[:32], **qkw)
    np.testing.assert_array_equal(ids_a, ids_b)
    # and through select_mult dedup
    ids_c, _ = bf16.query(x[:32], coarse_group=8, select_mult=2, **qkw)
    ids_d, _ = f32.query(x[:32], coarse_group=8, select_mult=2, **qkw)
    np.testing.assert_array_equal(ids_c, ids_d)


def test_bf16_save_load(tmp_path):
    rng = np.random.default_rng(1)
    x = _data(rng, n=300)
    forest = RDFForest(_conf(rerank_dtype="bfloat16")).fit(
        DenseBatch(np.arange(300, dtype=np.int32), x)
    )
    save_forest(forest, str(tmp_path / "idx"))
    loaded = load_forest(str(tmp_path / "idx"))
    assert str(loaded.state.corpus_lp.dtype) == "bfloat16"
    ids0, _ = forest.query(x[:8], steps=0)
    ids1, _ = loaded.query(x[:8], steps=0)
    np.testing.assert_array_equal(ids0, ids1)
