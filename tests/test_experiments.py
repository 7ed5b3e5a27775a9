"""Experiment harness + multi-feature front-end + timing + CLI."""

import json

import numpy as np

from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
from similaritysearchbyrdf_tpu.deploy.multi_feature import MultiFeatureRDFInit
from similaritysearchbyrdf_tpu.experiments import harness
from similaritysearchbyrdf_tpu.index.forest import RDFForest
from similaritysearchbyrdf_tpu.utils.timing import Tracer
from similaritysearchbyrdf_tpu.vectors import DenseBatch
from similaritysearchbyrdf_tpu import cli


def _conf(**kw):
    base = dict(
        vector_dim=16,
        table_num=3,
        permutation_num=2,
        family_size=24,
        partition_bits=2,
        lsh_table=TableConfig(chain_length=10, bucket_overflow=32),
        query_batch_size=16,
        max_candidates=2048,
        top_k=5,
        seed=31,
    )
    base.update(kw)
    return RDFConfig(**base)


def _data(rng, n=600, d=16):
    centers = rng.normal(size=(15, d))
    x = centers[rng.integers(0, 15, n)] + 0.08 * rng.normal(size=(n, d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def test_recall_sweep_monotone_candidates():
    rng = np.random.default_rng(0)
    x = _data(rng)
    conf = _conf()
    forest = RDFForest(conf).fit(DenseBatch(np.arange(len(x), dtype=np.int32), x))
    gt = harness.exact_ground_truth(x, x[:32], conf.top_k)
    res = harness.recall_per_step_sweep(forest, x[:32], gt, steps_list=(0, 1))
    assert res[1].mean_candidates >= res[0].mean_candidates
    assert 0.0 <= res[0].recall <= 1.0


def test_per_query_latency():
    rng = np.random.default_rng(1)
    x = _data(rng, n=300)
    forest = RDFForest(_conf()).fit(DenseBatch(np.arange(300, dtype=np.int32), x))
    out = harness.per_query_latency(forest, x[:16], repeats=1)
    assert out["qps"] > 0


def test_gt_hamming_separation():
    """On clustered data, GT neighbors must be closer in Hamming space than
    random pairs — the locality-sensitivity diagnostic."""
    rng = np.random.default_rng(2)
    x = _data(rng)
    conf = _conf()
    gt = harness.exact_ground_truth(x, x[:32], 5)
    out = harness.gt_hamming_analysis(conf, x, x[:32], gt)
    assert out["separation"] > 0


def test_best_partition_search_runs():
    rng = np.random.default_rng(3)
    x = _data(rng, n=300)
    conf = _conf()
    gt = harness.exact_ground_truth(x, x[:16], 5)
    seed, scores = harness.best_partition_search(conf, x, x[:16], gt, n_candidates=4)
    assert len(scores) == 4
    assert scores.max() >= scores.mean()


def test_best_hash_family_search():
    rng = np.random.default_rng(4)
    x = _data(rng, n=300)
    conf = _conf()
    batch = DenseBatch(np.arange(300, dtype=np.int32), x)
    gt = harness.exact_ground_truth(x, x[:16], 5)
    forest, best, history = harness.best_hash_family_search(
        conf, batch, x[:16], gt, restarts=2
    )
    assert len(history) == 2
    assert best == max(history)


def test_multi_feature_front_end():
    rng = np.random.default_rng(5)
    n = 300
    feats = {}
    batches = {}
    for name, d in (("blue", 12), ("green", 16), ("red", 8)):
        x = _data(rng, n=n, d=d)
        feats[name] = x
        batches[name] = DenseBatch(np.arange(n, dtype=np.int32), x)
    mf = MultiFeatureRDFInit()
    mf.initialize_multiple({
        "blue": _conf(vector_dim=12),
        "green": _conf(vector_dim=16),
        "red": _conf(vector_dim=8),
    })
    mf.new_multi_fast_fit(batches)
    ids, scores = mf.multi_feature_query(
        {k: v[:8] for k, v in feats.items()}, steps=1, k=5,
        query_ids=np.arange(8),
    )
    assert ids.shape == (8, 5)
    # at least some queries find their cluster siblings
    assert (ids >= 0).sum() > 0


def test_tracer():
    tr = Tracer()
    with tr.span("a"):
        with tr.span("b"):
            pass
    rows = tr.summary()
    names = [r[0] for r in rows]
    assert "a" in names and "a/b" in names
    assert "total_ms" in tr.report()


def test_cli_genparams_fit_query(tmp_path, capsys):
    rng = np.random.default_rng(6)
    x = _data(rng, n=120)
    lines = [f"[{i},[{','.join(repr(float(v)) for v in x[i])}]]" for i in range(120)]
    data = tmp_path / "d.txt"
    data.write_text("\n".join(lines))
    conff = tmp_path / "c.conf"
    conff.write_text(
        "mclab.lsh.tableNum = 3\nmclab.lsh.permutationNum = 1\n"
        "mclab.lsh.vectorDim = 16\nmclab.lshTable.chainLength = 10\n"
        "mclab.lsh.familySize = 24\nmclab.lsh.partitionBits=2\n"
    )
    assert cli.main(["genparams", "--config", str(conff),
                     "--output", str(tmp_path / "fam.txt")]) == 0
    assert (tmp_path / "fam.txt").exists()
    assert cli.main(["fit", str(data), "--config", str(conff),
                     "--output", str(tmp_path / "idx")]) == 0
    assert cli.main(["query", str(tmp_path / "idx"), str(data),
                     "--limit", "4", "--steps", "1"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert "ids" in rec


def test_recall_time_curve():
    rng = np.random.default_rng(7)
    x = _data(rng, n=500)
    conf = _conf()
    forest = RDFForest(conf).fit(DenseBatch(np.arange(len(x), dtype=np.int32), x))
    gt = harness.exact_ground_truth(x, x[:16], conf.top_k)
    pts = harness.recall_time_curve(
        forest, x[:16], gt,
        configs=[{"steps": 0, "multiprobe": False}, {"steps": 1}],
        query_ids=np.arange(16),
    )
    assert len(pts) == 2
    assert all(0.0 <= p["recall"] <= 1.0 and p["qps"] > 0 for p in pts)
    # wider config reaches at least the recall of the narrow one
    assert pts[1]["recall"] >= pts[0]["recall"] - 1e-9


def test_partition_file_roundtrip_and_fit(tmp_path):
    """Partition projections save/load in the reference text format
    (confType=partition flow) and a fit using the file-loaded partition
    hash answers identically to the in-memory one."""
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.index.forest import RDFForest
    from similaritysearchbyrdf_tpu.index.partitioner import (
        generate_partition_projections, load_partition_file,
        partition_of_hash, save_partition_file,
    )
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    conf = _conf() if "_conf" in globals() else None
    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    conf = RDFConfig(
        vector_dim=16, table_num=3, permutation_num=2, family_size=20,
        partition_bits=3, lsh_table=TableConfig(chain_length=12,
                                                bucket_overflow=16),
        query_batch_size=8, max_candidates=512, top_k=5, seed=17,
    )
    pp = generate_partition_projections(conf, seed=123)
    path = str(tmp_path / "partition-bestHashFamily-angle")
    save_partition_file(pp, path)
    pp2 = load_partition_file(path, conf)
    assert pp2.shape == pp.shape
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.integers(0, 2**32, size=(64, conf.total_tables),
                                 dtype=np.uint32))
    np.testing.assert_array_equal(
        np.asarray(partition_of_hash(h, pp)),
        np.asarray(partition_of_hash(h, pp2)),
    )

    # end-to-end: config-driven file loading
    x = rng.normal(size=(300, 16)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    conf_file = conf.replace(partition_family_file_path=path)
    f1 = RDFForest(conf_file)
    np.testing.assert_array_equal(np.asarray(f1.part_proj), np.asarray(pp))
    f1.fit(DenseBatch(np.arange(300, dtype=np.int32), x))
    ids, _ = f1.query(x[:8], steps=1, query_ids=np.arange(8))
    assert (ids >= 0).any()


def test_single_chain_partition_file_broadcasts(tmp_path):
    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index.partitioner import (
        load_partition_file, save_partition_file,
    )

    conf = RDFConfig(
        vector_dim=16, table_num=4, permutation_num=2, partition_bits=2,
        lsh_table=TableConfig(chain_length=8),
    )
    rng = np.random.default_rng(1)
    one_chain = rng.normal(size=(1, 2, 32)).astype(np.float32)
    path = str(tmp_path / "p.txt")
    save_partition_file(one_chain, path)
    pp = load_partition_file(path, conf)
    assert pp.shape == (8, 2, 32)           # broadcast to every table
    np.testing.assert_allclose(np.asarray(pp[0]), np.asarray(pp[7]))


def test_best_partition_search_writes_loadable_checkpoint(tmp_path):
    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.experiments.harness import (
        best_partition_search, exact_ground_truth,
    )
    from similaritysearchbyrdf_tpu.index.partitioner import (
        generate_partition_projections, load_partition_file,
    )

    conf = RDFConfig(
        vector_dim=16, table_num=2, permutation_num=1, family_size=16,
        partition_bits=2, lsh_table=TableConfig(chain_length=8,
                                                bucket_overflow=16),
        seed=5,
    )
    rng = np.random.default_rng(2)
    x = rng.normal(size=(200, 16)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    q = x[:10]
    gt = exact_ground_truth(x, q, k=5)
    path = str(tmp_path / "best-partition.txt")
    seed, scores = best_partition_search(conf, x, q, gt, n_candidates=4,
                                         out_path=path)
    loaded = load_partition_file(path, conf)
    expect = generate_partition_projections(conf, seed=seed)
    np.testing.assert_allclose(np.asarray(loaded), np.asarray(expect),
                               rtol=1e-6)
