"""Mesh-sharded IVF engine on the 8-device virtual CPU mesh: full-probe
parity with exact search, recall at small nprobe, layout invariants."""

import numpy as np

from similaritysearchbyrdf_tpu import DenseBatch, exact_search
from similaritysearchbyrdf_tpu.parallel.sharded_ivf import (
    ShardedIVFIndex, fit_ivf_sharded,
)


def _data(n=3000, d=32, seed=0, n_clusters=40):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, n_clusters, n)] + 0.1 * rng.normal(
        size=(n, d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def test_sharded_ivf_full_probe_matches_exact():
    """nprobe = K with a wide refine covers every row on every shard —
    the merged result must equal brute force."""
    x = _data(n=1600)
    batch = DenseBatch(np.arange(1600, dtype=np.int32), x)
    idx = ShardedIVFIndex(target_cluster=64, nprobe=32, refine=512).fit(batch)
    assert idx.mesh.shape["shard"] == 8
    kc = int(idx.state.centroids.shape[0])
    q = x[:32]
    ids, scores = idx.query(q, k=10, query_ids=np.arange(32), nprobe=kc)
    gt_ids, gt_scores = exact_search(x, q, k=10, exclude_self=True)
    hits = sum(
        len(set(map(int, ids[i])) & set(map(int, gt_ids[i])))
        for i in range(32)
    )
    assert hits / 320 >= 0.99
    np.testing.assert_allclose(scores[:, 0], gt_scores[:, 0], rtol=1e-5)


def test_sharded_ivf_small_nprobe_recall():
    x = _data(n=3000)
    batch = DenseBatch(np.arange(3000, dtype=np.int32), x)
    idx = ShardedIVFIndex(target_cluster=64, nprobe=8, refine=256).fit(batch)
    q = x[:48]
    ids, _ = idx.query(q, k=10, query_ids=np.arange(48))
    gt_ids, _ = exact_search(x, q, k=10, exclude_self=True)
    hits = sum(
        len(set(map(int, ids[i])) & set(map(int, gt_ids[i])))
        for i in range(48)
    )
    assert hits / 480 >= 0.9


def test_sharded_ivf_layout_invariants():
    """Per-shard cluster layout: every live row appears exactly once across
    shards; starts are 8-aligned and nondecreasing."""
    x = _data(n=1000)
    state, mesh = fit_ivf_sharded(
        x, np.arange(1000, dtype=np.int32), target_cluster=64, iters=3,
    )
    rid = np.asarray(state.row_ids)
    live = rid[rid >= 0]
    assert sorted(live.tolist()) == list(range(1000))
    st = np.asarray(state.starts)
    assert (st % 8 == 0).all()
    assert (np.diff(st, axis=1) >= 0).all()


def test_sharded_ivf_unfitted():
    idx = ShardedIVFIndex()
    ids, scores = idx.query(np.zeros((3, 16), np.float32), k=5)
    assert (ids == -1).all()


def test_tune_nprobe_works_on_sharded_index():
    """The GT-free autotuner drives any index exposing query(..., nprobe=)
    and state.centroids — including the mesh-sharded engine."""
    from similaritysearchbyrdf_tpu import tune_nprobe
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    x = _data(n=1200)
    idx = ShardedIVFIndex(target_cluster=64, nprobe=1, iters=3).fit(
        DenseBatch(np.arange(1200, dtype=np.int32), x))
    p = tune_nprobe(idx, x[:24], target_recall=0.95, k=5)
    assert idx.nprobe == p
    assert 1 <= p <= int(idx.state.centroids.shape[0])


def test_sharded_ivf_save_load_roundtrip(tmp_path):
    """Mesh-engine checkpoint: save_sharded_ivf/load_sharded_ivf restore
    identical query results on a same-size mesh."""
    from similaritysearchbyrdf_tpu import save_sharded_ivf, load_sharded_ivf
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    x = _data(n=1000)
    idx = ShardedIVFIndex(target_cluster=64, nprobe=8, iters=3).fit(
        DenseBatch(np.arange(1000, dtype=np.int32), x))
    p = str(tmp_path / "sivf")
    save_sharded_ivf(idx, p)
    idx2 = load_sharded_ivf(p)
    q = x[:16]
    i1, s1 = idx.query(q, k=5, query_ids=np.arange(16))
    i2, s2 = idx2.query(q, k=5, query_ids=np.arange(16))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_sharded_ivf_two_phase_pruning():
    """Shard-local head pruning: keep larger than any shard's window budget
    is identical to the single-phase path; a real prune retains recall;
    save/load rebuilds the derived per-shard head tier."""
    x = _data(n=4000, seed=6)
    batch = DenseBatch(np.arange(4000, dtype=np.int32), x)
    idx = ShardedIVFIndex(target_cluster=64, nprobe=12, win=16, refine=256,
                          head_pool=8, keep=0).fit(batch)
    assert idx.state.heads is not None
    assert idx.state.heads.shape[0] == 8          # one head tier per shard
    q = x[:48]
    from similaritysearchbyrdf_tpu.parallel.sharded_ivf import (
        ivf_window_budget_sharded)
    wb = ivf_window_budget_sharded(idx.state, 12, 16)
    ids0, s0 = idx.query(q, k=10, query_ids=np.arange(48))
    ids1, s1 = idx.query(q, k=10, query_ids=np.arange(48), keep=wb + 3)
    np.testing.assert_array_equal(ids0, ids1)
    np.testing.assert_array_equal(s0, s1)
    ids2, _ = idx.query(q, k=10, query_ids=np.arange(48),
                        keep=max(wb // 2, 1))
    gt_ids, _ = exact_search(x, q, k=10, exclude_self=True)
    hits = sum(len(set(map(int, ids2[i])) & set(map(int, gt_ids[i])))
               for i in range(48))
    assert hits / 480 >= 0.85, hits / 480

    import tempfile

    from similaritysearchbyrdf_tpu.storage.persist import (
        load_sharded_ivf, save_sharded_ivf)
    with tempfile.TemporaryDirectory() as td:
        idx.keep = max(wb // 2, 1)
        save_sharded_ivf(idx, td + "/sivf")
        idx2 = load_sharded_ivf(td + "/sivf", mesh=idx.mesh)
        assert idx2.state.heads is not None and idx2.keep == idx.keep
        ids3, _ = idx2.query(q, k=10, query_ids=np.arange(48))
        np.testing.assert_array_equal(ids2, ids3)
