"""Clustered-flat (IVF) engine: k-means layout invariants + recall vs exact."""

import numpy as np

from similaritysearchbyrdf_tpu import DenseBatch, exact_search
from similaritysearchbyrdf_tpu.ops.ivf import IVFFlatIndex, build_ivf


def _data(n=3000, d=32, seed=0, n_clusters=40):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, n_clusters, n)] + 0.08 * rng.normal(size=(n, d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def test_build_layout_invariants():
    x = _data(n=1000)
    st = build_ivf(x, np.arange(1000, dtype=np.int32), target_cluster=64,
                   iters=4)
    starts = np.asarray(st.starts)
    rid = np.asarray(st.row_ids)
    assert (starts % 8 == 0).all()                 # 8-aligned clusters
    assert starts[-1] == rid.shape[0]
    live = rid >= 0
    assert live.sum() == 1000                      # every row present once
    assert len(set(rid[live].tolist())) == 1000
    # cluster-ordered exact rows match the original corpus rows
    corpus = np.asarray(st.corpus)[:, :32]
    src = x[rid[live]]
    np.testing.assert_allclose(corpus[live], src, rtol=1e-6)


def test_ivf_recall_full_probe_matches_exact():
    """nprobe = all clusters ⇒ every row is scored: recall ≈ exact (int8
    sketch preselection bound only, same as the flat engine)."""
    x = _data()
    batch = DenseBatch(np.arange(len(x), dtype=np.int32), x)
    idx = IVFFlatIndex(target_cluster=128, nprobe=64, iters=4,
                       win=64, refine=256).fit(batch)
    kc = int(np.asarray(idx.state.centroids).shape[0])
    q = x[:64]
    ids, scores = idx.query(q, k=10, query_ids=np.arange(64), nprobe=kc)
    gt_ids, gt_s = exact_search(x, q, k=10, exclude_self=True)
    hits = sum(len(set(map(int, ids[i])) & set(map(int, gt_ids[i])))
               for i in range(64))
    assert hits / 640 >= 0.97, hits / 640
    np.testing.assert_allclose(scores[:, 0], gt_s[:, 0], rtol=1e-4)
    for i in range(64):
        assert i not in set(map(int, ids[i]))       # self excluded


def test_ivf_recall_partial_probe():
    """A modest nprobe on clustered data must retain high recall — the IVF
    contract (probing the top clusters finds the true neighbors)."""
    x = _data(n=4000)
    batch = DenseBatch(np.arange(len(x), dtype=np.int32), x)
    idx = IVFFlatIndex(target_cluster=128, nprobe=8, iters=6,
                       win=64, refine=256).fit(batch)
    q = x[:64]
    ids, _ = idx.query(q, k=10, query_ids=np.arange(64))
    gt_ids, _ = exact_search(x, q, k=10, exclude_self=True)
    hits = sum(len(set(map(int, ids[i])) & set(map(int, gt_ids[i])))
               for i in range(64))
    assert hits / 640 >= 0.9, hits / 640


def test_ivf_unfitted():
    idx = IVFFlatIndex()
    ids, _ = idx.query(np.zeros((2, 8), np.float32), k=3)
    assert ids.shape == (2, 3) and (ids == -1).all()
