"""The hard corpus generator: determinism + the recall-knob-binds property
(VERDICT r2 'missing #2': the round-2 synthetic corpora were so easy that
IVF recall was bit-identical across nprobe 2→64, so nothing validated the
pruning knobs)."""

import numpy as np
import jax.numpy as jnp

from similaritysearchbyrdf_tpu.utils.datasets import (easy_clustered,
                                                      hard_clustered)


def test_hard_clustered_shapes_and_determinism():
    x, q = hard_clustered(5000, 32, n_queries=64, seed=3, n_centers=100)
    x2, q2 = hard_clustered(5000, 32, n_queries=64, seed=3, n_centers=100)
    assert x.shape == (5000, 32) and q.shape == (64, 32)
    assert x.dtype == np.float32
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(q, q2)
    np.testing.assert_allclose(np.linalg.norm(x, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(q, axis=1), 1.0, atol=1e-5)
    # different seed, different corpus
    x3, _ = hard_clustered(5000, 32, n_queries=64, seed=4, n_centers=100)
    assert not np.array_equal(x, x3)


def test_hard_corpus_makes_nprobe_bind():
    """On the hard corpus, IVF recall@10 must RISE with nprobe (coverage
    governs recall); on the easy corpus it saturates at nprobe=1. This is
    the property every recall-vs-knob artifact in results/ relies on."""
    from similaritysearchbyrdf_tpu.ops.ivf import (build_ivf, ivf_topk,
                                                   ivf_window_budget)

    n, d, nq = 30_000, 48, 128
    x, q = hard_clustered(n, d, n_queries=nq, seed=7, n_centers=400)
    gt = np.argsort(-(q @ x.T), axis=1)[:, :10]
    gt_sets = [set(map(int, gt[i])) for i in range(nq)]
    st = build_ivf(x, np.arange(n, dtype=np.int32), target_cluster=256,
                   iters=3, seed=0)
    qd = jnp.asarray(q)
    qids = jnp.full((nq,), -1, jnp.int32)

    def recall(nprobe):
        wb = ivf_window_budget(st.starts, st.ends, nprobe, 64)
        ids, _ = ivf_topk(
            st.sketch, st.corpus, st.row_ids, st.centroids, st.starts,
            st.ends, qd, qids, 10, nprobe=nprobe, win=64, wb=wb,
            refine=128, exclude_self=False, use_pallas=False,
        )
        ids = np.asarray(ids)
        return sum(
            len(gt_sets[i] & set(map(int, ids[i][ids[i] >= 0])))
            for i in range(nq)
        ) / (nq * 10)

    r1, r4, r16 = recall(1), recall(4), recall(16)
    assert r1 < 0.85, f"nprobe=1 already at {r1}: corpus too easy"
    assert r4 > r1 + 0.03, (r1, r4)
    assert r16 > r4, (r4, r16)
    assert r16 > 0.90, r16

    # control: the easy recipe saturates immediately (this is the round-2
    # blind spot, kept as a regression sentinel)
    xe = easy_clustered(n, d, seed=11, n_centers=400)
    qe = xe[:nq]
    gte = np.argsort(-(qe @ xe.T), axis=1)[:, 1:11]
    gte_sets = [set(map(int, gte[i])) for i in range(nq)]
    ste = build_ivf(xe, np.arange(n, dtype=np.int32), target_cluster=256,
                    iters=3, seed=0)

    wb = ivf_window_budget(ste.starts, ste.ends, 1, 64)
    ids, _ = ivf_topk(
        ste.sketch, ste.corpus, ste.row_ids, ste.centroids, ste.starts,
        ste.ends, jnp.asarray(qe), jnp.arange(nq, dtype=jnp.int32), 10,
        nprobe=1, win=64, wb=wb, refine=128, exclude_self=True,
        use_pallas=False,
    )
    ids = np.asarray(ids)
    re1 = sum(
        len(gte_sets[i] & set(map(int, ids[i][ids[i] >= 0])))
        for i in range(nq)
    ) / (nq * 10)
    assert re1 > 0.95, f"easy corpus should saturate at nprobe=1, got {re1}"
