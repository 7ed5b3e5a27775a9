"""Sparse flat engine at the 1M x 4096d (nnz 64) BoW workload, recall vs
exact sparse GT. Run: python scripts/bench_flat_sparse.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def make_sparse(n, vocab, nnz, n_topics, seed=11):
    rng = np.random.default_rng(seed)
    topic_terms = np.stack([
        rng.choice(vocab, size=nnz * 3, replace=False)
        for _ in range(n_topics)
    ])
    t = rng.integers(0, n_topics, size=n)
    # vectorized draw: permute each row's 3*nnz topic terms, take nnz
    perm = np.argsort(rng.random((n, nnz * 3)), axis=1)[:, :nnz]
    idx = np.take_along_axis(topic_terms[t], perm, axis=1)
    idx = np.sort(idx, axis=1).astype(np.int32)
    val = rng.lognormal(0.0, 0.3, size=(n, nnz)).astype(np.float32)
    val /= np.linalg.norm(val, axis=1, keepdims=True)
    return idx, val


def main():
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.exact import exact_topk_sparse
    from similaritysearchbyrdf_tpu.ops.flat import (
        SparseFlatIndex, flat_topk_sparse,
    )
    from similaritysearchbyrdf_tpu.vectors import SparseBatch

    N, VOCAB, NNZ, NQ = 1_000_000, 4096, 64, 1024
    idx, val = make_sparse(N, VOCAB, NNZ, 2000)
    cache = "/tmp/flat_sparse_1m_gt.npz"
    try:
        gt = np.load(cache)["gt"]
        print("GT: cached", flush=True)
    except Exception:
        t0 = time.perf_counter()
        qd = np.zeros((NQ, VOCAB), np.float32)
        np.put_along_axis(qd, idx[:NQ], val[:NQ], axis=1)
        gt = []
        for s0 in range(0, NQ, 256):
            g, _ = exact_topk_sparse(
                jnp.asarray(idx), jnp.asarray(val),
                jnp.asarray(qd[s0:s0 + 256]), 10, exclude_diag_offset=s0,
            )
            gt.append(np.asarray(g))
        gt = np.concatenate(gt)
        np.savez(cache, gt=gt)
        print(f"GT: {time.perf_counter()-t0:.1f}s", flush=True)
    gt_sets = [set(map(int, gt[i])) for i in range(NQ)]

    t0 = time.perf_counter()
    engine = SparseFlatIndex().fit(SparseBatch(
        ids=np.arange(N, dtype=np.int32), size=VOCAB, indices=idx,
        values=val, lengths=np.full(N, NNZ, np.int32)))
    jax.block_until_ready(engine.sketch)
    build_s = time.perf_counter() - t0

    qi = jnp.asarray(idx[:NQ])
    qv = jnp.asarray(val[:NQ])
    qids = jnp.arange(NQ, dtype=jnp.int32)
    args = (engine.sketch, engine.c_idx, engine.c_val, engine.row_ids,
            qi, qv, qids, 10)
    ids, _ = flat_topk_sparse(*args)
    jax.block_until_ready(ids)
    t0 = time.perf_counter()
    for _ in range(5):
        ids, _ = flat_topk_sparse(*args)
    jax.block_until_ready(ids)
    dt = (time.perf_counter() - t0) / 5
    ids_np = np.asarray(ids)
    hits = sum(len(gt_sets[i] & set(int(v) for v in ids_np[i] if v >= 0))
               for i in range(NQ))
    row = {
        "corpus": "sparse_1m_4096d_nnz64", "n": N,
        "build_s": round(build_s, 1),
        "qps": round(NQ / dt, 1),
        "recall@10": round(hits / (NQ * 10), 4),
        "sketch_gib": round(engine.sketch.size / 2**30, 2),
    }
    print("SPARSE-FLAT " + json.dumps(row), flush=True)
    with open("results/flat_sparse.json", "w") as f:
        json.dump(row, f, indent=1)


if __name__ == "__main__":
    main()
