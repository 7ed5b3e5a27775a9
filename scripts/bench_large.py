"""Large-corpus benchmarks: the BASELINE.json configs beyond the smoke test.

  config 2: GloVe-100d-shaped 1.2M vectors, multi-tree forest, step sweep
  config 3: SIFT-128d-shaped 1M vectors, multi-probe recall@1/10/100

Synthetic corpora (zero-egress image) with exact on-device ground truth.
Run: python scripts/bench_large.py [glove|sift]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def clustered(n, d, n_clusters, noise, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, n_clusters, n)] + noise * rng.normal(size=(n, d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def run(name, n, d, n_clusters, noise, ks=(10,), steps_list=(0, 1), n_query=1000,
        coarse_dim=None):
    import jax

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index.forest import RDFForest, fit_dense
    from similaritysearchbyrdf_tpu.ops.exact import exact_search
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    conf = RDFConfig(
        vector_dim=d, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3, lsh_table=TableConfig(chain_length=32, bucket_overflow=500),
        # large corpora produce tens of thousands of candidates per query
        # (the reference walks them all); the table-ordered int8 coarse tier
        # scores them at one DMA slice per 64-slot aligned window
        # (m_cap >= 32768 enables window mode + the Pallas coarse gather),
        # then exactly re-scores the top `coarse_refine`
        query_batch_size=128, max_candidates=65536, top_k=max(ks),
        coarse_dim=coarse_dim or d, coarse_dtype="int8", coarse_refine=1024,
    )
    x = clustered(n, d, n_clusters, noise)
    ids = np.arange(n, dtype=np.int32)
    queries = x[:n_query]

    t0 = time.perf_counter()
    gt_cache = f"/tmp/bench_large_{name}_{n}_{d}_gt.npz"
    try:
        gt_ids = np.load(gt_cache)["gt"][:, : max(ks)]
        assert gt_ids.shape[0] == n_query
        print(f"[{name}] exact GT: cached", flush=True)
    except Exception:
        gt_ids, _ = exact_search(x, queries, k=max(ks), exclude_self=True)
        np.savez(gt_cache, gt=np.asarray(gt_ids))
        gt_s = time.perf_counter() - t0
        print(f"[{name}] exact GT: {gt_s:.2f}s "
              f"({n_query / gt_s:.0f} qps brute force)", flush=True)

    forest = RDFForest(conf)
    forest.fit(DenseBatch(ids, x))
    nb_pad = forest.state.tables.bucket_keys.shape[1]
    t0 = time.perf_counter()
    forest.state = fit_dense(conf, DenseBatch(ids, x), model=forest.model,
                             part_proj=forest.part_proj, nb_pad=nb_pad)
    jax.block_until_ready(forest.state.tables.sorted_keys)
    build_s = time.perf_counter() - t0
    print(f"[{name}] build: {build_s:.2f}s steady ({n / build_s:.0f} vec/s), "
          f"{forest.index_bytes_per_vector():.0f} B/vec", flush=True)

    lines = []
    modes = [("reference", 0)] + [("margin", b) for b in (12,)]
    for steps in steps_list:
        for mode, budget in modes:
            kw = dict(steps=steps, query_ids=ids[:n_query],
                      probe_mode=mode, probe_budget=budget or 8)
            # compile+warm, then average 3 steady-state calls (each call
            # still blocks on its np outputs; at 1000-query batches the
            # ~34 ms dispatch round trip is <10% — recall_time_curve has
            # the fully pipelined variant)
            forest.query(queries, **kw)
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                got, _ = forest.query(queries, **kw)
            dt = (time.perf_counter() - t0) / reps
            line = {"bench": name, "steps": steps, "mode": mode,
                    "qps": round(n_query / dt, 1)}
            for k in ks:
                hits = 0
                for i in range(n_query):
                    hits += len(set(gt_ids[i][:k].tolist())
                                & set(int(v) for v in got[i][:k] if v >= 0))
                line[f"recall@{k}"] = round(hits / (n_query * k), 4)
            print(json.dumps(line), flush=True)
            lines.append(line)
    import os

    if os.environ.get("LARGE_IVF"):
        # clustered-flat comparison on the SAME corpus + GT (sampled-Lloyd
        # build; pipelined timing like the forest rows above)
        from similaritysearchbyrdf_tpu.ops.ivf import (
            IVFFlatIndex, ivf_window_budget)

        t0 = time.perf_counter()
        ivf = IVFFlatIndex(target_cluster=256, win=64, refine=128,
                           train_sample=min(n, 2_000_000))
        ivf.fit(DenseBatch(ids, x))
        jax.block_until_ready(ivf.state.sketch)
        ivf_build = time.perf_counter() - t0
        print(f"[{name}] IVF build: {ivf_build:.1f}s", flush=True)
        for npb in (4, 8, 16):
            ivf.query(queries, k=max(ks), query_ids=ids[:n_query],
                      nprobe=npb)                       # compile + warm
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                got, _ = ivf.query(queries, k=max(ks),
                                   query_ids=ids[:n_query], nprobe=npb)
            dt = (time.perf_counter() - t0) / reps
            line = {"bench": name, "engine": "ivf", "nprobe": npb,
                    "ivf_build_s": round(ivf_build, 1),
                    "qps": round(n_query / dt, 1)}
            for k in ks:
                hits = sum(
                    len(set(gt_ids[i][:k].tolist())
                        & set(int(v) for v in got[i][:k] if v >= 0))
                    for i in range(n_query))
                line[f"recall@{k}"] = round(hits / (n_query * k), 4)
            print(json.dumps(line), flush=True)
            lines.append(line)

    out = {
        "corpus": name, "n": n, "dim": d,
        "build_s": round(build_s, 1),
        "build_vectors_per_sec": round(n / build_s, 1),
        "index_bytes_per_vector": round(forest.index_bytes_per_vector(), 1),
        "coarse_tier_bytes_per_vector": round(
            forest.state.coarse_by_table.size
            * forest.state.coarse_by_table.dtype.itemsize / n, 1)
            if forest.state.coarse_by_table is not None else 0.0,
        "points": lines,
        "note": "synthetic clustered corpus (zero-egress image); exact GT",
    }
    fn = f"results/{name.replace('.', 'p')}.json"
    with open(fn, "w") as f:
        json.dump(out, f, indent=1)
    print("WROTE", fn, flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "glove"
    if which == "glove":
        run("glove1.2m", 1_200_000, 100, 20_000, 0.05, ks=(10,), steps_list=(0, 1),
            coarse_dim=32)
    elif which == "sift":
        run("sift1m", 1_000_000, 128, 20_000, 0.05, ks=(1, 10, 100),
            steps_list=(0, 1))
    else:
        raise SystemExit(f"unknown bench {which}")
