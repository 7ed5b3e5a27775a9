"""pStable (E2LSH) family end-to-end operating point on TPU — VERDICT r1
item 9: the reference's E2LSH comparison is a headline claim
(`/root/reference/README.md:7`), so commit a measured pStable recall/qps
artifact next to the angle-family curves. Config picked by a CPU param scan
(chain 10, w=2 maximized recall at 20k; small w = selective per-function
buckets). Multi-probe stays off: the compound hash is `Arrays.hashCode` of
the per-function ints (`PStableHashFamily.scala:122-143`), so bit flips of
the packed value are not meaningful probes.

Run: timeout 3600 python scripts/bench_pstable.py > /tmp/bench_pstable.log 2>&1
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    from similaritysearchbyrdf_tpu.config import (
        PStableConfig, RDFConfig, TableConfig,
    )
    from similaritysearchbyrdf_tpu.index.forest import RDFForest
    from similaritysearchbyrdf_tpu.ops.exact import exact_search
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    N, D, NQ = 200_000, 100, 1000
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(2000, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 2000, N)] + 0.05 * rng.normal(size=(N, D))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)
    queries = x[:NQ]
    gt, _ = exact_search(x, queries, k=10, exclude_self=True)
    gt = np.asarray(gt)

    out = {"corpus": "pstable_200k", "n": N, "dim": D, "family": "pStable",
           "points": []}
    # bucket size scales with N: selectivity (chain length) must grow with
    # the corpus or the candidate cap truncates whole buckets (the 20k-tuned
    # chain 10 collapsed to 0.41 recall at 200k)
    for cl, w, m_cap in ((10, 2, 32768), (12, 2, 32768), (14, 2, 32768),
                         (12, 1, 32768)):
        conf = RDFConfig(
            vector_dim=D, table_num=10, permutation_num=3, family_size=100,
            partition_bits=3, family_name="pStable",
            pstable=PStableConfig(w=w),
            lsh_table=TableConfig(chain_length=cl, bucket_overflow=500),
            max_candidates=m_cap, query_batch_size=250,
        )
        forest = RDFForest(conf)
        t0 = time.perf_counter()
        forest.fit(DenseBatch(np.arange(N, dtype=np.int32), x))
        jax.block_until_ready(forest.state.tables.sorted_keys)
        build_s = time.perf_counter() - t0
        for steps in (0, 1):
            kw = dict(steps=steps, query_ids=np.arange(NQ), multiprobe=False)
            forest.query(queries, **kw)                  # compile + warm
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                got, _ = forest.query(queries, **kw)
            dt = (time.perf_counter() - t0) / reps
            hits = sum(len(set(gt[i].tolist()) & set(int(v) for v in got[i]
                                                     if v >= 0))
                       for i in range(NQ))
            rec = hits / (NQ * 10)
            print(f"chain{cl}_w{w}_cap{m_cap}_steps{steps}: {NQ/dt:.0f} qps "
                  f"recall {rec:.4f}", flush=True)
            out["points"].append(
                {"chain_length": cl, "w": w, "m_cap": m_cap, "steps": steps,
                 "build_s": round(build_s, 1),
                 "index_bytes_per_vector":
                     round(forest.index_bytes_per_vector(), 1),
                 "qps": round(NQ / dt), "recall@10": round(rec, 4)})
    out["note"] = ("synthetic clustered corpus; exact GT; multiprobe off "
                   "(hashCode-packed compound hash); v5e")
    with open("results/pstable.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
