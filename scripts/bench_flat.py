"""Quantized-flat engine bench: 1.2M×100d and 8M×96d, recall vs exact GT.

Pipelined device timing (dispatch n, block once); outputs are verified
against exact ground truth (recall printed), so a silently-not-executing
program cannot fake a number. Run: python scripts/bench_flat.py [which]
where which ∈ {glove, deep, both}. Reuses /tmp GT caches.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

# FLAT_CORPUS_DTYPE=bfloat16 A/Bs the exact-refine tier's residency dtype
# (FlatIndex(corpus_dtype=...)); results go to results/flat_bf16.json so
# the canonical f32-tier points in flat.json are never overwritten.
_CORPUS_DTYPE = os.environ.get("FLAT_CORPUS_DTYPE", "float32")
# FLAT_BENCH_REFINE overrides the refine depth of BOTH corpora's grouped
# and scan legs — for re-pointing at a sweep-chosen operating point
# (results/tune_argpack.json) without editing the script.
_BENCH_REFINE = int(os.environ.get("FLAT_BENCH_REFINE", "128"))


def make_corpus(n, d, seed, n_centers):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_centers, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, n_centers, n)] + 0.05 * rng.normal(size=(n, d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def gt_for(x, queries, cache):
    from similaritysearchbyrdf_tpu.ops.exact import exact_search

    try:
        return np.load(cache)["gt"]
    except Exception:
        t0 = time.perf_counter()
        gt, _ = exact_search(x, queries, k=10, exclude_self=True)
        np.savez(cache, gt=gt)
        print(f"GT: {time.perf_counter()-t0:.1f}s", flush=True)
        return gt


def bench_one(name, x, seed_tag, dtype="int8", refine=None, block=1 << 20):
    if refine is None:
        refine = _BENCH_REFINE
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.flat import (
        _BLOCK_N, _GMAX_HALVED, _GMAX_QLANE, _gmax_tile_plan, _pad_lanes,
        build_flat_sketch, flat_topk, flat_topk_grouped,
        stride_for_halved_gmax,
    )

    n, d = x.shape
    nq = 1024
    queries = x[:nq]
    # deep8m shares its corpus construction (seed 11, 50k centers) and
    # query set with scripts/bench_deep10m.py — reuse its GT cache
    cache = ("/tmp/deep8m_gt.npz" if seed_tag == "deep8m"
             else f"/tmp/flat_gt_{seed_tag}.npz")
    gt = gt_for(x, queries, cache)
    gt_sets = [set(map(int, gt[i])) for i in range(nq)]

    t0 = time.perf_counter()
    corpus = _pad_lanes(jnp.asarray(x))
    if _CORPUS_DTYPE == "bfloat16":
        corpus = corpus.astype(jnp.bfloat16)
    sketch, scale = build_flat_sketch(jnp.asarray(x), dtype)
    row_ids = jnp.arange(n, dtype=jnp.int32)
    sketch_gmax = None
    # the default qlane gmax kernel consumes the same strided copy as the
    # halved kernel (ops/flat._ensure_gmax_sketch mirrors this rule)
    if _GMAX_HALVED or (_GMAX_QLANE and dtype == "int8"
                        and _gmax_tile_plan(sketch.shape[1])[0]):
        npad = (n + _BLOCK_N - 1) // _BLOCK_N * _BLOCK_N
        sketch_gmax = stride_for_halved_gmax(
            jnp.pad(sketch, ((0, npad - n), (0, 0))))
    jax.block_until_ready(sketch)
    build_s = time.perf_counter() - t0

    qd = jnp.asarray(queries)
    qids = jnp.arange(nq, dtype=jnp.int32)
    row = {
        "corpus": name, "n": n, "dim": d, "sketch": dtype,
        "refine": refine, "block": block,
        "build_s": round(build_s, 2),
        "corpus_dtype": _CORPUS_DTYPE,
        "sketch_bytes_per_vector": int(sketch.shape[1])
        * (2 if sketch_gmax is not None else 1),
        "gmax_halved": sketch_gmax is not None,
    }
    for mode in ("grouped", "scan"):
        def go():
            if mode == "grouped":
                return flat_topk_grouped(sketch, corpus, row_ids, qd, qids,
                                         10, refine=refine, r_groups=24,
                                         sketch_gmax=sketch_gmax,
                                         gmax_halved=sketch_gmax is not None)
            return flat_topk(sketch, corpus, row_ids, qd, qids, 10,
                             refine=refine, block=block)

        ids, scores = go()
        jax.block_until_ready(ids)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            ids, scores = go()
        jax.block_until_ready(ids)
        dt = (time.perf_counter() - t0) / reps
        ids_np = np.asarray(ids)
        hits = sum(len(gt_sets[i] & set(int(v) for v in ids_np[i] if v >= 0))
                   for i in range(nq))
        row[f"{mode}_qps"] = round(nq / dt, 1)
        row[f"{mode}_recall@10"] = round(hits / (nq * 10), 4)
    row["qps"] = max(row["grouped_qps"], row["scan_qps"])
    row["recall@10"] = (row["grouped_recall@10"]
                        if row["grouped_qps"] >= row["scan_qps"]
                        else row["scan_recall@10"])
    print("FLAT " + json.dumps(row), flush=True)
    return row


def main(which="both"):
    rows = []
    if which in ("glove", "both"):
        x = make_corpus(1_200_000, 100, 7, 20_000)
        rows.append(bench_one("glove1.2m_100d", x, "1p2m"))
        del x
    if which in ("deep", "both"):
        x = make_corpus(8_000_000, 96, 11, 50_000)
        # reuse bench_deep10m's GT cache when present
        rows.append(bench_one("deep8m_96d", x, "deep8m", block=1 << 21))
        del x
    out = ("results/flat.json" if _CORPUS_DTYPE == "float32"
           else f"results/flat_{_CORPUS_DTYPE}.json")
    try:  # keep the other corpus's row on partial (glove/deep-only) runs
        with open(out) as f:
            prior = json.load(f).get("points", [])
        seen = {p["corpus"] for p in rows}
        rows += [p for p in prior if p["corpus"] not in seen]
    except Exception:
        pass
    with open(out, "w") as f:
        json.dump({"points": rows,
                   "note": "quantized-flat engine (ops/flat.py); synthetic "
                           "clustered corpora; exact GT; pipelined timing; "
                           f"exact tier dtype {_CORPUS_DTYPE}"},
                  f, indent=1)
    print(f"WROTE {out}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "both")
