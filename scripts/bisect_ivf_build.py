"""IVF build-time bisect at Deep-8M (VERDICT r4 item 6): attribute the
~275 s full-Lloyd build (assign vs update vs permutation vs relayout) and
prove the sampled-Lloyd default (`default_train_sample`: 1M-row training +
one full assignment) holds the query frontier while cutting build time.

Phases timed (fresh 8M x 96 clustered corpus, k = 31,250):
  assign_full     one full-corpus assignment pass (the per-iteration unit)
  iter_full       one full Lloyd iteration (assign + one-hot update)
  lloyd_sampled   6 Lloyd iterations on the 1M sample
  assign_final    the single full assignment of the sampled recipe
  perm_host       _cluster_perm (host numpy, 31k-cluster loop)
  relayout        device gather + sketch quantization + ids
Then builds BOTH states sequentially (full freed before sampled) and
measures the headline point (nprobe=1, win=128, refine=128) qps + recall
on each.

Run: timeout 5400 python scripts/bisect_ivf_build.py > /tmp/bisect_ivf.log 2>&1
Writes results/bisect_ivf_build.json.
"""

import gc
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import wait_for_backend  # noqa: E402

N, D, NQ = 8_000_000, 96, 1024


def clustered_corpus():
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(50_000, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 50_000, N)] + 0.05 * rng.normal(size=(N, D))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x.astype(np.float32)


def _merge_out(out):
    """Merge into results/bisect_ivf_build.json (modes run in separate
    processes — one process holding the phase arrays plus two full builds
    OOMs 16 GB HBM, the multi-engine-bench lesson)."""
    import jax

    dest = ("results/bisect_ivf_build.json"
            if jax.default_backend() == "tpu"
            else "/tmp/bisect_ivf_build_cpu.json")
    try:
        with open(dest) as f:
            prior = json.load(f)
    except (OSError, ValueError):
        prior = {}
    prior.update({k: v for k, v in out.items()
                  if k not in ("phases", "points")})
    prior.setdefault("phases", {}).update(out.get("phases", {}))
    prior.setdefault("points", [])
    prior["points"] += out.get("points", [])
    with open(dest, "w") as f:
        json.dump(prior, f, indent=1)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "phases"
    wait_for_backend()
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops import ivf as IV
    from similaritysearchbyrdf_tpu.ops.flat import _pad_lanes

    out = {"n": N, "dim": D, "k": None, "phases": {}, "points": []}
    x = clustered_corpus()
    queries = x[:NQ]
    try:
        gt = np.load("/tmp/deep8m_gt.npz")["gt"]
    except Exception:
        from similaritysearchbyrdf_tpu.ops.exact import exact_search
        gt, _ = exact_search(x, queries, k=10, exclude_self=True)
        np.savez("/tmp/deep8m_gt.npz", gt=gt)
    gt_sets = [set(map(int, gt[i])) for i in range(NQ)]

    k = int(np.clip(N // 256, 16, 65536))
    out["k"] = k

    if mode in ("sampled", "full"):
        tag, ts = (("sampled_auto", "auto") if mode == "sampled"
                   else ("full", None))
        t0 = time.perf_counter()
        state = IV.build_ivf(jnp.asarray(x), np.arange(N, dtype=np.int32),
                             target_cluster=256, iters=6, seed=0,
                             train_sample=ts)
        jax.block_until_ready(state.sketch)
        build_s = round(time.perf_counter() - t0, 1)
        pt = headline_point(state, queries, gt_sets, tag)
        pt["build_s"] = build_s
        out["points"].append(pt)
        _merge_out(out)
        print(json.dumps(out), flush=True)
        return

    xd = _pad_lanes(jnp.asarray(x))
    # _kmeans_assign needs a chunk-multiple row count (kmeans pads
    # internally; the assign-only jit does not)
    chunk = 65536
    npad2 = (N + chunk - 1) // chunk * chunk
    xd = jnp.pad(xd, ((0, npad2 - N), (0, 0))) if npad2 != N else xd
    valid = jnp.zeros((npad2,), bool).at[:N].set(True)

    # --- phase timings ---
    rng = np.random.default_rng(0xC1)
    init_rows = jnp.asarray(
        rng.choice(N, size=k, replace=False).astype(np.int32))
    cent0 = xd.astype(jnp.bfloat16)[init_rows]

    t0 = time.perf_counter()
    a = IV._kmeans_assign(xd, cent0, chunk)
    jax.block_until_ready(a)
    out["phases"]["assign_full_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    cent1, a1 = IV._kmeans_iter(xd.astype(jnp.bfloat16), cent0, valid,
                                chunk)
    jax.block_until_ready(cent1)
    out["phases"]["iter_full_s"] = round(time.perf_counter() - t0, 2)
    del cent1, a1, a
    gc.collect()

    s = min(1_000_000, N // 2)
    sel = np.sort(np.random.default_rng(1).choice(N, size=s, replace=False)
                  ).astype(np.int32)
    xs = xd[jnp.asarray(sel)]
    t0 = time.perf_counter()
    cent_s, _ = IV.kmeans(xs, jnp.ones((s,), bool), k, iters=6, seed=0,
                          chunk=65536)
    jax.block_until_ready(cent_s)
    out["phases"]["lloyd_sampled_s"] = round(time.perf_counter() - t0, 2)
    del xs

    t0 = time.perf_counter()
    a_final = IV._kmeans_assign(xd, cent_s, chunk)
    a_np = np.asarray(a_final)[:N]
    out["phases"]["assign_final_s"] = round(time.perf_counter() - t0, 2)
    del a_final

    t0 = time.perf_counter()
    perm, starts, counts = IV._cluster_perm(a_np, k)
    out["phases"]["perm_host_s"] = round(time.perf_counter() - t0, 2)
    del perm, starts, counts
    del xd, cent_s, cent0
    gc.collect()
    print("phases:", json.dumps(out["phases"]), flush=True)
    _merge_out(out)
    print(json.dumps(out), flush=True)


def headline_point(state, queries, gt_sets, tag):
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.ivf import (
        ivf_topk, ivf_window_budget)

    qd = jnp.asarray(queries)
    qid = jnp.arange(NQ, dtype=jnp.int32)
    wb = ivf_window_budget(state.starts, state.ends, 1, 128)

    def run():
        ids, _ = ivf_topk(
            state.sketch, state.corpus, state.row_ids,
            state.centroids, state.starts, state.ends, qd, qid,
            10, nprobe=1, win=128, wb=wb, refine=128)
        return ids

    ids = run()
    jax.block_until_ready(ids)
    t0 = time.perf_counter()
    reps = 4
    for _ in range(reps):
        ids = run()
    jax.block_until_ready(ids)
    dt = (time.perf_counter() - t0) / reps
    ids_np = np.asarray(ids)
    rec = sum(len(gt_sets[i] & set(int(v) for v in ids_np[i] if v >= 0))
              for i in range(NQ)) / (NQ * 10)
    pt = {"train": tag, "nprobe": 1, "win": 128, "refine": 128,
          "qps": round(NQ / dt), "recall@10": round(rec, 4)}
    print(tag, json.dumps(pt), flush=True)
    return pt


if __name__ == "__main__":
    main()
