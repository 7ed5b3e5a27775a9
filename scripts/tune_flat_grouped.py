"""Grouped flat engine on TPU at 8M×96: fused group-max kernel vs the
plain block scan, r_groups sweep, recall verified vs exact GT.
Run: python scripts/tune_flat_grouped.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.flat import (
        build_flat_sketch, flat_topk, flat_topk_grouped,
    )

    N, D, NQ = 8_000_000, 96, 1024
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(50_000, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 50_000, N)] + 0.05 * rng.normal(size=(N, D))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)
    gt = np.load("/tmp/deep8m_gt.npz")["gt"]
    gt_sets = [set(map(int, gt[i])) for i in range(NQ)]

    corpus = jnp.asarray(x)
    sk, _ = build_flat_sketch(corpus, "int8")
    rid = jnp.arange(N, dtype=jnp.int32)
    qd = jnp.asarray(x[:NQ])
    qids = jnp.arange(NQ, dtype=jnp.int32)

    points = []

    def timed(label, fn, meta):
        try:
            ids, _ = fn()
            jax.block_until_ready(ids)
            t0 = time.perf_counter()
            for _ in range(5):
                ids, _ = fn()
            jax.block_until_ready(ids)
            dt = (time.perf_counter() - t0) / 5
            ids_np = np.asarray(ids)
            hits = sum(len(gt_sets[i] & set(int(v) for v in ids_np[i]
                                            if v >= 0)) for i in range(NQ))
            rec = hits / (NQ * 10)
            print(f"{label}: {NQ/dt:.0f} qps recall {rec:.4f}", flush=True)
            points.append(dict(meta, qps=round(NQ / dt),
                               **{"recall@10": round(rec, 4)}))
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"{label}: FAILED {type(e).__name__}", flush=True)

    # large groups kill the approx_max_k select wall (~12 ms over NG=125k at
    # group 64 — results/ab_qmajor.json); sweep checks the recall cost
    for g, rg, rf, rt in ((64, 24, 128, 0.998), (256, 6, 128, 0.998),
                          (256, 12, 128, 0.998), (512, 6, 128, 0.998),
                          (512, 12, 128, 0.998), (512, 24, 128, 0.998)):
        timed(f"g{g}_rg{rg}_rf{rf}_rt{rt}",
              lambda g=g, rg=rg, rf=rf, rt=rt: flat_topk_grouped(
                  sk, corpus, rid, qd, qids, 10, refine=rf, r_groups=rg,
                  group=g, recall_target=rt),
              {"group": g, "r_groups": rg, "refine": rf, "recall_target": rt})
    import json
    with open("results/tune_grouped_r02.json", "w") as f:
        json.dump({"points": points,
                   "note": "8Mx96 B=1024 int8; synthetic seed 11; exact GT; "
                           "pipelined timing; v5e"}, f, indent=1)


def stages():
    """Scalar-output bisection of the grouped path at 8M×96."""
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.flat import build_flat_sketch, _pad_lanes
    from similaritysearchbyrdf_tpu.ops.pallas.flat_groupmax import (
        pallas_flat_groupmax,
    )
    from similaritysearchbyrdf_tpu.ops.pallas.coarse_gather import (
        pallas_coarse_scores_aligned,
    )

    N, D, NQ = 8_000_000, 96, 1024
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(50_000, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 50_000, N)] + 0.05 * rng.normal(size=(N, D))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)
    corpus = jnp.asarray(x)
    sk, _ = build_flat_sketch(corpus, "int8")
    npad = int(np.ceil(N / 8192)) * 8192
    skp = jnp.pad(sk, ((0, npad - N), (0, 0)))
    corpus_p = jnp.pad(corpus, ((0, 0), (0, 128 - D)))   # 128-lane f32 rows
    qd = jnp.asarray(x[:NQ])
    rid = jnp.arange(N, dtype=jnp.int32)

    def quant(q):
        qs = 127.0 / jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True),
                                 1e-30)
        return jnp.clip(jnp.round(q * qs), -127, 127).astype(jnp.int8)

    def upto(stage, rg=24, rt=0.998):
        def run(skp, corpus, corpus_p, q):
            q_lp = _pad_lanes(quant(q))[:, :sk.shape[1]]
            gmax_t = pallas_flat_groupmax(skp, q_lp, group=64,
                                          block_b=128, block_n=8192)
            if stage == "gmax":
                return gmax_t.sum()
            gmax = gmax_t.T
            if stage == "transpose":
                return gmax.sum()
            ng = npad // 64
            g_live = (jnp.arange(ng, dtype=jnp.int32) * 64) < N
            gmax = jnp.where(g_live[None, :], gmax, -jnp.inf)
            _, gidx = jax.lax.approx_max_k(gmax, rg, recall_target=rt)
            if stage == "select":
                return gidx.sum()
            blk = gidx * 64
            w = pallas_coarse_scores_aligned(
                skp[None], _pad_lanes(qd.astype(jnp.bfloat16))[:, :sk.shape[1]],
                jnp.zeros_like(gidx), blk, 64)
            if stage == "windows":
                return w.sum()
            pos = (blk[:, :, None] + jnp.arange(64, dtype=jnp.int32)).reshape(
                NQ, -1)
            ws = jnp.where(pos < N, w.reshape(NQ, -1), -jnp.inf)
            _, sel = jax.lax.approx_max_k(ws, 128, recall_target=rt)
            cand = jnp.take_along_axis(pos, sel, axis=1)
            if stage == "select2":
                return cand.sum()
            if stage == "full3":
                rows = corpus_p[jnp.clip(cand, 0, N - 1)]
                exact = jnp.einsum(
                    "brd,bd->br", rows,
                    jnp.pad(qd, ((0, 0), (0, 128 - D))),
                    preferred_element_type=jnp.float32)
            else:
                rows = corpus[jnp.clip(cand, 0, N - 1)]
                exact = jnp.einsum("brd,bd->br", rows, qd,
                                   preferred_element_type=jnp.float32)
            return exact.sum()

        return jax.jit(run)

    prev = 0.0
    for stage in ("full", "full3"):
        fn = upto(stage)
        out = fn(skp, corpus, corpus_p, qd)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(skp, corpus, corpus_p, qd)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 5
        print(f"upto {stage}: {dt*1e3:.1f}ms (+{(dt-prev)*1e3:.1f})",
              flush=True)
        prev = dt


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "stages":
        raise SystemExit(stages())
    main()
