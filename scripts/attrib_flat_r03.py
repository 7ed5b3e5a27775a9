"""Stage attribution for the CURRENT grouped flat path at 8M×96, B=1024:
qmajor group-max kernel + exact two-level hierarchical group select
(ops/flat._grouped_candidates), plus a block_b sweep of the gmax kernel
(the [8192,128]x[128,block_b] MXU tile may be under-wide at block_b=128).

Method: cumulative scalar-output programs (CLAUDE.md benchmarking
pitfalls); kernel output verified vs numpy before timing.

Run (real TPU, one client at a time):  python scripts/attrib_flat_r03.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.flat import build_flat_sketch, _pad_lanes
    from similaritysearchbyrdf_tpu.ops.pallas.flat_groupmax import (
        pallas_flat_groupmax_qmajor,
    )
    from similaritysearchbyrdf_tpu.ops.pallas.coarse_gather import (
        pallas_coarse_scores_aligned,
    )

    N, D, NQ = 8_000_000, 96, 1024
    GROUP, RG, REFINE = 64, 24, 128
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
    corpus_p = jnp.pad(corpus, ((0, 0), (0, 128 - D)))
    qd = jnp.asarray(x[:NQ])
    del corpus
    DP = sk.shape[1]

    def quant(q):
        qs = 127.0 / jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True),
                                 1e-30)
        return jnp.clip(jnp.round(q * qs), -127, 127).astype(jnp.int8)

    # --- verify qmajor kernel vs numpy on a slice ---
    q_lp_host = np.asarray(_pad_lanes(quant(qd))[:, :DP], dtype=np.int32)
    sk_host = np.asarray(skp[:8192], dtype=np.int32)
    gm_ref = (sk_host @ q_lp_host[:4].T).reshape(8192 // GROUP, GROUP, 4).max(1)
    gm_dev = np.asarray(
        pallas_flat_groupmax_qmajor(skp, _pad_lanes(quant(qd))[:, :DP],
                                    group=GROUP, block_b=128, block_n=8192)
    )[:4, : 8192 // GROUP].T
    assert np.array_equal(gm_ref.astype(np.float32), gm_dev), "VERIFY FAILED"
    print("verify: qmajor group-max matches numpy on [8192, 4] slice",
          flush=True)

    ng = npad // GROUP

    def upto(stage, block_b=128):
        def run(skp, corpus_p, q):
            q_lp = _pad_lanes(quant(q))[:, :DP]
            gmax = pallas_flat_groupmax_qmajor(
                skp, q_lp, group=GROUP, block_b=block_b, block_n=8192)
            if stage == "gmax":
                return gmax.sum()
            g_live = (jnp.arange(ng, dtype=jnp.int32) * GROUP) < N
            gmax = jnp.where(g_live[None, :], gmax, -jnp.inf)
            # exact two-level select (ops/flat.py): top-RG supergroups
            # provably contain every top-RG group
            sg = 64
            nsg = ng // sg
            sgmax = gmax.reshape(NQ, nsg, sg).max(axis=-1)
            _, sgi = jax.lax.top_k(sgmax, RG)
            child = (sgi[:, :, None] * sg
                     + jnp.arange(sg, dtype=jnp.int32)).reshape(NQ, RG * sg)
            cg = jnp.take_along_axis(gmax, child, axis=1)
            _, ci = jax.lax.top_k(cg, RG)
            gidx = jnp.take_along_axis(child, ci, axis=1)
            if stage == "select":
                return gidx.sum()
            blk = gidx * GROUP
            w = pallas_coarse_scores_aligned(
                skp[None], _pad_lanes(q.astype(jnp.bfloat16))[:, :DP],
                jnp.zeros_like(gidx), blk, GROUP)
            if stage == "windows":
                return w.sum()
            pos = (blk[:, :, None]
                   + jnp.arange(GROUP, dtype=jnp.int32)).reshape(NQ, -1)
            ws = jnp.where(pos < N, w.reshape(NQ, -1), -jnp.inf)
            _, sel = jax.lax.approx_max_k(ws, REFINE, recall_target=0.998)
            cand = jnp.take_along_axis(pos, sel, axis=1)
            if stage == "select2":
                return cand.sum()
            rows = corpus_p[jnp.clip(cand, 0, N - 1)]
            exact = jnp.einsum(
                "brd,bd->br", rows, jnp.pad(q, ((0, 0), (0, 128 - D))),
                preferred_element_type=jnp.float32)
            return exact.sum()

        return jax.jit(run)

    out = {}

    def timeit(label, fn, *args, reps=5):
        r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps
        out[label] = round(dt * 1e3, 2)
        print(f"{label}: {dt*1e3:.2f} ms", flush=True)
        return dt

    prev = 0.0
    for stage in ("gmax", "select", "windows", "select2", "exact"):
        dt = timeit(f"upto_{stage}", upto(stage), skp, corpus_p, qd)
        print(f"  stage '{stage}' adds {(dt-prev)*1e3:+.2f} ms", flush=True)
        out[f"stage_{stage}_ms"] = round((dt - prev) * 1e3, 2)
        prev = dt

    # gmax MXU-tile sweep: wider query tiles per grid step
    for bb in (256, 512, 1024):
        timeit(f"gmax_bb{bb}", upto("gmax", block_b=bb), skp, corpus_p, qd)

    with open("results/attrib_flat_r03.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
