"""Cumulative scalar-output bisect of the argpack flat pipeline at 8M×96,
B=1024 (tune_argpack surprise: rf128 only matched exact2, and qps fell
superlinearly with refine — 30.8k/20.3k/11.7k/4.5k at rf 128/256/512/1024).

Stages: packed gmax kernel → sgmax reshape-max → level-1 sort →
child row-gather → level-2 sort → unpack → exact refine.

Run: timeout 5400 python scripts/bisect_argpack.py > /tmp/bisect_argpack.log 2>&1
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.flat import (_pad_lanes,
                                                    build_flat_sketch,
                                                    _I32_DEAD)
    from similaritysearchbyrdf_tpu.ops.pallas.flat_groupmax import (
        pallas_flat_groupmax_qmajor)

    N, D, B = 8_000_000, 96, 1024
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(50_000, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 50_000, N)] + 0.05 * rng.normal(size=(N, D))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)

    corpus = _pad_lanes(jnp.asarray(x))
    sketch, _ = build_flat_sketch(jnp.asarray(x), "int8")
    row_ids = jnp.arange(N, dtype=jnp.int32)
    jax.block_until_ready(sketch)
    qd = jnp.asarray(x[:B])
    qids = jnp.arange(B, dtype=jnp.int32)

    group, sg = 64, 64
    nrows, d = sketch.shape
    npad = int(np.ceil(nrows / 8192)) * 8192
    sk = jnp.pad(sketch, ((0, npad - nrows), (0, 0)))
    ng = npad // group
    nsg = ng // sg
    shift = 6

    def prog(stage, refine):
        @jax.jit
        def run(sk, corpus, row_ids, queries, query_ids):
            qs = 127.0 / jnp.maximum(jnp.max(jnp.abs(queries), axis=1,
                                             keepdims=True), 1e-30)
            q_lp = jnp.clip(jnp.round(queries * qs), -127,
                            127).astype(jnp.int8)
            q_lp = _pad_lanes(q_lp)[:, :d]
            packed = pallas_flat_groupmax_qmajor(
                sk, q_lp, group=group, block_b=512, block_n=8192,
                pack_arg=True)
            if stage == "gmax":
                return packed.sum()
            g_live = (jnp.arange(ng, dtype=jnp.int32) * group) < N
            packed = jnp.where(g_live[None, :], packed, _I32_DEAD)
            rg = refine
            p3 = packed.reshape(B, nsg, sg)
            sgmax = p3.max(axis=-1)
            if stage == "sgmax":
                return sgmax.sum()
            _, sgi = jax.lax.sort((-sgmax, jnp.broadcast_to(
                jnp.arange(nsg, dtype=jnp.int32), (B, nsg))), num_keys=1)
            sgi = sgi[:, :rg]
            if stage == "sort1":
                return sgi.sum()
            cg = jnp.take_along_axis(p3, sgi[:, :, None], axis=1).reshape(
                B, rg * sg)
            if stage == "childgather":
                return cg.sum()
            child = (sgi[:, :, None] * sg
                     + jnp.arange(sg, dtype=jnp.int32)).reshape(B, rg * sg)
            sc_f = (cg >> shift).astype(jnp.float32)
            _, li = jax.lax.approx_max_k(sc_f, rg, recall_target=0.998)
            gidx = jnp.take_along_axis(child, li, axis=1)
            gpk = jnp.take_along_axis(cg, li, axis=1)
            if stage == "sort2":
                return gidx.sum() + gpk.sum()
            cand = gidx * group + (gpk & (group - 1))
            sel_s = (gpk >> shift).astype(jnp.float32)
            sel_s = jnp.where((gpk > _I32_DEAD) & (cand < N), sel_s,
                              -jnp.inf)
            if stage == "unpack":
                return cand.sum() + sel_s.sum()
            from similaritysearchbyrdf_tpu.ops.flat import _exact_refine
            ids, scores = _exact_refine(corpus, row_ids, queries, cand,
                                        jnp.isfinite(sel_s), query_ids,
                                        10, True)
            return ids.sum() + scores.sum()

        return run

    out = {"n": N, "b": B, "points": {}}
    for refine in (128, 512):
        prev = 0.0
        for stage in ("gmax", "sgmax", "sort1", "childgather", "sort2",
                      "unpack", "full"):
            run = prog(stage, refine)
            r = run(sk, corpus, row_ids, qd, qids)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(5):
                r = run(sk, corpus, row_ids, qd, qids)
            jax.block_until_ready(r)
            t = (time.perf_counter() - t0) / 5
            key = f"rf{refine}_{stage}"
            out["points"][key] = {"upto_ms": round(t * 1e3, 2),
                                  "stage_ms": round((t - prev) * 1e3, 2)}
            print(f"{key}: upto {t*1e3:.2f} ms (stage "
                  f"{(t-prev)*1e3:.2f} ms)", flush=True)
            prev = t
    with open("results/bisect_argpack.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
