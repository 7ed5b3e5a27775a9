"""Stage attribution for the grouped flat path at 8M×96, B=1024 — r05:
r04 plus per-stage ROOFLINE fields (VERDICT r3 item 6): each stage's
achieved Tops/s (vs 394 int8 / 197 bf16 / ~99 f32 v5e peaks) and GB/s (vs
819 GB/s HBM) from an explicit ops/bytes model, so "stage X is the wall"
claims carry the which-peak-it-hits evidence.

mirrors the CURRENT shipped pipeline (ops/flat._grouped_candidates): qmajor
group-max (optionally halved/strided, FLAT_GMAX_HALVED), exact two-level
select with ROW-gathered children (FLAT_SELECT_SG), aligned-window DMA
rescore, approx select2, exact f32 refine.

Knobs via env: FLAT_GMAX_HALVED (0/1), FLAT_GMAX_BLOCK_B, FLAT_GMAX_NSUB,
FLAT_SELECT_SG.

Method: cumulative scalar-output programs (CLAUDE.md benchmarking
pitfalls); gmax verified vs numpy before timing; sketch passed as a jit
argument (never closed over — 1 GB HLO constants kill remote compiles).

Run (real TPU, one client at a time):  python scripts/attrib_flat_r05.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

HALVED = os.environ.get("FLAT_GMAX_HALVED", "0") == "1"
BLOCK_B = int(os.environ.get("FLAT_GMAX_BLOCK_B", "512"))
NSUB = int(os.environ.get("FLAT_GMAX_NSUB", "1"))
SG = int(os.environ.get("FLAT_SELECT_SG", "64"))

N, D, NQ = 8_000_000, 96, 1024
GROUP, RG, REFINE = 64, 24, 128


def main():
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.flat import (
        _pad_lanes, stride_for_halved_gmax,
    )
    from similaritysearchbyrdf_tpu.ops.pallas.flat_groupmax import (
        pallas_flat_groupmax_qmajor,
    )
    from similaritysearchbyrdf_tpu.ops.pallas.coarse_gather import (
        pallas_coarse_scores_aligned,
    )

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(50_000, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 50_000, N)] + 0.05 * rng.normal(size=(N, D))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)
    del centers

    # host-side quantize (device OOM'd building the f32 corpus alongside a
    # stale client's HBM, batch3 log)
    scale = 127.0 / max(float(np.max(np.abs(x))), 1e-30)
    npad = int(np.ceil(N / 8192)) * 8192
    DP = int(np.ceil(D / 128)) * 128
    sk_host = np.zeros((npad, DP), np.int8)
    sk_host[:N, :D] = np.clip(np.round(x * scale), -127, 127).astype(np.int8)
    skp = jnp.asarray(sk_host)
    sk_gm = jax.jit(stride_for_halved_gmax)(skp) if HALVED else skp
    jax.block_until_ready(sk_gm)
    corpus_p = jnp.asarray(np.pad(x[:N], ((0, 0), (0, 128 - D))))
    qd = jnp.asarray(x[:NQ])
    ng = npad // GROUP

    def quant(q):
        qs = 127.0 / jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True),
                                 1e-30)
        return jnp.clip(jnp.round(q * qs), -127, 127).astype(jnp.int8)

    # --- verify the gmax stage vs numpy on a [4096 groups, 2 queries] slice
    q_lp_host = np.asarray(_pad_lanes(quant(qd))[:, :DP], dtype=np.int32)
    gm_ref = (sk_host[: 4096 * GROUP] @ q_lp_host[:2].T).reshape(
        4096, GROUP, 2).max(1).T.astype(np.float32)
    gm_dev = np.asarray(
        pallas_flat_groupmax_qmajor(
            sk_gm, _pad_lanes(quant(qd))[:, :DP], group=GROUP,
            block_b=BLOCK_B, block_n=8192, nsub=NSUB, halved=HALVED)
    )[:2, :4096]
    assert np.array_equal(gm_ref, gm_dev), "GMAX VERIFY FAILED"
    print(f"verify ok (halved={HALVED} bb={BLOCK_B} nsub={NSUB} sg={SG})",
          flush=True)
    del sk_host, x

    def upto(stage):
        def run(sk_gm, skp, corpus_p, q):
            q_lp = _pad_lanes(quant(q))[:, :DP]
            gmax = pallas_flat_groupmax_qmajor(
                sk_gm, q_lp, group=GROUP, block_b=BLOCK_B, block_n=8192,
                nsub=NSUB, halved=HALVED)
            if stage == "gmax":
                return gmax.sum()
            g_live = (jnp.arange(ng, dtype=jnp.int32) * GROUP) < N
            gmax = jnp.where(g_live[None, :], gmax, -jnp.inf)
            # exact two-level select, ROW-gathered children (shipped code)
            nsg = ng // SG
            g3 = gmax.reshape(NQ, nsg, SG)
            sgmax = g3.max(axis=-1)
            _, sgi = jax.lax.top_k(sgmax, RG)
            cg = jnp.take_along_axis(
                g3, sgi[:, :, None], axis=1).reshape(NQ, RG * SG)
            child = (sgi[:, :, None] * SG
                     + jnp.arange(SG, dtype=jnp.int32)).reshape(NQ, RG * SG)
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

        jrun = jax.jit(run)
        return lambda q: jrun(sk_gm, skp, corpus_p, q)

    out = {"halved": HALVED, "block_b": BLOCK_B, "nsub": NSUB, "sg": SG}
    prev = 0.0
    for stage in ("gmax", "select", "windows", "select2", "exact"):
        fn = upto(stage)
        r = fn(qd)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            r = fn(qd)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / reps * 1e3
        out[f"upto_{stage}"] = round(dt, 2)
        out[f"stage_{stage}_ms"] = round(dt - prev, 2)
        print(f"upto {stage}: {dt:.2f} ms (+{dt - prev:.2f})", flush=True)
        prev = dt
    # --- per-stage roofline: ops/bytes models vs v5e peaks ---
    DP = int(np.ceil(D / 128)) * 128
    npad = int(np.ceil(N / 8192)) * 8192
    ng = npad // GROUP
    models = {
        # stage: (ops, peak_tops, hbm_bytes)
        "gmax": (2.0 * npad * DP * NQ, 394e12,
                 npad * DP + NQ * ng * 4),
        "select": (0.0, None, 3.0 * NQ * ng * 4),
        "windows": (2.0 * NQ * RG * GROUP * DP, 197e12,
                    1.0 * NQ * RG * GROUP * DP + NQ * RG * GROUP * 4),
        "select2": (0.0, None, 2.0 * NQ * RG * GROUP * 4),
        "exact": (2.0 * NQ * REFINE * 128, 99e12,
                  4.0 * NQ * REFINE * 128),
    }
    roof = {}
    for stage, (ops, peak, bts) in models.items():
        ms = out.get(f"stage_{stage}_ms")
        if not ms or ms <= 0:
            continue
        s = ms / 1e3
        roof[stage] = {
            "ops": ops, "hbm_bytes": bts,
            "achieved_tops": round(ops / s / 1e12, 2) if ops else 0.0,
            "mfu": (round(ops / s / peak, 3) if ops and peak else None),
            "achieved_gbps": round(bts / s / 1e9, 1),
            "hbm_frac": round(bts / s / 819e9, 3),
        }
    out["roofline"] = roof
    out["peaks"] = {"int8_tops": 394e12, "bf16_tflops": 197e12,
                    "hbm_gbps": 819e9}
    out["note"] = (f"{N}x{D} int8 B={NQ}; cumulative scalar outputs; "
                   "shipped row-gather select; per-stage ops/bytes models "
                   "for the roofline fields; v5e")
    with open("results/attrib_flat_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
