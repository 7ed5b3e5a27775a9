"""Group-select stage shootout at 8M×96, B=1024 (the grouped flat wall).

attrib_flat_r03.json: the exact two-level select costs 35 ms of the 58 ms
pipeline — all of it the rg*sg=1536-element-per-query child gather at ~16
ns/element (CLAUDE.md cost model). Variants measured here, all as
CUMULATIVE scalar-output programs on top of the same gmax kernel
(block_b=512, the sweep's winner), verified against a host argsort of the
device's own gmax rows before timing:

  exact2_flat_sgX  two-level select, flat element gather of children
                   (the shipped r02 code path)
  exact2_row_sgX   two-level select, row-gather of [B, NSG, sg] supergroup
                   rows (minor dim fully spanned)
  approx           flat approx_max_k over [B, NG] (the r01 code path)
  topk             flat exact lax.top_k over [B, NG]

Run (real TPU, one client at a time):  python scripts/tune_select_r03.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N, D, NQ = 8_000_000, 96, 1024
GROUP, RG = 64, 24
BLOCK_B = 512


def main():
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.flat import _pad_lanes
    from similaritysearchbyrdf_tpu.ops.pallas.flat_groupmax import (
        pallas_flat_groupmax_qmajor,
    )

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(50_000, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 50_000, N)] + 0.05 * rng.normal(size=(N, D))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)

    # Quantize ON HOST (matches build_flat_sketch's global-amax law) and
    # ship ONLY the padded int8 sketch: the f32 device corpus OOM'd when a
    # prior client's HBM hadn't been released yet (batch3 log, 13:08).
    amax = float(np.max(np.abs(x)))
    scale = 127.0 / max(amax, 1e-30)
    npad = int(np.ceil(N / 8192)) * 8192
    DP = int(np.ceil(D / 128)) * 128
    sk_host = np.zeros((npad, DP), np.int8)
    sk_host[:N, :D] = np.clip(np.round(x * scale), -127, 127).astype(np.int8)
    del centers
    skp = jnp.asarray(sk_host)
    del sk_host
    qd = jnp.asarray(x[:NQ])
    ng = npad // GROUP

    def quant(q):
        qs = 127.0 / jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True),
                                 1e-30)
        return jnp.clip(jnp.round(q * qs), -127, 127).astype(jnp.int8)

    def gmax_of(sk, q):
        q_lp = _pad_lanes(quant(q))[:, :DP]
        gm = pallas_flat_groupmax_qmajor(
            sk, q_lp, group=GROUP, block_b=BLOCK_B, block_n=8192)
        g_live = (jnp.arange(ng, dtype=jnp.int32) * GROUP) < N
        return jnp.where(g_live[None, :], gm, -jnp.inf)

    def select_fn(variant, sg=64):
        # the sketch is a jit ARGUMENT: closing over it embeds a 1 GB HLO
        # constant — the remote compile request then dies with HTTP 413
        # (batch5 log, 14:10)
        def run(sk, q):
            gmax = gmax_of(sk, q)
            b = gmax.shape[0]
            if variant == "gmax":
                return gmax.sum(), gmax[:4]
            if variant == "approx":
                _, gidx = jax.lax.approx_max_k(gmax, RG, recall_target=0.998)
            elif variant == "topk":
                _, gidx = jax.lax.top_k(gmax, RG)
            else:
                nsg = ng // sg
                g3 = gmax.reshape(b, nsg, sg)
                _, sgi = jax.lax.top_k(g3.max(axis=-1), RG)
                child = (sgi[:, :, None] * sg
                         + jnp.arange(sg, dtype=jnp.int32)).reshape(b, RG * sg)
                if variant == "exact2_flat":
                    cg = jnp.take_along_axis(gmax, child, axis=1)
                else:  # exact2_row
                    cg = jnp.take_along_axis(
                        g3, sgi[:, :, None], axis=1).reshape(b, RG * sg)
                _, ci = jax.lax.top_k(cg, RG)
                gidx = jnp.take_along_axis(child, ci, axis=1)
            return gidx.astype(jnp.float32).sum(), gidx[:4]

        jrun = jax.jit(run)
        return lambda q: jrun(skp, q)

    out = {}
    # ground truth for the verify: the device's own gmax rows, argsorted
    _, gm4 = select_fn("gmax")(qd)
    gm4 = np.asarray(gm4)
    true_sets = [set(np.argsort(-gm4[i])[:RG].tolist()) for i in range(4)]
    true_sums = [float(np.sort(gm4[i])[-RG:].sum()) for i in range(4)]

    def timeit(label, fn, exact: bool, verify: bool = True):
        s, g4 = fn(qd)
        jax.block_until_ready(s)
        if verify:
            g4 = np.asarray(g4)
            ok, overlap = True, 0.0
            for i in range(4):
                sel = set(g4[i].tolist())
                overlap += len(sel & true_sets[i]) / RG / 4
                # tie-tolerant exactness: the selected groups' max-sum must
                # equal the true top-RG sum
                if abs(float(gm4[i][g4[i]].sum()) - true_sums[i]) > 1e-3 * max(
                        abs(true_sums[i]), 1.0):
                    ok = False
            if exact and not ok:
                print(f"{label}: VERIFY FAILED (overlap {overlap:.3f})",
                      flush=True)
                out[label + "_verify"] = "FAILED"
                return
            out[label + "_overlap"] = round(overlap, 4)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            s, _ = fn(qd)
        jax.block_until_ready(s)
        dt = (time.perf_counter() - t0) / reps
        out[label + "_ms"] = round(dt * 1e3, 2)
        print(f"{label}: {dt*1e3:.2f} ms", flush=True)

    timeit("gmax", select_fn("gmax"), exact=False, verify=False)
    for sg in (8, 16, 32, 64):
        timeit(f"exact2_row_sg{sg}", select_fn("exact2_row", sg), exact=True)
    timeit("exact2_flat_sg64", select_fn("exact2_flat", 64), exact=True)
    timeit("approx", select_fn("approx"), exact=False)
    timeit("topk", select_fn("topk"), exact=True)

    out["note"] = (f"cumulative gmax+select, {N}x{D} int8 B={NQ} "
                   f"group={GROUP} rg={RG} block_b={BLOCK_B}; scalar outputs;"
                   " select sets verified vs host argsort of device gmax; v5e")
    with open("results/tune_select_r03.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
