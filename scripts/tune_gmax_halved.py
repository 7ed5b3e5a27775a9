"""Halved (strided-layout) gmax reduce vs the reshape-reduce, 8M×96 B=1024.

attrib_flat_r03 + tune_gmax_nsub: the gmax stage costs ~11 ms at block_b
512 — ~5.6 ms of int8 MXU floor plus ~5-9 ms of VPU group-max whose
reshape-reduce pays cross-sublane relayouts. The halved mode feeds the
kernel a fit-time strided sketch copy (ops/flat.stride_for_halved_gmax) so
the reduce is 6 contiguous half-tile maxima. Sweeps block_b × nsub for
both layouts; cumulative scalar outputs; first rows verified vs numpy
group-max before timing (CLAUDE.md pitfall: fresh-process microbenches can
silently not execute).

Run (real TPU, one client at a time):  python scripts/tune_gmax_halved.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N, D, NQ = 8_000_000, 96, 1024
GROUP, BLOCK_N = 64, 8192


def main():
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.flat import (
        _pad_lanes, stride_for_halved_gmax,
    )
    from similaritysearchbyrdf_tpu.ops.pallas.flat_groupmax import (
        pallas_flat_groupmax_qmajor,
    )

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(50_000, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 50_000, N)] + 0.05 * rng.normal(size=(N, D))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)
    del centers

    amax = float(np.max(np.abs(x)))
    scale = 127.0 / max(amax, 1e-30)
    npad = int(np.ceil(N / BLOCK_N)) * BLOCK_N
    DP = int(np.ceil(D / 128)) * 128
    sk_host = np.zeros((npad, DP), np.int8)
    sk_host[:N, :D] = np.clip(np.round(x * scale), -127, 127).astype(np.int8)
    skp = jnp.asarray(sk_host)
    sk_strided = jax.jit(stride_for_halved_gmax)(skp)
    jax.block_until_ready(sk_strided)

    q = x[:NQ]
    qs = 127.0 / np.maximum(np.max(np.abs(q), axis=1, keepdims=True), 1e-30)
    q_host = np.clip(np.round(q * qs), -127, 127).astype(np.int8)
    qd = jnp.asarray(_pad_lanes(jnp.asarray(q_host))[:, :DP])

    # numpy reference gmax for the first 2 queries over the first 4096
    # groups (slice the sketch to the live :D columns — its lane padding is
    # zeros and q_host is unpadded [., D])
    ref = (sk_host[: 4096 * GROUP, :D].astype(np.int32)
           @ q_host[:2].astype(np.int32).T)
    ref = ref.reshape(4096, GROUP, 2).max(axis=1).T.astype(np.float32)
    del sk_host, x

    out = {}

    def run_fn(halved, bb, nsub):
        sk_in = sk_strided if halved else skp

        @jax.jit
        def g(sk_arg, qq):
            # sketch passed as an ARGUMENT: closing over a large device
            # array embeds it as an HLO constant and stalls remote
            # compiles for 30+ min (CLAUDE.md)
            gm = pallas_flat_groupmax_qmajor(
                sk_arg, qq, group=GROUP, block_b=bb, block_n=BLOCK_N,
                nsub=nsub, halved=halved)
            return gm.sum(), gm[:2, :4096]

        return lambda qq: g(sk_in, qq)

    verified = set()
    for halved in (False, True):
        for bb in (256, 512, 1024):
            for nsub in ((1,) if not halved else (1, 2, 4)):
                label = (f"{'halved' if halved else 'plain'}"
                         f"_bb{bb}_nsub{nsub}")
                f = run_fn(halved, bb, nsub)
                s, g2 = f(qd)
                jax.block_until_ready(s)
                key = ("v", halved)
                if key not in verified:
                    g2 = np.asarray(g2)
                    if not np.array_equal(g2, ref):
                        print(f"{label}: VERIFY FAILED "
                              f"(maxdiff {np.abs(g2-ref).max()})", flush=True)
                        out[label + "_verify"] = "FAILED"
                        continue
                    verified.add(key)
                t0 = time.perf_counter()
                reps = 5
                for _ in range(reps):
                    s, _ = f(qd)
                jax.block_until_ready(s)
                dt = (time.perf_counter() - t0) / reps * 1e3
                out[label + "_ms"] = round(dt, 2)
                print(f"{label}: {dt:.2f} ms", flush=True)

    out["note"] = (f"gmax only, {N}x{D} int8 B={NQ} group={GROUP} "
                   f"block_n={BLOCK_N}; scalar outputs; verified vs numpy; "
                   "v5e")
    with open("results/tune_gmax_halved.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
