"""Standalone aligned-window kernel tuner at Deep-8M shapes: is the coarse
window stage per-DMA-issue-bound or per-grid-step-bound? Sweeps grp (windows
per grid step) and win on a synthetic lane-packed tier [4, 8.4M, 128] int8
with realistic random window starts. Scalar outputs, verified vs an XLA
reference on a slice, pipelined timing.

Run: timeout 3000 python scripts/tune_coarse_kernel.py > /tmp/tune_ck.log 2>&1
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.pallas.coarse_gather import (
        pallas_coarse_scores_aligned,
    )

    LG, CAP, LANES = 4, 8_400_000, 128  # CAP % 8 == 0
    B, MB, WIN = 64, 1024, 64                     # m_cap 65536, win 64
    CS, G = 16, 8                                 # cd=16 lane packing
    # chunked generation: one-shot randint materializes an i32 intermediate
    # (17 GB at this shape — OOMs the chip)
    chunks = []
    for i in range(8):
        k = jax.random.PRNGKey(i)
        c = jax.random.randint(k, (LG, CAP // 8, LANES), -127, 128,
                               dtype=jnp.int8)
        c.block_until_ready()
        chunks.append(c)
    cbt = jnp.concatenate(chunks, axis=1)
    del chunks
    # B*G segment-placed query rows (the packed call layout)
    q = jax.random.normal(jax.random.PRNGKey(1), (B * G, LANES),
                          dtype=jnp.float32).astype(jnp.bfloat16)
    rng = np.random.default_rng(2)
    lg_b = jnp.asarray(rng.integers(0, LG, (B, MB)), jnp.int32)
    seg_b = jnp.asarray(rng.integers(0, G, (B, MB)), jnp.int32)
    blk = jnp.asarray(
        (rng.integers(0, (CAP - WIN) // 8, (B, MB)) * 8), jnp.int32
    )
    live = jnp.asarray(rng.random((B, MB)) < 0.85)
    jax.block_until_ready((cbt, q, lg_b, seg_b, blk, live))

    def run(grp, win):
        @jax.jit
        def f(cbt, q, lg_b, blk, live, seg_b):
            s = pallas_coarse_scores_aligned(
                cbt, q, lg_b, blk, win, grp=grp, live=live,
                groups=G, seg_b=seg_b,
            )
            # dead windows skip their DMA and leave STALE scratch rows (the
            # query path masks them by position); mask before reducing or
            # the checksum depends on scheduling
            return jnp.where(live[:, :, None], s, 0.0).sum()
        return f

    # verify grp variants agree (same math, different scheduling)
    ref = None
    out = {}
    for grp in (64, 128, 256, 512):
        f = run(grp, WIN)
        v = f(cbt, q, lg_b, blk, live, seg_b)
        v.block_until_ready()
        if ref is None:
            ref = float(v)
        else:
            assert abs(float(v) - ref) / (abs(ref) + 1e-9) < 1e-3, (grp, v, ref)
        t0 = time.perf_counter()
        outs = [f(cbt, q, lg_b, blk, live, seg_b) for _ in range(10)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / 10 * 1e3
        per_win = dt * 1e3 / (B * MB)
        print(f"grp{grp}_win{WIN}: {dt:.2f} ms ({per_win:.3f} us/window)",
              flush=True)
        out[f"grp{grp}_win{WIN}_ms"] = round(dt, 2)

    # win=128 at half MB (same bytes, half the DMAs)
    blk2 = jnp.asarray(
        (rng.integers(0, (CAP - 128) // 8, (B, MB // 2)) * 8), jnp.int32
    )
    lg2 = lg_b[:, : MB // 2]
    seg2 = seg_b[:, : MB // 2]
    live2 = live[:, : MB // 2]
    for grp in (128, 256):
        @jax.jit
        def f2(cbt, q, lg2, blk2, live2, seg2, grp=grp):
            s = pallas_coarse_scores_aligned(
                cbt, q, lg2, blk2, 128, grp=grp, live=live2,
                groups=G, seg_b=seg2,
            )
            return jnp.where(live2[:, :, None], s, 0.0).sum()
        v = f2(cbt, q, lg2, blk2, live2, seg2)
        v.block_until_ready()
        t0 = time.perf_counter()
        outs = [f2(cbt, q, lg2, blk2, live2, seg2) for _ in range(10)]
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / 10 * 1e3
        print(f"grp{grp}_win128: {dt:.2f} ms "
              f"({dt*1e3/(B*MB//2):.3f} us/window)", flush=True)
        out[f"grp{grp}_win128_ms"] = round(dt, 2)

    out["note"] = ("synthetic [4, 8.4M, 128] int8 packed tier, B=64, "
                   "m_cap 65536; scalar outputs; v5e")
    with open("results/tune_coarse_kernel.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
