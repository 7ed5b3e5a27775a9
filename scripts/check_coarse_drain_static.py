"""On-TPU exactness + timing A/B of the static-drain coarse kernel.

The static drain replaces grp per-copy waits with ONE whole-scratch wait —
sound iff Mosaic DMA-semaphore accounting is size-based (the sum of grp
identical win-row copies equals one grp*win-row wait). Pure per-descriptor
counting would return early and produce WRONG live-window scores, which
this script detects by exact comparison against the per-copy kernel on
random data at Deep-like shapes. Also times both (pipelined dispatch,
scalar-output sum — CLAUDE.md benchmarking pitfalls).

Run (TPU idle): timeout 1800 python scripts/check_coarse_drain_static.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.pallas import coarse_gather as cg

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(3)
    g, cs = 8, 16                       # Deep operating point: cd=16 packed
    lanes = g * cs
    lg, caprows = 2, 1_000_000
    b, mb_cap, win = 64, 512, 512
    cbt = rng.integers(-100, 100, size=(lg, caprows, lanes)).astype(np.int8)
    q = rng.normal(size=(b, cs)).astype(np.float32)
    lg_b = rng.integers(0, lg, size=(b, mb_cap)).astype(np.int32)
    seg_b = rng.integers(0, g, size=(b, mb_cap)).astype(np.int32)
    bs = (rng.integers(0, (caprows - win) // 8, size=(b, mb_cap)) * 8).astype(
        np.int32
    )
    # live prefix per query (the flatten's shape), ~60% fill
    fill = rng.integers(mb_cap // 3, mb_cap, size=(b,))
    live = (np.arange(mb_cap)[None, :] < fill[:, None])
    q_seg = np.stack(
        [np.pad(q, ((0, 0), (s * cs, (g - 1 - s) * cs))) for s in range(g)],
        axis=1,
    ).reshape(b * g, lanes)

    args = (jnp.asarray(cbt), jnp.asarray(q_seg), jnp.asarray(lg_b),
            jnp.asarray(bs))
    kw = dict(live=jnp.asarray(live), groups=g, seg_b=jnp.asarray(seg_b))

    ref = np.asarray(cg.pallas_coarse_scores_aligned(*args, win, **kw))
    got = np.asarray(
        cg.pallas_coarse_scores_aligned(*args, win, drain="static", **kw)
    )
    ok = np.array_equal(got[live], ref[live])
    print("live-window scores exact-equal:", ok, flush=True)
    # verify against numpy too (catches both kernels being wrong the same way)
    q_seg_bf = np.asarray(
        jnp.asarray(q_seg).astype(jnp.bfloat16).astype(jnp.float32)
    )   # the kernel rounds query rows to bf16; match it in the reference
    sample = rng.integers(0, b, 64), rng.integers(0, mb_cap, 64)
    for i, m in zip(*sample):
        if not live[i, m]:
            continue
        rows = cbt[lg_b[i, m], bs[i, m]: bs[i, m] + win].astype(np.float32)
        expect = rows @ q_seg_bf[i * g + seg_b[i, m]]
        np.testing.assert_allclose(ref[i, m], expect, rtol=1e-3, atol=1e-2)
    print("numpy spot-check OK", flush=True)
    assert ok, "static drain returned different live scores — NOT size-based"

    def timed(drain):
        f = jax.jit(
            lambda *a: cg.pallas_coarse_scores_aligned(
                *a, win, drain=drain, **kw
            ).sum()
        )
        out = f(*args)
        jax.block_until_ready(out)
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1e3

    t_per_copy = timed("per_copy")
    t_static = timed("static")
    res = {
        "shapes": f"b{b} mb{mb_cap} win{win} lanes{lanes} caprows{caprows}",
        "exact_equal": bool(ok),
        "per_copy_ms": round(t_per_copy, 2),
        "static_ms": round(t_static, 2),
        "us_per_window_per_copy": round(t_per_copy * 1e3 / (b * mb_cap), 3),
        "us_per_window_static": round(t_static * 1e3 / (b * mb_cap), 3),
    }
    with open("results/check_coarse_drain_static.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
