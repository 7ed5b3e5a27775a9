"""Microbench: random-gather cost vs slice size on the real TPU — does
gathering 8 contiguous int32 per index amortize the per-gather cost?
Run: python scripts/bench_gather_shapes.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, n=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    L, N = 30, 1_228_800
    sorted_ids = jnp.asarray(rng.integers(0, N, size=(L, N)), dtype=jnp.int32)
    B, M = 64, 32768

    # baseline: per-element gather [B, M]
    tabs = jnp.asarray(rng.integers(0, L, size=(B, M)), dtype=jnp.int32)
    pos = jnp.asarray(rng.integers(0, N, size=(B, M)), dtype=jnp.int32)
    f1 = jax.jit(lambda si, t, p: si[t, p])
    print(f"elem gather [64,32768]: {timeit(f1, sorted_ids, tabs, pos)*1e3:.2f}ms",
          flush=True)

    # block gather: [B, M/8] indices, slices of (1, 8)
    MB = M // 8
    tab_b = jnp.asarray(rng.integers(0, L, size=(B, MB)), dtype=jnp.int32)
    pos_b = jnp.asarray(rng.integers(0, N - 8, size=(B, MB)), dtype=jnp.int32)

    def block_gather(si, tb, pb):
        idx = jnp.stack([tb, pb], axis=-1)            # [B, MB, 2]
        dn = lax.GatherDimensionNumbers(
            offset_dims=(2,), collapsed_slice_dims=(0,),
            start_index_map=(0, 1))
        out = lax.gather(si, idx, dn, slice_sizes=(1, 8),
                         mode=lax.GatherScatterMode.CLIP)
        return out.reshape(tb.shape[0], -1)           # [B, M]

    f2 = jax.jit(block_gather)
    print(f"block-8 gather [64,4096x8]: {timeit(f2, sorted_ids, tab_b, pos_b)*1e3:.2f}ms",
          flush=True)

    # block-16 for comparison
    MB16 = M // 16
    tab_c = jnp.asarray(rng.integers(0, L, size=(B, MB16)), dtype=jnp.int32)
    pos_c = jnp.asarray(rng.integers(0, N - 16, size=(B, MB16)), dtype=jnp.int32)

    def block16(si, tb, pb):
        idx = jnp.stack([tb, pb], axis=-1)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(2,), collapsed_slice_dims=(0,),
            start_index_map=(0, 1))
        return lax.gather(si, idx, dn, slice_sizes=(1, 16),
                          mode=lax.GatherScatterMode.CLIP).reshape(tb.shape[0], -1)

    f3 = jax.jit(block16)
    print(f"block-16 gather: {timeit(f3, sorted_ids, tab_c, pos_c)*1e3:.2f}ms",
          flush=True)

    # corpus row gathers: bf16 [N, 100] rows vs int8
    corpus_bf = jnp.asarray(rng.normal(size=(N, 100)), dtype=jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, N, size=(B, M)), dtype=jnp.int32)
    g_bf = jax.jit(lambda c, i: jnp.take(c, i, axis=0))
    print(f"row gather bf16 [64,32768,100]: {timeit(g_bf, corpus_bf, ids, n=5)*1e3:.2f}ms",
          flush=True)
    corpus_i8 = jnp.asarray(rng.integers(-127, 127, size=(N, 100)), dtype=jnp.int8)
    g_i8 = jax.jit(lambda c, i: jnp.take(c, i, axis=0))
    print(f"row gather int8 [64,32768,100]: {timeit(g_i8, corpus_i8, ids, n=5)*1e3:.2f}ms",
          flush=True)
    # fused gather+dot (what score_candidates does)
    q = jnp.asarray(rng.normal(size=(B, 100)), dtype=jnp.bfloat16)
    def score(c, i, qq):
        v = jnp.take(c, i, axis=0)
        return jnp.einsum("bmd,bd->bm", v, qq, preferred_element_type=jnp.float32)
    f4 = jax.jit(score)
    print(f"gather+dot bf16: {timeit(f4, corpus_bf, ids, q, n=5)*1e3:.2f}ms",
          flush=True)
    # gather fewer, wider: 8 rows per index contiguous (hypothetical layout)
    ids_b = jnp.asarray(rng.integers(0, N // 8 - 1, size=(B, MB)), dtype=jnp.int32)
    corpus_blk = corpus_bf.reshape(N // 8, 8 * 100)
    g_blk = jax.jit(lambda c, i: jnp.take(c, i, axis=0))
    print(f"row gather bf16 blocks of 8 rows [64,4096,800]: {timeit(g_blk, corpus_blk, ids_b, n=5)*1e3:.2f}ms",
          flush=True)


if __name__ == "__main__":
    main()
