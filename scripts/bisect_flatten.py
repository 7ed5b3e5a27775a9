"""Deep-dive: internals of the flatten + row-gather cost model, all with
scalar outputs (transfer-free). Run: python scripts/bisect_flatten.py
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, n=10):
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

    rng = np.random.default_rng(0)
    N, D, B, M = 1_228_800, 100, 64, 32768

    # --- row-gather cost model ---
    corpus_bf = jnp.asarray(rng.normal(size=(N, D)), dtype=jnp.bfloat16)
    corpus16 = jnp.asarray(rng.normal(size=(N, 16)), dtype=jnp.bfloat16)
    corpus_i8 = jnp.asarray(rng.integers(-127, 127, size=(N, D)), dtype=jnp.int8)
    ids_rand = jnp.asarray(rng.integers(0, N, size=(B, M)), dtype=jnp.int32)
    ids_sorted = jnp.sort(ids_rand, axis=1)
    # clustered ids: like real candidates (runs of ~36 contiguous rows)
    starts = rng.integers(0, N - 64, size=(B, M // 32))
    idc = (starts[:, :, None] + np.arange(32)[None, None, :]).reshape(B, M)
    ids_clust = jnp.asarray(idc, dtype=jnp.int32)

    gsum = jax.jit(lambda c, i: jnp.take(c, i, axis=0).astype(jnp.float32).sum())
    print(f"rowgather bf16x100 random : {timeit(gsum, corpus_bf, ids_rand)*1e3:.2f}ms", flush=True)
    print(f"rowgather bf16x100 sorted : {timeit(gsum, corpus_bf, ids_sorted)*1e3:.2f}ms", flush=True)
    print(f"rowgather bf16x100 clust  : {timeit(gsum, corpus_bf, ids_clust)*1e3:.2f}ms", flush=True)
    print(f"rowgather bf16x16  random : {timeit(gsum, corpus16, ids_rand)*1e3:.2f}ms", flush=True)
    print(f"rowgather int8x100 random : {timeit(gsum, corpus_i8, ids_rand)*1e3:.2f}ms", flush=True)

    q = jnp.asarray(rng.normal(size=(B, D)), dtype=jnp.bfloat16)
    sc = jax.jit(lambda c, i, qq: jnp.einsum(
        "bmd,bd->bm", jnp.take(c, i, axis=0), qq,
        preferred_element_type=jnp.float32).sum())
    print(f"coarse(gather+dot) random : {timeit(sc, corpus_bf, ids_rand, q)*1e3:.2f}ms", flush=True)
    print(f"coarse(gather+dot) sorted : {timeit(sc, corpus_bf, ids_sorted, q)*1e3:.2f}ms", flush=True)
    pre = jnp.take(corpus_bf, ids_rand, axis=0)
    dot = jax.jit(lambda v, qq: jnp.einsum(
        "bmd,bd->bm", v, qq, preferred_element_type=jnp.float32).sum())
    print(f"dot only on [64,32768,100]: {timeit(dot, pre, q)*1e3:.2f}ms", flush=True)

    # --- sort cost model ---
    a1 = jnp.asarray(rng.integers(0, 2**30, size=(B, 4876)), dtype=jnp.int32)
    a2 = jnp.asarray(rng.integers(0, 2**30, size=(B, 4876)), dtype=jnp.int32)
    a3 = jnp.asarray(rng.integers(0, 2**30, size=(B, 4876)), dtype=jnp.int32)
    s3 = jax.jit(lambda x, y, z: sum(
        o.sum() for o in jax.lax.sort((x, y, z), dimension=1, num_keys=1)))
    print(f"sort [64,4876] 3ops       : {timeit(s3, a1, a2, a3)*1e3:.2f}ms", flush=True)
    b1 = jnp.asarray(rng.integers(0, 2**30, size=(B, 33548)), dtype=jnp.int32)
    b2 = jnp.asarray(rng.integers(0, 2**30, size=(B, 33548)), dtype=jnp.int32)
    s2 = jax.jit(lambda x, y: sum(
        o.sum() for o in jax.lax.sort((x, y), dimension=1, num_keys=1)))
    print(f"sort [64,33548] 2ops      : {timeit(s2, b1, b2)*1e3:.2f}ms", flush=True)
    c1 = jnp.asarray(rng.integers(0, 2**30, size=(B, 780)), dtype=jnp.int32)
    c2, c3, c4 = (jnp.asarray(rng.integers(0, 2**30, size=(B, 780)), dtype=jnp.int32)
                  for _ in range(3))
    s4 = jax.jit(lambda w, x, y, z: sum(
        o.sum() for o in jax.lax.sort((w, x, y, z), dimension=1, num_keys=2)))
    print(f"sort [64,780] 4ops 2keys  : {timeit(s4, c1, c2, c3, c4)*1e3:.2f}ms", flush=True)

    # elem gather from [30, 1.2M] with sum (flatten's id gather)
    si = jnp.asarray(rng.integers(0, N, size=(30, N)), dtype=jnp.int32)
    tt = jnp.asarray(rng.integers(0, 30, size=(B, M)), dtype=jnp.int32)
    pp = jnp.asarray(rng.integers(0, N, size=(B, M)), dtype=jnp.int32)
    eg = jax.jit(lambda s, t, p: s[t, p].sum())
    print(f"id gather [64,32768] elem : {timeit(eg, si, tt, pp)*1e3:.2f}ms", flush=True)

    # cumsum + repeat expansion costs
    d1 = jnp.asarray(rng.integers(0, 100, size=(B, 4876)), dtype=jnp.int32)
    cs = jax.jit(lambda x: jnp.cumsum(x, axis=1).sum())
    print(f"cumsum [64,4876]          : {timeit(cs, d1)*1e3:.2f}ms", flush=True)
    e1 = jnp.asarray(rng.integers(0, 100, size=(B, 4096)), dtype=jnp.int32)
    rp = jax.jit(lambda x: jnp.repeat(x, 8, axis=1).sum())
    print(f"repeat8 [64,4096]->32768  : {timeit(rp, e1)*1e3:.2f}ms", flush=True)

    # searchsorted merge (lookup core): [30 tables] x 1664 probes into NB
    NB = 4096
    bk = jnp.asarray(
        np.sort(rng.integers(0, 2**31, size=(30, NB)), axis=1), dtype=jnp.uint32)
    qk = jnp.asarray(rng.integers(0, 2**31, size=(30, B * 26)), dtype=jnp.uint32)
    ss = jax.jit(lambda b_, q_: jax.vmap(
        lambda bb, qq: jnp.searchsorted(bb, qq, side="right", method="sort")
    )(b_, q_).sum())
    print(f"searchsorted 30x[4096|1664]: {timeit(ss, bk, qk)*1e3:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
