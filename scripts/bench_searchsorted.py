"""Micro-benchmark: searchsorted strategies for the bucket lookup, on the
current backend. Informs which lowering the query path should use."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, n=10):
    import jax

    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    L, NB, Q = 30, 8192, 256 * 26
    rng = np.random.default_rng(0)
    keys = np.sort(
        rng.integers(0, 2**32, size=(L, NB), dtype=np.uint64).astype(np.uint32), axis=1
    )
    queries = rng.integers(0, 2**32, size=(L, Q), dtype=np.uint64).astype(np.uint32)
    kd, qd = jnp.asarray(keys), jnp.asarray(queries)

    for method in ("scan", "scan_unrolled", "sort", "compare_all"):
        try:
            fn = jax.jit(
                lambda k, q, m=method: jax.vmap(
                    lambda kk, qq: jnp.searchsorted(kk, qq, side="right", method=m)
                )(k, q)
            )
            t = timeit(fn, kd, qd)
            print(f"{method:15s}: {t*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{method:15s}: failed {type(e).__name__}", flush=True)

    # radix-head narrowed binary search
    H_BITS = 12

    def build_head(kk):
        cells = jnp.arange(1 << H_BITS, dtype=jnp.uint32) << (32 - H_BITS)
        return jax.vmap(lambda k: jnp.searchsorted(k, cells, side="left"))(kk)

    heads = jax.jit(build_head)(kd)  # [L, 2^h]

    def radix_search(kk, hh, qq):
        cell = (qq >> (32 - H_BITS)).astype(jnp.int32)
        lo = hh[cell].astype(jnp.int32)
        hi = jnp.where(
            cell + 1 < (1 << H_BITS), hh[jnp.minimum(cell + 1, (1 << H_BITS) - 1)], NB
        ).astype(jnp.int32)

        def body(_, lohi):
            lo, hi = lohi
            mid = (lo + hi) // 2
            v = kk[jnp.clip(mid, 0, NB - 1)]
            go_right = v <= qq
            return (jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid))

        # max extra steps: log2(max cell occupancy); bound generously
        lo, hi = jax.lax.fori_loop(0, 6, body, (lo, hi))
        return lo

    fn = jax.jit(lambda k, h, q: jax.vmap(radix_search)(k, h, q))
    t = timeit(fn, kd, jnp.asarray(heads), qd)
    print(f"{'radix+6step':15s}: {t*1e3:8.2f} ms (correct only if occupancy<=64)",
          flush=True)


if __name__ == "__main__":
    main()
