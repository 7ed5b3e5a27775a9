"""Microbench: does XLA's (1,8)-slice gather cost scale with TABLE SIZE?

The 8M bisect showed the candidate-id block gather at ~642 ms/chunk vs
~62 ms at 1.2M with the SAME index count — per-index cost should be
size-independent if the gather engine is truly random-access.
Run: python scripts/bench_gather_depth.py
"""

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
    from jax import lax

    rng = np.random.default_rng(0)
    B, MB = 64, 4096

    def block_gather(si, tb, pb):
        idx = jnp.stack([tb, pb], axis=-1)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(2,), collapsed_slice_dims=(0,),
            start_index_map=(0, 1))
        out = lax.gather(si, idx, dn, slice_sizes=(1, 8),
                         mode=lax.GatherScatterMode.CLIP)
        return out.reshape(tb.shape[0], -1).sum()

    f = jax.jit(block_gather)
    for n in (1_228_800, 4_000_000, 8_000_000):
        si = jnp.asarray(rng.integers(0, n, size=(30, n)), dtype=jnp.int32)
        tb = jnp.asarray(rng.integers(0, 30, size=(B, MB)), dtype=jnp.int32)
        pb = jnp.asarray(rng.integers(0, n - 8, size=(B, MB)), dtype=jnp.int32)
        t = timeit(f, si, tb, pb)
        print(f"block-8 gather from [30,{n}]: {t*1e3:.2f} ms "
              f"({B*MB/t/1e6:.1f} M idx/s)", flush=True)
        del si

    # single-table variant: does collapsing the table dim change the regime?
    def block_gather_1d(si, pb):
        idx = pb[..., None]
        dn = lax.GatherDimensionNumbers(
            offset_dims=(2,), collapsed_slice_dims=(),
            start_index_map=(0,))
        out = lax.gather(si, idx, dn, slice_sizes=(8,),
                         mode=lax.GatherScatterMode.CLIP)
        return out.sum()

    g = jax.jit(block_gather_1d)
    for n in (1_228_800, 8_000_000):
        si = jnp.asarray(rng.integers(0, n, size=(30 * n,)), dtype=jnp.int32)
        pb = jnp.asarray(
            rng.integers(0, 30 * n - 8, size=(B, MB)), dtype=jnp.int32)
        t = timeit(g, si, pb)
        print(f"block-8 gather from flat [{30*n}]: {t*1e3:.2f} ms "
              f"({B*MB/t/1e6:.1f} M idx/s)", flush=True)
        del si


if __name__ == "__main__":
    main()
