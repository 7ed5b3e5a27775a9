"""Verified row-gather cost matrix: dtype × row width × index count.
Full-row gathers (embedding-lookup) from [N, W] arrays — how much does a
non-128-multiple W cost? Run: python scripts/bench_rowgather.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    # warm the process with real verified work first
    a = jnp.arange(1 << 15, dtype=jnp.int32)
    assert int(a.sum()) == (1 << 15) * ((1 << 15) - 1) // 2

    rng = np.random.default_rng(0)
    N = 8_000_000

    def run(dtype, w, m):
        x = jnp.asarray(
            rng.normal(size=(N, w)).astype(np.float32)
        ).astype(dtype)
        idx_np = rng.integers(0, N, size=m).astype(np.int32)
        idx = jnp.asarray(idx_np)

        @jax.jit
        def f(x, idx):
            return x[idx].astype(jnp.float32).sum(axis=-1)

        out = np.asarray(f(x, idx))
        ref = np.asarray(x[idx_np[:64]].astype(jnp.float32).sum(axis=-1))
        np.testing.assert_allclose(out[:64], ref, rtol=1e-3)
        jax.block_until_ready(f(x, idx))
        t0 = time.perf_counter()
        for _ in range(10):
            out = f(x, idx)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        print(f"{np.dtype(dtype).name if dtype != jnp.bfloat16 else 'bf16'}"
              f" w={w} m={m}: {dt*1e3:.2f} ms ({dt/m*1e9:.0f} ns/row)",
              flush=True)
        del x

    for dtype in (jnp.float32, jnp.bfloat16):
        for w in (96, 100, 128):
            run(dtype, w, 131_072)
    run(jnp.float32, 96, 2_097_152)
    run(jnp.float32, 128, 2_097_152)
    run(jnp.bfloat16, 96, 2_097_152)
    run(jnp.bfloat16, 128, 2_097_152)


if __name__ == "__main__":
    main()
