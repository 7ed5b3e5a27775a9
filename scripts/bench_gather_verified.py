"""Gather formulation shoot-out with VERIFIED execution: every timed
variant first checks a sample of its output against numpy (guards against
the fresh-process silently-not-executing artifact that poisoned earlier
microbenches), in a process warmed by a real fit.
Run: python scripts/bench_gather_verified.py
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

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index import forest as F
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    # small real fit to warm the process into "actually executes" state
    conf = RDFConfig(
        vector_dim=32, table_num=4, permutation_num=1, family_size=40,
        partition_bits=2,
        lsh_table=TableConfig(chain_length=32, bucket_overflow=64),
        query_batch_size=32, max_candidates=1024,
    )
    rng = np.random.default_rng(3)
    xw = rng.normal(size=(100_000, 32)).astype(np.float32)
    xw /= np.linalg.norm(xw, axis=1, keepdims=True)
    fw = F.RDFForest(conf).fit(
        DenseBatch(np.arange(100_000, dtype=np.int32), xw)
    )
    ids_w, _ = fw.query(xw[:32], steps=0, query_ids=np.arange(32))
    assert np.asarray(ids_w)[:, 0].max() >= 0
    print("warm fit+query done", flush=True)

    B, MB, L, N = 64, 4096, 30, 1_204_288
    si_np = rng.integers(0, 2**30, size=(L, N)).astype(np.int32)
    si = jnp.asarray(si_np)
    flat = si.reshape(-1)
    tb_np = rng.integers(0, L, size=(B, MB)).astype(np.int32)
    pb_np = rng.integers(0, N - 8, size=(B, MB)).astype(np.int32)
    tb = jnp.asarray(tb_np)
    pb = jnp.asarray(pb_np)

    expect_blk = si_np[
        tb_np[:, :, None], pb_np[:, :, None] + np.arange(8)[None, None, :]
    ].reshape(B, -1)

    def check(fn, args, expect, name):
        out = np.asarray(fn(*args))
        ok = np.array_equal(out, expect)
        t = timeit(fn, *args)
        per_idx = t / (B * MB) * 1e9
        print(f"{name}: {t*1e3:.2f} ms ({per_idx:.0f} ns/idx) "
              f"{'OK' if ok else 'WRONG RESULTS'}", flush=True)

    # (a) 2D (1,8) slice gather — the current _gather_id_blocks shape
    def g2d(sid, tb, pb):
        idx = jnp.stack([tb, pb], axis=-1)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(2,), collapsed_slice_dims=(0,),
            start_index_map=(0, 1))
        return lax.gather(sid, idx, dn, slice_sizes=(1, 8),
                          mode=lax.GatherScatterMode.CLIP).reshape(B, -1)

    check(jax.jit(g2d), (si, tb, pb), expect_blk, "2d (1,8) slice")

    # (b) flat 1D (8,) slice gather
    def g1d(fl, tb, pb):
        idx = (tb * N + pb)[..., None]
        dn = lax.GatherDimensionNumbers(
            offset_dims=(2,), collapsed_slice_dims=(),
            start_index_map=(0,))
        return lax.gather(fl, idx, dn, slice_sizes=(8,),
                          mode=lax.GatherScatterMode.CLIP).reshape(B, -1)

    check(jax.jit(g1d), (flat, tb, pb), expect_blk, "flat 1d (8,) slice")

    # (c) flat element gather, 8x the indices
    def gel(fl, tb, pb):
        idx = ((tb * N + pb)[:, :, None]
               + jnp.arange(8, dtype=jnp.int32)[None, None, :])
        return fl[idx.reshape(B, -1)]

    check(jax.jit(gel), (flat, tb, pb), expect_blk, "flat element x8")

    # (d) jnp.take along flat with mode clip
    def gtk(fl, tb, pb):
        idx = ((tb * N + pb)[:, :, None]
               + jnp.arange(8, dtype=jnp.int32)[None, None, :])
        return jnp.take(fl, idx.reshape(B, -1), mode="clip")

    check(jax.jit(gtk), (flat, tb, pb), expect_blk, "flat take clip x8")

    # (e) wider blocks: (1, 64) slices, MB/8 of them
    tb8 = tb[:, ::8]
    pb8 = (pb[:, ::8] // 64) * 64
    expect_w = si_np[
        tb_np[:, ::8][:, :, None],
        (pb_np[:, ::8] // 64 * 64)[:, :, None] + np.arange(64)[None, None, :],
    ].reshape(B, -1)

    def g2d64(sid, tb, pb):
        idx = jnp.stack([tb, pb], axis=-1)
        dn = lax.GatherDimensionNumbers(
            offset_dims=(2,), collapsed_slice_dims=(0,),
            start_index_map=(0, 1))
        return lax.gather(sid, idx, dn, slice_sizes=(1, 64),
                          mode=lax.GatherScatterMode.CLIP).reshape(B, -1)

    check(jax.jit(g2d64), (si, tb8, pb8), expect_w, "2d (1,64) slice")


if __name__ == "__main__":
    main()
