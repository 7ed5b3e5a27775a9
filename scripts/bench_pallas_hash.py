"""Microbench on the REAL TPU: Pallas fused angle-hash kernel vs the XLA
hash_dense path at the bench shapes (VERDICT r1 item 3 — wire it in or
delete it). Run: python scripts/bench_pallas_hash.py
"""

import json
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

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.models.families import generate_model
    from similaritysearchbyrdf_tpu.ops.hashing import hash_dense
    from similaritysearchbyrdf_tpu.ops.pallas.hash_kernel import (
        make_pallas_hash_fn,
    )

    conf = RDFConfig(
        vector_dim=100, table_num=10, permutation_num=3, family_size=100,
        lsh_table=TableConfig(chain_length=32),
    )
    model = generate_model(conf)
    rng = np.random.default_rng(0)
    out = {}
    for b in (256, 2048, 8192):
        x = jnp.asarray(rng.normal(size=(b, 100)).astype(np.float32))
        xla_fn = jax.jit(lambda xx: hash_dense(model, xx))
        t_xla = timeit(xla_fn, x)
        pl_fn = make_pallas_hash_fn(model, block_b=min(256, b))
        t_pl = timeit(pl_fn, x)
        same = bool(jnp.all(xla_fn(x) == pl_fn(x)))
        out[f"b{b}"] = dict(xla_ms=round(t_xla * 1e3, 3),
                            pallas_ms=round(t_pl * 1e3, 3),
                            equal=same)
        print(f"B={b}: xla={t_xla*1e3:.3f}ms pallas={t_pl*1e3:.3f}ms "
              f"equal={same}", flush=True)
    print("PALLAS " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
