"""A/B: query-major group-max kernel vs transpose path, on TPU at 8M x 128.

tune_flat_grouped with the qmajor kernel measured 17,645 qps at the same
settings where results/flat.json (old kernel) recorded 24,888 — this isolates
whether the in-kernel transpose regressed the gmax+select stages or the gap
is process-state noise. Device-generated data (no tunnel upload), scalar
outputs, pipelined timing, device-side verification vs an XLA reference.

Run: timeout 3000 python scripts/ab_qmajor.py > /tmp/ab_qmajor.log 2>&1
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.pallas.flat_groupmax import (
        pallas_flat_groupmax, pallas_flat_groupmax_qmajor,
    )

    N, D, B, G, RG = 8_388_608, 128, 1024, 64, 24
    sk = jax.random.randint(jax.random.PRNGKey(0), (N, D), -127, 128,
                            dtype=jnp.int8)
    q = jax.random.randint(jax.random.PRNGKey(1), (B, D), -127, 128,
                           dtype=jnp.int8)
    jax.block_until_ready((sk, q))

    @jax.jit
    def gmax_old(sk, q):
        m = pallas_flat_groupmax(sk, q, group=G, block_b=128, block_n=8192)
        return m.sum()

    @jax.jit
    def gmax_new(sk, q):
        m = pallas_flat_groupmax_qmajor(sk, q, group=G, block_b=128,
                                        block_n=8192)
        return m.sum()

    @jax.jit
    def sel_old(sk, q):
        m = pallas_flat_groupmax(sk, q, group=G, block_b=128, block_n=8192).T
        _, gidx = jax.lax.approx_max_k(m, RG, recall_target=0.998)
        return gidx.sum()

    @jax.jit
    def sel_new(sk, q):
        m = pallas_flat_groupmax_qmajor(sk, q, group=G, block_b=128,
                                        block_n=8192)
        _, gidx = jax.lax.approx_max_k(m, RG, recall_target=0.998)
        return gidx.sum()

    # --- verification: both kernels agree, and match XLA on a row window ---
    m_old = pallas_flat_groupmax(sk[:16384], q, group=G, block_b=128,
                                 block_n=8192).T
    m_new = pallas_flat_groupmax_qmajor(sk[:16384], q, group=G, block_b=128,
                                        block_n=8192)
    ref = jnp.einsum("bd,nd->bn", q.astype(jnp.int32),
                     sk[:16384].astype(jnp.int32)).astype(jnp.float32)
    ref = ref.reshape(B, 16384 // G, G).max(axis=-1)
    ok_xla = bool(jnp.array_equal(m_new, ref))
    ok_ab = bool(jnp.array_equal(m_old, m_new))
    print(f"verify: qmajor==old {ok_ab}, qmajor==xla {ok_xla}", flush=True)
    assert ok_ab and ok_xla

    def timed(label, fn):
        fn(sk, q).block_until_ready()          # warm: exact timed shapes
        t0 = time.perf_counter()
        outs = [fn(sk, q) for _ in range(10)]  # pipelined
        jax.block_until_ready(outs)
        dt = (time.perf_counter() - t0) / 10 * 1e3
        print(f"{label}: {dt:.2f} ms", flush=True)
        return dt

    out = {}
    out["gmax_old_ms"] = timed("gmax_old", gmax_old)
    out["gmax_qmajor_ms"] = timed("gmax_qmajor", gmax_new)
    out["select_old_ms"] = timed("select_old (T + approx_max_k)", sel_old)
    out["select_qmajor_ms"] = timed("select_qmajor (approx_max_k)", sel_new)
    out["note"] = "8.4Mx128 int8 B=1024 g64 rg24; scalar outputs; v5e"
    with open("results/ab_qmajor.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
