"""Tune the gmax kernel's software-pipeline depth (nsub) at 8M x 96, B=1024.

The unpipelined kernel measures MXU-time + VPU-time ADDED (13.5 ms =
~4.2 ms int8 matmul + ~8.9 ms group-max reduce, results/
attrib_flat_r02.json): the body is one matmul then one reduce, so the two
units never overlap. nsub splits the [block_n, D] tile so chunk s+1's
matmul issues before chunk s's reduce — floor is max(MXU, VPU) ~ 9 ms.

Method (CLAUDE.md benchmarking pitfalls): scalar outputs, pipelined
timing, output verified vs numpy on a slice before any timing is trusted.

Run (real TPU, one client at a time): python scripts/tune_gmax_nsub.py
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
        pallas_flat_groupmax_qmajor,
    )

    n, d, b, group = 8_388_608, 96, 1024, 64
    rng = np.random.default_rng(3)
    sk = jnp.asarray(rng.integers(-127, 128, size=(n, d)).astype(np.int8))
    q = jnp.asarray(rng.integers(-127, 128, size=(b, d)).astype(np.int8))
    jax.block_until_ready(sk)

    # --- verify before timing (fresh-process microbenches can silently not
    # execute): nsub=4 slice vs numpy on 2 queries x first 512 groups
    @jax.jit
    def head(sk, q):
        return pallas_flat_groupmax_qmajor(sk, q, group=group, nsub=4)[
            :2, :512
        ]

    got = np.asarray(head(sk, q))
    ref = (
        np.asarray(sk[: 512 * group]).astype(np.int32)
        @ np.asarray(q[:2]).astype(np.int32).T
    ).reshape(512, group, 2).max(axis=1).T.astype(np.float32)
    assert np.array_equal(got, ref), "kernel output mismatch vs numpy"
    print("verified vs numpy", flush=True)

    out = {}
    sums = {}
    for nsub in (1, 2, 4, 8):
        @jax.jit
        def scal(sk, q, nsub=nsub):
            return pallas_flat_groupmax_qmajor(
                sk, q, group=group, nsub=nsub
            ).sum()

        s0 = scal(sk, q)
        jax.block_until_ready(s0)
        sums[nsub] = float(s0)
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            s0 = scal(sk, q)
        jax.block_until_ready(s0)
        ms = (time.perf_counter() - t0) / reps * 1e3
        out[f"nsub{nsub}_ms"] = round(ms, 2)
        print(f"nsub={nsub}: {ms:.2f} ms", flush=True)
    assert len(set(sums.values())) == 1, f"sum mismatch across nsub: {sums}"
    out["note"] = ("qmajor gmax kernel, 8.4Mx96 int8 B=1024 g64 block_n 8192;"
                   " scalar outputs; verified vs numpy; v5e")
    with open("results/tune_gmax_nsub.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
