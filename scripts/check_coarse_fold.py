"""On-TPU validation of the folded groupmax kernel (ops/pallas/coarse_fold).

1. BIT-PARITY: pallas_coarse_rowmax vs the XLA rowmax_fallback on random
   folded tiers / window sets (integer math — must be exactly equal on
   live rows; dead rows are caller-masked so only live rows compare).
2. END-TO-END: a 200k clustered corpus through coarse_layout="folded" vs
   "lane" at equal refine — recall within noise, and a first timing signal.

Run (one TPU client at a time):
    timeout 3600 python scripts/check_coarse_fold.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def check_parity():
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.ops.pallas.coarse_fold import (
        pallas_coarse_rowmax,
        rowmax_fallback,
    )

    rng = np.random.default_rng(3)
    for (l_n, capf, cs, b, mb, win, gsl) in [
        (4, 4096, 16, 8, 16, 512, 64),
        (10, 8192, 16, 16, 64, 2048, 64),
        (3, 4096, 32, 8, 32, 1024, 64),
        # finer selection groups (batch-43 gsl sweep): rpg 2 and 1
        (4, 4096, 16, 8, 16, 1024, 16),
        (4, 4096, 16, 8, 16, 1024, 8),
        # cs=32 (fold=4) at fine gsl: rpg=2 with 4-slot rows (batch-45
        # coarse-fidelity sweep)
        (4, 4096, 32, 8, 16, 1024, 8),
    ]:
        fold = 128 // cs
        lanes = 128
        wpr = win // fold
        rpg = gsl // fold
        mshift = gsl.bit_length() - 1
        folded = rng.integers(-127, 128, (l_n, capf, lanes), dtype=np.int8)
        qi8 = rng.integers(-127, 128, (b, cs), dtype=np.int8)
        qmat = np.zeros((b, fold, lanes), np.int8)
        for s in range(fold):
            qmat[:, s, s * cs:(s + 1) * cs] = qi8
        table = rng.integers(0, l_n, (b, mb)).astype(np.int32)
        # 8-row-aligned live starts + a sprinkle of dead windows
        rs = (rng.integers(0, max(1, (capf - wpr) // 8), (b, mb)) * 8).astype(
            np.int32
        )
        dead = rng.random((b, mb)) < 0.3
        rs = np.where(dead, -1, rs)
        args = (jnp.asarray(folded), jnp.asarray(qmat), jnp.asarray(table),
                jnp.asarray(rs))
        got = np.asarray(
            pallas_coarse_rowmax(*args, wpr=wpr, rpg=rpg, mshift=mshift)
        ).reshape(b, mb, wpr)
        want = np.asarray(
            rowmax_fallback(*args, wpr=wpr, rpg=rpg, mshift=mshift)
        ).reshape(b, mb, wpr)
        live = ~dead
        ok = (got[live] == want[live]).all()
        print(f"parity l={l_n} capf={capf} cs={cs} b={b} mb={mb} win={win} "
              f"gsl={gsl}: {'OK' if ok else 'MISMATCH'}", flush=True)
        if not ok:
            bad = np.argwhere(got != want)
            bad = [tuple(v) for v in bad if live[v[0], v[1]]][:5]
            print("  first live mismatches:", bad)
            for v in bad[:2]:
                print("   got", got[v], "want", want[v])
            raise SystemExit(1)


def check_e2e():
    from similaritysearchbyrdf_tpu import DenseBatch, RDFConfig, RDFForest
    from similaritysearchbyrdf_tpu.config import TableConfig

    rng = np.random.default_rng(5)
    n, d, nq = 200_000, 96, 256
    centers = rng.normal(size=(2000, d))
    x = (centers[rng.integers(0, 2000, n)] + 0.2 * rng.normal(size=(n, d)))
    x = (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)
    q = x[:nq]
    gt = np.argsort(-(q @ x.T), axis=1)[:, :10]
    gts = [set(map(int, gt[i])) for i in range(nq)]

    def run(layout, conf_kw=None, **kw):
        conf = RDFConfig(
            vector_dim=d, table_num=10, permutation_num=3, family_size=100,
            partition_bits=3,
            lsh_table=TableConfig(chain_length=32, bucket_overflow=500),
            query_batch_size=64, max_candidates=65536, top_k=10,
            coarse_dim=16, coarse_dtype="int8", coarse_refine=4096,
            coarse_layout=layout, **(conf_kw or {}),
        )
        f = RDFForest(conf).fit(DenseBatch(np.arange(n, dtype=np.int32), x))
        qkw = dict(steps=1, query_ids=np.arange(nq), probe_mode="margin",
                   probe_budget=16, **kw)
        f.query(q, **qkw)                     # compile + warm
        t0 = time.perf_counter()
        got, _ = f.query(q, **qkw)
        dt = time.perf_counter() - t0
        rec = sum(
            len(gts[i] & set(int(v) for v in got[i] if v >= 0))
            for i in range(nq)
        ) / (nq * 10)
        print(f"{layout} {kw}: {nq/dt:.0f} qps recall {rec:.4f}", flush=True)
        return rec

    # equal DESCRIPTOR budget (128 windows/query): folded covers 4x the
    # candidates at the same per-query DMA bytes
    r_lane = run("lane", coarse_window=512, m_cap=65536)
    r_fold = run("folded", coarse_window=2048, m_cap=262144)
    assert r_fold >= r_lane - 0.03, (r_fold, r_lane)
    # fine selection granularity: same refine spread over 8x more groups.
    # NOTE gsl's sign is SCALE-DEPENDENT: when selection is scarce
    # (deep8m, refine ~5% of live slots) finer groups win (batch 43,
    # 0.8605 -> 0.9280); when refine covers ~25%+ of live slots, coarser
    # groups win by refining whole co-located bucket spans (3k-row CPU
    # smoke: gsl8 0.8688 vs gsl64 0.9688). This 200k point sits between —
    # report it, gate only on gross breakage.
    r_fold8 = run("folded", coarse_window=512, m_cap=262144, coarse_group=8)
    assert r_fold8 >= r_fold - 0.05, (r_fold8, r_fold)
    if os.environ.get("CHECK_FOLD_EXTRA"):
        # select_mult dedup over-selection: unique-candidate widening must
        # never LOSE recall at equal refine (the selected set is a superset
        # of the smult=1 unique set by construction)
        r_sm2 = run("folded", coarse_window=512, m_cap=262144,
                    coarse_group=8, select_mult=2)
        assert r_sm2 >= r_fold8 - 0.005, (r_sm2, r_fold8)
        # bf16 two-stage exact tail: recall within noise of the f32 tail
        # (true top-k must sit inside the bf16 top-256)
        r_bf = run("folded", conf_kw={"rerank_dtype": "bfloat16"},
                   coarse_window=512, m_cap=262144, coarse_group=8)
        assert r_bf >= r_fold8 - 0.005, (r_bf, r_fold8)
    print("E2E OK", flush=True)


if __name__ == "__main__":
    check_parity()
    check_e2e()
