"""Many-generation tiered persistence at scale (VERDICT r2 item 7): spill
16 generations (~2M rows total), measure the host-side exact-key-summary
gate cost, generations actually loaded, and gated vs ungated query wall.

Generations hold disjoint cluster regions (the natural time-partitioned
ingest pattern), so localized queries let the gate prune; a uniform query
mix forces most generations open — both are reported.

Run: timeout 5400 python scripts/bench_tiered_scale.py > /tmp/tiered.log 2>&1
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.storage.persist import (GenerationStore,
                                                           TieredForest,
                                                           model_fingerprint)
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    n_gens, per_gen, d, nq = 16, 131_072, 96, 256
    conf = RDFConfig(
        vector_dim=d, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3, lsh_table=TableConfig(chain_length=32,
                                                bucket_overflow=500),
        query_batch_size=64, max_candidates=16384, top_k=10,
        coarse_dim=16, coarse_dtype="int8", coarse_refine=2048,
    )
    rng = np.random.default_rng(5)
    # region centers far apart; clusters inside each region
    regions = rng.normal(size=(n_gens, d))
    regions /= np.linalg.norm(regions, axis=1, keepdims=True)

    import tempfile

    workdir = tempfile.mkdtemp(prefix="tiered16_")
    store = GenerationStore(workdir, "g")
    tiered = TieredForest(conf, store)
    gen_x = []
    t0 = time.perf_counter()
    for g in range(n_gens):
        sub = rng.normal(size=(64, d)) * 0.2 + regions[g]
        cid = rng.integers(0, 64, per_gen)
        x = sub[cid] + 0.03 * rng.normal(size=(per_gen, d))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        x = x.astype(np.float32)
        gen_x.append(x[:64])                       # keep a query pool
        tiered.fit(DenseBatch(
            np.arange(g * per_gen, (g + 1) * per_gen, dtype=np.int32), x))
        tiered.spill()
        print(f"gen {g} spilled", flush=True)
    build_s = time.perf_counter() - t0
    out = {"n_generations": n_gens, "rows_per_gen": per_gen, "dim": d,
           "build_spill_s": round(build_s, 1)}

    def gate_ms(queries):
        tiered._probe_keys_host(queries, 1)       # compile (tunnel: ~min)
        t0 = time.perf_counter()
        probe_keys, table_of = tiered._probe_keys_host(queries, 1)
        jax.block_until_ready(jax.numpy.zeros(()))
        t_probe = time.perf_counter() - t0
        fp = model_fingerprint(tiered._prototype().model)
        t0 = time.perf_counter()
        uniques = TieredForest._probe_uniques(
            probe_keys, table_of, conf.table_num * conf.permutation_num)
        n_open = 0
        for stem in store.generations():
            s = store.key_summary(stem)
            if s is None or TieredForest._summary_matches(
                    s, probe_keys, table_of, fp, probe_uniques=uniques):
                n_open += 1
        t_gate = time.perf_counter() - t0
        return t_probe * 1e3, t_gate * 1e3, n_open

    for name, q in (
        ("localized_gen5", gen_x[5][:nq // 4]),
        ("uniform_mix", np.concatenate([gx[:nq // n_gens]
                                        for gx in gen_x])),
    ):
        tp, tg, n_open = gate_ms(q)
        out[f"{name}_probe_ms"] = round(tp, 1)
        out[f"{name}_gate_ms"] = round(tg, 1)
        out[f"{name}_generations_opened"] = n_open
        print(f"{name}: probe {tp:.1f} ms, gate {tg:.1f} ms, "
              f"opens {n_open}/{n_gens}", flush=True)

        store.disk_loads = 0
        ids, _ = tiered.query(q, steps=1)             # compile + load
        t0 = time.perf_counter()
        ids, _ = tiered.query(q, steps=1)             # warm (LRU-resident)
        dt = time.perf_counter() - t0
        out[f"{name}_gated_wall_s"] = round(dt, 3)
        out[f"{name}_qps"] = round(len(q) / dt, 1)
        print(f"{name}: gated wall {dt*1e3:.0f} ms ({len(q)/dt:.0f} qps), "
              f"disk_loads {store.disk_loads}", flush=True)

        orig = TieredForest._summary_matches
        try:
            TieredForest._summary_matches = staticmethod(
                lambda *a, **k: True)
            tiered.query(q, steps=1)                  # compile + load all
            t0 = time.perf_counter()
            ids_u, _ = tiered.query(q, steps=1)
            dt_u = time.perf_counter() - t0
        finally:
            TieredForest._summary_matches = staticmethod(orig)
        out[f"{name}_ungated_wall_s"] = round(dt_u, 3)
        print(f"{name}: ungated wall {dt_u*1e3:.0f} ms", flush=True)

    with open("results/tiered_scale.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
