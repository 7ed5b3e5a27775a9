"""Stage-bisect the warm fit_dense wall on the driver-bench workload.

VERDICT r3 item 1: build_vectors_per_sec regressed 59.2k (r2) -> 42.2k (r3)
at identical device code (the fit-path functions diff clean between the
round tags). This script decides whether the regression is real device work
or host/tunnel overhead, by timing:
  - warm fit_dense end-to-end, 5 reps (min / median)
  - the host->device corpus upload alone
  - each jitted stage (keys, sort+depths, compact, records, coarse tier)
    with pipelined dispatch

Writes results/bisect_fit.json.
"""

import json
import time

import numpy as np

import sys
sys.path.insert(0, "/root/repo")

from bench import make_data, N_CORPUS, DIM, wait_for_backend


def main():
    wait_for_backend()
    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index.forest import (
        RDFForest, fit_dense, _keys_for_corpus, _pad_to,
        _build_coarse_tier,
    )
    from similaritysearchbyrdf_tpu.index.bucket_table import (
        _sort_and_depths, _compact_buckets, _build_records, build_tables,
    )
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    conf = RDFConfig(
        vector_dim=DIM, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3,
        lsh_table=TableConfig(chain_length=32, bucket_overflow=500),
        query_batch_size=256, max_candidates=4096, top_k=10, seed=31258,
        coarse_dim=32, coarse_dtype="int8", coarse_refine=512,
    )
    x = make_data()
    ids = np.arange(N_CORPUS, dtype=np.int32)

    forest = RDFForest(conf)
    forest.fit(DenseBatch(ids, x))          # compile everything
    nb_pad = forest.state.tables.bucket_keys.shape[1]

    out = {"n_corpus": N_CORPUS}

    # ---- end-to-end warm fits ----
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        st = fit_dense(conf, DenseBatch(ids, x), model=forest.model,
                       part_proj=forest.part_proj, nb_pad=nb_pad)
        jax.block_until_ready(st.tables.sorted_keys)
        reps.append(time.perf_counter() - t0)
    out["fit_e2e_s"] = [round(r, 4) for r in reps]
    out["fit_vps_best"] = round(N_CORPUS / min(reps), 1)
    out["fit_vps_worst"] = round(N_CORPUS / max(reps), 1)

    # ---- upload alone ----
    n = N_CORPUS
    chunk = min(conf.fit_batch_size, _pad_to(n, 256))
    npad = _pad_to(n, chunk)
    values = np.zeros((npad, DIM), dtype=np.float32)
    values[:n] = x
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        vd = jnp.asarray(values)
        vd.block_until_ready()
        ts.append(time.perf_counter() - t0)
        del vd
    out["upload_s"] = [round(r, 4) for r in ts]

    # ---- staged device work (pipelined: dispatch 4, block once) ----
    layout = forest.layout
    valid = np.zeros((npad,), dtype=bool)
    valid[:n] = True
    vd = jnp.asarray(values)
    valid_d = jnp.asarray(valid)

    def timed(name, fn, reps=4):
        r = fn()
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn()
        jax.block_until_ready(r)
        out[name] = round((time.perf_counter() - t0) / reps, 4)
        return r

    keys = timed("keys_s", lambda: _keys_for_corpus(
        forest.model, forest.part_proj, vd, valid_d, layout, chunk))
    idsb = jnp.broadcast_to(
        jnp.where(valid_d, jnp.arange(npad, dtype=jnp.int32), -1)[None, :],
        keys.shape)
    sd = timed("sort_depths_s", lambda: _sort_and_depths(
        keys, idsb, layout, conf.lsh_table.bucket_overflow))
    sk, si, es, esh = sd
    timed("compact_s", lambda: _compact_buckets(sk, es, esh, nb_pad))
    bk, bs, bsh = _compact_buckets(sk, es, esh, nb_pad)
    timed("records_s", lambda: _build_records(bk, bs, bsh))
    dpad = _pad_to(DIM, 128)
    corpus_store = jnp.pad(vd, ((0, 0), (0, dpad - DIM)))
    timed("coarse_tier_s", lambda: _build_coarse_tier(
        corpus_store, forest.state.tables.sorted_ids, conf.coarse_dim,
        conf.coarse_dtype, conf.seed, dim=DIM)[1])

    print(json.dumps(out, indent=1))
    with open("/root/repo/results/bisect_fit.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
