"""Measure DMA-window adjacency for the Deep-8M forest coarse path.

The coarse stage issues one DMA descriptor per window (~1.2 us each,
results/check_coarse_drain_static.json) and descriptors are ~40 of the
57 ms coarse stage at w=512/B=64. If a query's windows are frequently
ADJACENT in (table, start) order — probes differing in low trie bits land
in nearby buckets — then runs of R adjacent windows could be fetched by
one descriptor of R*win rows, cutting the descriptor floor by the mean
run length. This script measures that run-length distribution at the
bench operating points BEFORE any kernel work (VERDICT r2 item 5).

Run: timeout 5400 python scripts/analyze_windows.py > /tmp/analyze_windows.log 2>&1
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def run_stats(table, start, live, win):
    """Per-query adjacency runs after (table, start) sort."""
    b = table.shape[0]
    runs_all, descr_uncoalesced, descr_coalesced4, descr_coalesced_inf = \
        [], 0, 0, 0
    for i in range(b):
        t, s = table[i][live[i]], start[i][live[i]]
        o = np.lexsort((s, t))
        t, s = t[o], s[o]
        descr_uncoalesced += len(t)
        if len(t) == 0:
            continue
        new_run = np.ones(len(t), bool)
        new_run[1:] = (t[1:] != t[:-1]) | (s[1:] != s[:-1] + win)
        run_id = np.cumsum(new_run) - 1
        lens = np.bincount(run_id)
        runs_all.append(lens)
        descr_coalesced_inf += len(lens)
        descr_coalesced4 += int(np.ceil(lens / 4.0).sum())
    lens = np.concatenate(runs_all) if runs_all else np.array([0])
    hist = np.bincount(np.minimum(lens, 16))
    return {
        "windows_per_query": round(descr_uncoalesced / b, 1),
        "runs_per_query": round(descr_coalesced_inf / b, 1),
        "mean_run_len": round(float(lens.mean()), 2),
        "descr_per_query_cap4": round(descr_coalesced4 / b, 1),
        "coalesce_factor_inf": round(
            descr_uncoalesced / max(descr_coalesced_inf, 1), 2),
        "coalesce_factor_cap4": round(
            descr_uncoalesced / max(descr_coalesced4, 1), 2),
        "run_len_hist_le16": hist.tolist(),
    }


def main():
    import os

    import jax
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index.forest import (RDFForest,
                                                        _probe_hashes_margin,
                                                        gather_blocks)
    from similaritysearchbyrdf_tpu.index.partitioner import partition_of_hash
    from similaritysearchbyrdf_tpu.ops.hashing import hash_dense_with_margins
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    N, D, B = 8_000_000, 96, 64
    overflow = int(os.environ.get("DEEP_OVERFLOW", "2000"))
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(50_000, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 50_000, N)] + 0.05 * rng.normal(size=(N, D))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)

    conf = RDFConfig(
        vector_dim=D, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3, lsh_table=TableConfig(chain_length=32,
                                                bucket_overflow=overflow),
        query_batch_size=B, max_candidates=262144, top_k=10,
        coarse_dim=16, coarse_dtype="int8", coarse_refine=12288,
    )
    t0 = time.perf_counter()
    forest = RDFForest(conf).fit(DenseBatch(np.arange(N, dtype=np.int32), x))
    jax.block_until_ready(forest.state.tables.sorted_keys)
    print(f"build: {time.perf_counter()-t0:.1f} s", flush=True)
    st = forest.state
    layout = forest.layout

    q = jnp.asarray(x[:B])
    h, margins = hash_dense_with_margins(st.model, q)
    home = partition_of_hash(h, st.part_proj)
    probes, pvalid = _probe_hashes_margin(h, margins, layout, 16)

    out = {"n": N, "bucket_overflow": overflow, "b": B, "cases": {}}
    for steps, win, m_cap in ((1, 512, 262144), (1, 1024, 262144),
                              (1, 256, 196608)):
        base_b, table_b2, start_b, end_b, total, bs = gather_blocks(
            st.tables, h, home, layout, steps, m_cap, True,
            probes=probes, probe_valid=pvalid, window=win)
        # live = window has any valid rows: pos range [max(start,base+mb*bs),
        # end); approximate liveness by end > window first pos
        tb = np.asarray(table_b2)
        st_np = np.asarray(base_b)
        en = np.asarray(end_b)
        stt = np.asarray(start_b)
        mb = tb.shape[1]
        first_pos = st_np + np.arange(mb)[None, :] * win
        live = (first_pos < en) & (first_pos + win > stt)
        stats = run_stats(tb, first_pos, live, win)
        key = f"steps{steps}_w{win}_m{m_cap}"
        out["cases"][key] = stats
        print(key, json.dumps(stats), flush=True)

    with open("results/window_adjacency.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
