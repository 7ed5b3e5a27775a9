"""Deep-100M plan rehearsal at TRUE per-shard shapes (VERDICT r2 item 2).

The README "Scaling plan" (BASELINE config 5) puts 6.25M rows on each of
16 v5e chips. Real multi-chip hardware is not attached, so this rehearsal
runs the full mesh-sharded programs on a 2-virtual-CPU-device mesh where
EVERY shard holds exactly the plan's 6.25M rows at D=96 — the sharded fit
and query execute at the plan's per-shard array shapes (the thing the toy
128-rows/device dryrun cannot exercise), and the artifact records the
measured per-shard bytes against the 16 GB/chip HBM budget.

Engines: sharded flat (full-fidelity fit — quantize + strided gmax
layout) and sharded IVF (k_clusters=1024, iters=2: the one disclosed
compromise — plan-scale k-means at kc≈24k is TPU work, not 1-core-CPU
work; layout, probe math, window gather and merge run at true shape).
Recall is vs exact GT over the full 12.5M-row corpus. Wall-clock here is
a CPU-emulation artifact, NOT a perf claim — per-chip perf anchors are
results/deep8m_coarse.json / ivf_deep8m.json / deep30m.json.

Run: timeout 14400 python scripts/rehearsal_plan_shards.py
"""

import json
import os
import sys
import time

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
)

import jax

try:  # the axon sitecustomize registers the remote-TPU backend at
    # interpreter start; force the platform back to CPU before any use
    # (same dance as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np

sys.path.insert(0, ".")

ROWS_PER_SHARD = int(os.environ.get("REH_ROWS", 6_250_000))  # plan: 100M/16
NDEV = 2
N, D, NQ = ROWS_PER_SHARD * NDEV, 96, int(os.environ.get("REH_NQ", 256))
PLAN_CHIPS = 16
HBM_BYTES = 16 << 30


def shard_bytes(state) -> dict:
    """Per-shard device bytes by field (shard 0; all shards are equal)."""
    out = {}
    for name, arr in state._asdict().items():
        if arr is None:          # optional tier not built (e.g. gmax off)
            continue
        sh = arr.addressable_shards[0].data
        # replicated fields (e.g. IVF centroids) count once per chip too
        out[name] = int(np.prod(sh.shape)) * sh.dtype.itemsize
    return out


def recall_at_10(ids: np.ndarray, gt_sets) -> float:
    return float(np.mean([
        len(set(map(int, ids[i, :10])) & gt_sets[i]) / 10.0
        for i in range(len(gt_sets))
    ]))


def main():
    import jax

    from similaritysearchbyrdf_tpu.ops.exact import exact_search
    from similaritysearchbyrdf_tpu.parallel.mesh import make_forest_mesh
    from similaritysearchbyrdf_tpu.parallel.sharded_flat import (
        ShardedFlatIndex)
    from similaritysearchbyrdf_tpu.parallel.sharded_ivf import (
        ShardedIVFIndex)
    from similaritysearchbyrdf_tpu.utils.datasets import hard_clustered
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    assert jax.device_count() == NDEV, jax.devices()
    mesh = make_forest_mesh(NDEV)

    t0 = time.perf_counter()
    x, q = hard_clustered(N, D, n_queries=NQ, seed=7,
                          n_centers=max(N // 1000, 64))
    print(f"corpus gen {N}x{D}: {time.perf_counter()-t0:.0f}s", flush=True)

    t0 = time.perf_counter()
    gt, _ = exact_search(x, q, k=10, batch=256, exclude_self=False)
    gt_sets = [set(map(int, gt[i])) for i in range(NQ)]
    print(f"exact GT: {time.perf_counter()-t0:.0f}s", flush=True)

    out = {
        "mesh": f"{NDEV}-virtual-CPU-device",
        "rows_per_shard": ROWS_PER_SHARD,
        "dim": D,
        "plan": {"chips": PLAN_CHIPS, "rows_per_chip": ROWS_PER_SHARD,
                 "corpus_rows_total": ROWS_PER_SHARD * PLAN_CHIPS},
        "engines": {},
    }
    batch = DenseBatch(np.arange(N, dtype=np.int32), x)

    # ---- sharded flat (full-fidelity fit at plan shape) ----
    t0 = time.perf_counter()
    flat = ShardedFlatIndex(mesh=mesh, refine=128).fit(batch)
    fit_s = time.perf_counter() - t0
    fb = shard_bytes(flat.state)
    t0 = time.perf_counter()
    ids, _ = flat.query(q, k=10, exclude_self=False)
    q_s = time.perf_counter() - t0
    out["engines"]["sharded_flat"] = {
        "fit_s_cpu": round(fit_s, 1),
        "query_s_cpu_256q": round(q_s, 1),
        "recall@10": round(recall_at_10(ids, gt_sets), 4),
        "per_shard_bytes": fb,
        "per_shard_gb_total": round(sum(fb.values()) / (1 << 30), 2),
        "hbm_fraction": round(sum(fb.values()) / HBM_BYTES, 3),
    }
    print(json.dumps(out["engines"]["sharded_flat"]), flush=True)
    del flat

    # ---- sharded IVF (kc/iters reduced for 1-core CPU; see docstring) ----
    from similaritysearchbyrdf_tpu.parallel.sharded_ivf import (
        fit_ivf_sharded)

    t0 = time.perf_counter()
    kc = min(1024, max(N // 256, 16))
    ivf = ShardedIVFIndex(mesh=mesh, nprobe=8, win=64, refine=128, iters=2)
    ivf.state, ivf.mesh = fit_ivf_sharded(
        x, np.arange(N, dtype=np.int32), mesh, iters=2, k_clusters=kc)
    fit_s = time.perf_counter() - t0
    ib = shard_bytes(ivf.state)
    pts = []
    for nprobe in (4, 16):
        t0 = time.perf_counter()
        ids, _ = ivf.query(q, k=10, exclude_self=False, nprobe=nprobe)
        pts.append({
            "nprobe": nprobe,
            "query_s_cpu_256q": round(time.perf_counter() - t0, 1),
            "recall@10": round(recall_at_10(ids, gt_sets), 4),
        })
        print(json.dumps(pts[-1]), flush=True)
    out["engines"]["sharded_ivf"] = {
        "fit_s_cpu": round(fit_s, 1),
        "k_clusters": kc, "iters": 2,
        "points": pts,
        "per_shard_bytes": ib,
        "per_shard_gb_total": round(sum(ib.values()) / (1 << 30), 2),
        "hbm_fraction": round(sum(ib.values()) / HBM_BYTES, 3),
    }
    out["note"] = (
        "full sharded fit+query programs executed at the plan's per-shard "
        "shapes (6.25M rows/shard x 96d) on a 2-virtual-CPU-device mesh; "
        "per-shard bytes are what each of the plan's 16 chips would hold; "
        "CPU wall-clock is emulation cost, not a perf claim; IVF kc/iters "
        "reduced from plan scale (k-means is TPU work) — layout, probe "
        "math, window gathers and the all-gather merge run at true shape")
    path = ("results/rehearsal_plan_shards.json"
            if ROWS_PER_SHARD == 6_250_000 else "/tmp/rehearsal_smoke.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
