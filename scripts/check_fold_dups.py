"""Quantify duplicate candidate ids in the folded groupmax refine set.

The refine budget pays exact-scoring cost PER SLOT, but the same corpus row
reaches the selected set once per table whose probed bucket contains it —
duplicates buy no recall. If the duplicate fraction is large, selecting
~2x more groups, deduplicating by id (two sorts), and truncating back to
`refine` unique candidates widens the effective refine at fixed exact-
scoring cost.

CPU-friendly (uses the XLA fallback); run at the check_coarse_fold e2e
shapes:  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
             python scripts/check_fold_dups.py [n [gsl [refine]]]
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax.numpy as jnp

    from similaritysearchbyrdf_tpu import DenseBatch, RDFConfig, RDFForest
    from similaritysearchbyrdf_tpu.config import TableConfig
    from similaritysearchbyrdf_tpu.index import forest as F

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    gsl = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    refine = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    d, nq = 96, 64
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(2000, d))
    x = centers[rng.integers(0, 2000, n)] + 0.2 * rng.normal(size=(n, d))
    x = (x / np.linalg.norm(x, axis=1, keepdims=True)).astype(np.float32)
    q = x[:nq]
    gt = np.argsort(-(q @ x.T), axis=1)[:, :11]
    gt_sets = [set(map(int, gt[i][gt[i] != i][:10])) for i in range(nq)]

    conf = RDFConfig(
        vector_dim=d, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3,
        lsh_table=TableConfig(chain_length=32, bucket_overflow=500),
        query_batch_size=nq, max_candidates=262144, top_k=10,
        coarse_dim=16, coarse_dtype="int8", coarse_layout="folded",
        coarse_refine=refine, coarse_window=512,
    )
    forest = RDFForest(conf).fit(DenseBatch(np.arange(n, dtype=np.int32), x))
    state, layout = forest.state, forest.layout

    # reproduce _query_groupmax's selection up to cand2 at a few rgg widths
    from similaritysearchbyrdf_tpu.ops.hashing import hash_dense_with_margins
    from similaritysearchbyrdf_tpu.ops.pallas.coarse_fold import (
        I32_DEAD, rowmax_fallback,
    )

    qd = jnp.asarray(q)
    h, margins = hash_dense_with_margins(state.model, qd)
    probes, probe_valid = F._probe_hashes_margin(h, margins, layout, 16)
    home = F.partition_of_hash(h, state.part_proj)
    folded = state.coarse_folded
    l_n, capf, lanes = folded.shape
    cs = state.coarse_proj.shape[1]
    fold = lanes // cs
    rpg = gsl // fold
    mshift = gsl.bit_length() - 1
    align = max(gsl, 8 * fold)
    win, m_cap = 512, 262144
    base_b, table_b2, start_b, end_b, total, _ = F.gather_blocks(
        state.tables, h, home, layout, 1, m_cap, True,
        probes=probes, probe_valid=probe_valid, window=win, align=align,
    )
    b = nq
    mb_cap = m_cap // win
    mb = jnp.arange(mb_cap, dtype=jnp.int32)
    capslots = capf * fold
    blk = jnp.clip(base_b + mb[None, :] * win, 0, capslots - win)
    live = (blk < end_b) & (blk + win > start_b)
    q_low = qd @ state.coarse_proj
    qscale = jnp.float32(127.0) / jnp.maximum(
        jnp.max(jnp.abs(q_low), axis=1, keepdims=True), 1e-20)
    qi8 = jnp.clip(jnp.round(q_low * qscale), -127, 127).astype(jnp.int8)
    qmat = jnp.stack(
        [jnp.pad(qi8, ((0, 0), (s * cs, (fold - 1 - s) * cs)))
         for s in range(fold)], axis=1)
    wpr = win // fold
    rs = jnp.where(live, blk // fold, -1)
    rowpk = rowmax_fallback(folded, qmat, table_b2, rs, wpr=wpr, rpg=rpg,
                            mshift=mshift)
    rowpk = rowpk.reshape(b, mb_cap, wpr)
    j = jnp.arange(wpr, dtype=jnp.int32)
    slot0 = blk[:, :, None] + j[None, None, :] * fold
    row_live = (live[:, :, None] & (slot0 < end_b[:, :, None])
                & (slot0 + fold > start_b[:, :, None]))
    dead = jnp.int32(I32_DEAD)
    rowpk = jnp.where(row_live, rowpk, dead)
    ngw = win // gsl
    g1 = jnp.max(rowpk.reshape(b, mb_cap, ngw, rpg), axis=-1)
    width = mb_cap * ngw
    flat = g1.reshape(b, width)
    gidx = jnp.broadcast_to(
        jnp.arange(width, dtype=jnp.int32)[None, :], (b, width))
    neg_s, gidx_s = jnp.asarray(
        __import__("jax").lax.sort((-flat, gidx), dimension=1, num_keys=1))

    id_cap = state.tables.sorted_ids.shape[1]
    ids_view = np.asarray(state.tables.sorted_ids).reshape(
        l_n * (id_cap // gsl), gsl)
    blk_np = np.asarray(blk)
    t2all = np.asarray(table_b2)
    neg_np, gidx_np = np.asarray(neg_s), np.asarray(gidx_s)

    for mult in (1, 2, 4):
        rgg = min(refine // gsl * mult, width)
        sel = gidx_np[:, :rgg]
        selpk = -neg_np[:, :rgg]
        mbi = sel // ngw
        gi = sel % ngw
        base = np.take_along_axis(blk_np, mbi, axis=1) + gi * gsl
        t2 = np.take_along_axis(t2all, mbi, axis=1)
        grow = (np.clip(t2, 0, l_n - 1) * (id_cap // gsl)
                + np.clip(base, 0, id_cap - gsl) // gsl)
        cand = ids_view[grow].reshape(b, rgg * gsl)
        validm = np.repeat(selpk != int(I32_DEAD), gsl, axis=1) & (cand >= 0)
        uniq_fr, rec_u = [], 0.0
        for i in range(b):
            c = cand[i][validm[i]]
            u = set(map(int, c))
            uniq_fr.append(len(u) / max(len(c), 1))
            rec_u += len(gt_sets[i] & u) / 10
        print(f"gsl={gsl} refine={refine} x{mult}: slots={rgg * gsl} "
              f"unique_frac={np.mean(uniq_fr):.3f} "
              f"recall_in_candidates={rec_u / b:.4f}", flush=True)


if __name__ == "__main__":
    main()
