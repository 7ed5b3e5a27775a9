"""Transfer-free stage bisection of the FOLDED groupmax query pipeline
(`forest._query_groupmax`): cumulative prefixes, each ending in a scalar
sum (array outputs ship through the axon tunnel at ~0.3 GB/s and poison
isolated stage timings — the bisect_query.py lesson).

Run:  python scripts/bisect_fold.py [N [D]]            (default 8M x 96)
Env:  FOLD_WIN / FOLD_MCAP / FOLD_REFINE / FOLD_BUDGET / FOLD_B / FOLD_GSL
      FOLD_STAGE2 (staged-rerank exact budget; adds regather/slotscore/
      slotsort stages and truncates the exact stage to stage2 rows)
Writes results/bisect_fold.json.
"""

import json
import os
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

    from similaritysearchbyrdf_tpu.config import RDFConfig, TableConfig
    from similaritysearchbyrdf_tpu.index import forest as F
    from similaritysearchbyrdf_tpu.ops import rerank as rr
    from similaritysearchbyrdf_tpu.ops.hashing import hash_dense_with_margins
    from similaritysearchbyrdf_tpu.ops.pallas.coarse_fold import (
        I32_DEAD,
        pallas_coarse_rowmax,
        rowmax_fallback,
    )
    from similaritysearchbyrdf_tpu.vectors import DenseBatch

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    B = int(os.environ.get("FOLD_B", "64"))
    win = int(os.environ.get("FOLD_WIN", "4096"))
    m_cap = int(os.environ.get("FOLD_MCAP", "1048576"))
    refine = int(os.environ.get("FOLD_REFINE", "12288"))
    budget = int(os.environ.get("FOLD_BUDGET", "16"))
    gsl = int(os.environ.get("FOLD_GSL", "64"))
    stage2 = int(os.environ.get("FOLD_STAGE2", "0"))
    steps = 1

    conf = RDFConfig(
        vector_dim=D, table_num=10, permutation_num=3, family_size=100,
        partition_bits=3,
        lsh_table=TableConfig(chain_length=32, bucket_overflow=2000),
        query_batch_size=B, max_candidates=m_cap, top_k=10,
        coarse_dim=16, coarse_dtype="int8", coarse_layout="folded",
        coarse_refine=refine,
    )
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(50_000, D))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    x = centers[rng.integers(0, 50_000, N)] + 0.05 * rng.normal(size=(N, D))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    x = x.astype(np.float32)
    forest = F.RDFForest(conf).fit(DenseBatch(np.arange(N, dtype=np.int32), x))
    state, layout = forest.state, forest.layout
    print("fit done", flush=True)

    q = jnp.asarray(x[:B])
    qids = jnp.arange(B, dtype=jnp.int32)
    k = 10

    # fit-time ids128 cache, built ONCE outside the timed region so the
    # 'idgather' stage matches the landed path (state.ids128; advisor r3:
    # building it in-jit re-pays the pad+retile relayout per timed call)
    ids128_cached = F.ids128_view(state.tables.sorted_ids)
    jax.block_until_ready(ids128_cached)

    def upto(stage):
        def run(tables, corpus, row_ids, model, part_proj, cproj, folded,
                ids128, qq, qi):
            h, margins = hash_dense_with_margins(model, qq)
            probes, probe_valid = F._probe_hashes_margin(
                h, margins, layout, budget
            )
            if stage == "hash":
                return h.sum() + probes.sum()
            home = F.partition_of_hash(h, part_proj)
            if stage == "lookup":
                # probe fan-out + bucket-range lookup only: the remainder of
                # gather_blocks (dedup sorts + ragged flatten) is blocks-lookup
                from similaritysearchbyrdf_tpu.index.bucket_table import (
                    lookup_ranges,
                )
                pk, tof, pv = F.probe_key_set(
                    h, home, layout, steps, True, probes, probe_valid
                )
                st, ln = lookup_ranges(tables, pk, tof)
                return st.sum() + jnp.where(pv, ln, 0).sum()
            lanes = folded.shape[2]
            cs = cproj.shape[1]
            fold = lanes // cs
            rpg = gsl // fold
            mshift = gsl.bit_length() - 1
            align = max(gsl, 8 * fold)
            base_b, table_b2, start_b, end_b, total, _ = F.gather_blocks(
                tables, h, home, layout, steps, m_cap, True,
                probes=probes, probe_valid=probe_valid, window=win,
                align=align,
            )
            if stage == "blocks":
                return (base_b.sum() + table_b2.sum() + end_b.sum()
                        + total.sum())
            b = qq.shape[0]
            mb_cap = m_cap // win
            mb = jnp.arange(mb_cap, dtype=jnp.int32)
            capslots = folded.shape[1] * fold
            blk = jnp.clip(base_b + mb[None, :] * win, 0, capslots - win)
            live = (blk < end_b) & (blk + win > start_b)
            q_low = qq @ cproj
            qscale = jnp.float32(127.0) / jnp.maximum(
                jnp.max(jnp.abs(q_low), axis=1, keepdims=True), 1e-20
            )
            qi8 = jnp.clip(jnp.round(q_low * qscale), -127, 127).astype(
                jnp.int8
            )
            qmat = jnp.stack(
                [jnp.pad(qi8, ((0, 0), (s * cs, (fold - 1 - s) * cs)))
                 for s in range(fold)], axis=1,
            )
            wpr = win // fold
            rs = jnp.where(live, blk // fold, -1)
            if jax.default_backend() == "tpu":
                rowpk = pallas_coarse_rowmax(
                    folded, qmat, table_b2, rs, wpr=wpr, rpg=rpg,
                    mshift=mshift, max_run=F._FOLD_MAX_RUN)
            else:
                rowpk = rowmax_fallback(folded, qmat, table_b2, rs,
                                        wpr=wpr, rpg=rpg, mshift=mshift)
            if stage == "kernel":
                return rowpk.sum() + total.sum()
            rowpk = rowpk.reshape(b, mb_cap, wpr)
            j = jnp.arange(wpr, dtype=jnp.int32)
            slot0 = blk[:, :, None] + j[None, None, :] * fold
            row_live = (live[:, :, None] & (slot0 < end_b[:, :, None])
                        & (slot0 + fold > start_b[:, :, None]))
            dead = jnp.int32(I32_DEAD)
            rowpk = jnp.where(row_live, rowpk, dead)
            ngw = win // gsl
            g1 = jnp.max(rowpk.reshape(b, mb_cap, ngw, rpg), axis=-1)
            if stage == "groups":
                return g1.sum() + total.sum()
            # mirror the LANDED select + id fetch (forest._query_groupmax):
            # single-operand packed select sort, then lane-full parent-row
            # id gathers (the old [L*cap/gsl, gsl] narrow reshape pads each
            # row to 128 lanes and OOMs HBM at 8M/gsl8 — batch 44).
            width = mb_cap * ngw
            flat = g1.reshape(b, width)
            rgg = max(1, min(refine // gsl, width))
            bits_w = max(1, (width - 1).bit_length())
            score_bits = (cs * 127 * 127).bit_length() + 1
            sh = max(0, score_bits + mshift - (32 - bits_w))
            lo = jnp.int32(-(1 << (31 - bits_w)))
            qv = jnp.maximum(jax.lax.shift_right_arithmetic(flat, sh), lo)
            gidx = jax.lax.broadcasted_iota(jnp.int32, (b, width), 1)
            pack = jax.lax.shift_left(qv, bits_w) | gidx
            pack_s = ~jax.lax.sort(~pack, dimension=1)[:, :rgg]
            sel = pack_s & jnp.int32((1 << bits_w) - 1)
            live_sel = jax.lax.shift_right_arithmetic(pack_s, bits_w) > lo
            if stage == "select":
                return pack_s.sum() + sel.sum()
            mbi = sel // ngw
            gi = sel % ngw
            base = jnp.take_along_axis(blk, mbi, axis=1) + gi * gsl
            t2 = jnp.take_along_axis(table_b2, mbi, axis=1)
            sel_valid = jnp.repeat(live_sel, gsl, axis=1)
            l_n = folded.shape[0]
            id_cap = tables.sorted_ids.shape[1]
            idw = -(-id_cap // 128) * 128
            gpr = 128 // gsl
            basec = jnp.clip(base, 0, ((id_cap - gsl) // gsl) * gsl)
            rowi = jnp.clip(t2, 0, l_n - 1) * (idw // 128) + basec // 128
            rows = jnp.take(ids128, rowi, axis=0)
            off = (basec // gsl) % gpr
            ext = rows[..., :gsl]
            for p in range(1, gpr):
                ext = jnp.where(
                    (off == p)[..., None],
                    rows[..., p * gsl:(p + 1) * gsl], ext,
                )
            cand2 = ext.reshape(b, rgg * gsl)
            cand2 = jnp.where(sel_valid & (cand2 >= 0), cand2, -1)
            if stage == "idgather":
                return cand2.sum() + total.sum()
            if 0 < stage2 < rgg * gsl:
                # staged rerank (forest._query_groupmax stage2 path)
                capf = folded.shape[1]
                gbase = jnp.clip(base, 0, capslots - gsl)
                rowf = gbase // fold
                tf = jnp.clip(t2, 0, l_n - 1)
                if rpg > 1:
                    rowf = (rowf[:, :, None]
                            + jnp.arange(rpg, dtype=jnp.int32)[None, None]
                            ).reshape(b, rgg * rpg)
                    tf = jnp.repeat(tf, rpg, axis=1)
                frows = jnp.take(
                    folded.reshape(l_n * capf, lanes), tf * capf + rowf,
                    axis=0)
                if stage == "regather":
                    return frows.sum() + total.sum()
                sc = jax.lax.dot_general(
                    frows.astype(jnp.int32), qmat.astype(jnp.int32),
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32)
                slot_sc = sc.reshape(b, rgg * gsl)
                if stage == "slotscore":
                    return slot_sc.sum() + total.sum()
                sent = jnp.int32(1 << 30)
                idk = jnp.where(cand2 >= 0, cand2, sent)
                negsc = jnp.where(cand2 >= 0, -slot_sc, sent)
                id_s, neg_s = jax.lax.sort((idk, negsc), dimension=1,
                                           num_keys=2)
                dupm = jnp.concatenate(
                    [jnp.zeros((b, 1), dtype=bool),
                     id_s[:, 1:] == id_s[:, :-1]], axis=1)
                neg_s = jnp.where(dupm | (id_s == sent), sent, neg_s)
                neg2, id2 = jax.lax.sort((neg_s, id_s), dimension=1,
                                         num_keys=1)
                cand2 = jnp.where(neg2 != sent, id2, -1)[:, :stage2]
                if stage == "slotsort":
                    return cand2.sum() + total.sum()
            cand2 = F._exclude_self(cand2, row_ids, qi)
            exact = rr.score_candidates(corpus, cand2, qq)
            if stage == "score":
                return exact.sum() + cand2.sum()
            ids_k, sc_k = rr.dedup_topk(cand2, exact, k)
            return ids_k.sum() + sc_k.sum()

        return jax.jit(run)

    prev = 0.0
    outd = {"n": N, "dim": D, "b": B, "win": win, "m_cap": m_cap,
            "refine": refine, "budget": budget, "gsl": gsl,
            "stage2": stage2}
    stages = ("hash", "lookup", "blocks", "kernel", "groups", "select",
              "idgather", "score", "full")
    if stage2:
        stages = ("hash", "lookup", "blocks", "kernel", "groups", "select",
                  "idgather", "regather", "slotscore", "slotsort", "score",
                  "full")
    if os.environ.get("BISECT_STAGES"):
        stages = tuple(os.environ["BISECT_STAGES"].split(","))
    for stage in stages:
        fn = upto(stage)
        t = timeit(
            fn, state.tables, state.corpus, state.row_ids, state.model,
            state.part_proj, state.coarse_proj, state.coarse_folded,
            ids128_cached, q, qids,
        )
        outd[f"upto_{stage}_ms"] = round(t * 1e3, 2)
        print(f"upto {stage}: {t*1e3:.2f}ms (+{(t-prev)*1e3:.2f})",
              flush=True)
        prev = t
    outd["note"] = (f"cumulative scalar-output prefixes; B={B} chunk; "
                    "folded groupmax path; v5e")
    # CPU smoke runs must not clobber the committed TPU artifact
    dest = (os.environ.get("BISECT_OUT", "results/bisect_fold.json")
            if jax.default_backend() == "tpu" else "/tmp/bisect_fold_cpu.json")
    with open(dest, "w") as f:
        json.dump(outd, f, indent=1)
    print("BISECT " + json.dumps(outd), flush=True)


if __name__ == "__main__":
    main()
