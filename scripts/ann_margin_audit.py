"""Cross-engine safety-margin audit for the ORACLE-AUDITED ANN tiers.

The pinned-codebook queries (`embed_ivf_pinned_topk`,
`embed_pq_pinned_topk`) and the multi-table LSH query carry FULL
DuckDB hash oracles even though their candidate generation involves
float comparisons: that is sound only while every decision margin
(argmin gaps, probe/refine ranking boundaries, signature-dot signs)
is orders of magnitude above the worst-case accumulation-order noise
between Spark's sequential folds, numpy's matmul and DuckDB's
list_dot_product (~1e-14 relative). This script recomputes those
margins on every fixture scale so the numbers cited in the plan and
oracle docstrings stay reproducible; run it after any codebook,
plane-set, nprobe or refine change.

Run: python scripts/ann_margin_audit.py   (prints one line per
(sf, tier); exits 1 if any margin falls below FLOOR).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402
import numpy as np  # noqa: E402

from fsc_etl_spark.plans.training_data import (  # noqa: E402
    IVF_PINNED_CENTROIDS,
    LSH_TABLES,
    PQ_PINNED_CODEBOOKS,
)

SFS = ["sf0.001", "sf0.01", "sf0.1"]
NPROBE = 5
REFINE_POOL = 200
SEMDEDUP_TAU = 0.30
#: any decision margin below this is too close to cross-engine fold
#: noise (~1e-14) to trust a hash oracle on.
FLOOR = 1e-9
#: floor for 6dp ROUND half-boundary proximity (raw value units): a
#: rounded OUTPUT flips between engines only if the raw value sits
#: within fold-reorder noise (~1e-16 for one 64-term dot) of a
#: 0.5e-6 boundary; 1e-13 leaves 3 orders.
BOUNDARY_FLOOR = 1e-13


def load(sf: str):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('/root/testdata/{sf}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype="float64")
    return ids, V, np.sqrt((V * V).sum(axis=1))


def main() -> int:
    bad = []
    H = np.array(LSH_TABLES).reshape(-1, 64)  # 48 planes
    C = np.array(IVF_PINNED_CENTROIDS)
    chalf = 0.5 * (C * C).sum(axis=1)
    B = np.array(PQ_PINNED_CODEBOOKS)  # (8, 16, 8)
    bhalf = 0.5 * (B * B).sum(axis=2)

    for sf in SFS:
        ids, V, n = load(sf)
        qmask = ids < 5

        # LSH: min |signature dot| (a sign flip moves a bucket)
        lsh_margin = np.abs(V @ H.T).min()

        # IVF: assignment gap (best vs 2nd cell) and probe boundary
        # (NPROBE-th vs next cell, query side)
        S = V @ C.T / n[:, None] - chalf[None, :]
        Ss = np.sort(S, axis=1)[:, ::-1]
        ivf_assign = (Ss[:, 0] - Ss[:, 1]).min()
        ivf_probe = (Ss[qmask, NPROBE - 1] - Ss[qmask, NPROBE]).min()

        # TRAINED tiers (round 7: embed_ivf_topk / embed_pq_topk
        # upgraded from rows-only to full hash oracles with the
        # replicated-Lloyd codebooks): same decision margins with the
        # trained quantizers and their live knobs (nprobe=4, pool=200)
        from fsc_etl_spark.plans.oracles_training import _replicated_quantizers

        tivf, tpq = _replicated_quantizers(f"/root/testdata/{sf}")
        TC = np.array(tivf)
        tS = V @ TC.T / n[:, None] - (0.5 * (TC * TC).sum(axis=1))[None, :]
        tSs = np.sort(tS, axis=1)[:, ::-1]
        trained_ivf_assign = (tSs[:, 0] - tSs[:, 1]).min()
        trained_ivf_probe = (tSs[qmask, 3] - tSs[qmask, 4]).min()  # nprobe=4
        TB = np.array(tpq)
        tbhalf = 0.5 * (TB * TB).sum(axis=2)
        tcodes = np.empty((len(V), 8), dtype=int)
        trained_pq_enc = np.inf
        for s in range(8):
            sc = V[:, s * 8 : (s + 1) * 8] @ TB[s].T / n[:, None] - tbhalf[s][None, :]
            scs = np.sort(sc, axis=1)[:, ::-1]
            trained_pq_enc = min(trained_pq_enc, (scs[:, 0] - scs[:, 1]).min())
            tcodes[:, s] = sc.argmax(axis=1)
        trained_pq_cut = np.inf
        for qi in np.where(qmask)[0]:
            lut = np.stack(
                [V[qi, s * 8 : (s + 1) * 8] @ TB[s].T / n[qi] for s in range(8)]
            )
            adc = lut[np.arange(8)[None, :], tcodes].sum(axis=1)
            mask = ids != ids[qi]
            order = np.argsort(-adc[mask], kind="stable")
            vals = adc[mask][order]
            if len(vals) > REFINE_POOL:
                gap = vals[REFINE_POOL - 1] - vals[REFINE_POOL]
                if gap == 0:
                    cids = np.where(mask)[0][order]
                    if not np.array_equal(
                        tcodes[cids[REFINE_POOL - 1]], tcodes[cids[REFINE_POOL]]
                    ):
                        gap = -1.0
                trained_pq_cut = min(trained_pq_cut, gap)

        # PQ: encode argmin gap per (vector, subspace) and the ADC
        # refine-pool cutoff gap per query
        codes = np.empty((len(V), 8), dtype=int)
        pq_enc = np.inf
        for s in range(8):
            sc = V[:, s * 8 : (s + 1) * 8] @ B[s].T / n[:, None] - bhalf[s][None, :]
            scs = np.sort(sc, axis=1)[:, ::-1]
            pq_enc = min(pq_enc, (scs[:, 0] - scs[:, 1]).min())
            codes[:, s] = sc.argmax(axis=1)
        pq_cut = np.inf
        for qi in np.where(qmask)[0]:
            lut = np.stack(
                [V[qi, s * 8 : (s + 1) * 8] @ B[s].T / n[qi] for s in range(8)]
            )
            adc = lut[np.arange(8)[None, :], codes].sum(axis=1)
            order = np.argsort(-adc[ids != ids[qi]], kind="stable")
            vals = adc[ids != ids[qi]][order]
            if len(vals) > REFINE_POOL:
                gap = vals[REFINE_POOL - 1] - vals[REFINE_POOL]
                # gap 0 from identical code vectors is safe (shared
                # vec_id tie-break); from distinct codes it is not
                if gap == 0:
                    cids = np.where(ids != ids[qi])[0][order]
                    if not np.array_equal(
                        codes[cids[REFINE_POOL - 1]], codes[cids[REFINE_POOL]]
                    ):
                        gap = -1.0
                pq_cut = min(pq_cut, gap)

        # SemDeDup: tau-threshold gap on raw within-cell pair cosines,
        # loser-rule gap on 6dp csims, and round-boundary proximity
        # for every rounded output value — measured for BOTH the
        # pinned 8-cell codebook (embed_semdedup_prune /
        # embed_knn_label_audit) and the trained 16-cell codebook
        # (embed_semdedup_trained / embed_knn_audit_trained, round 7).
        def semdedup_margins(centers_arr):
            chalf_ = 0.5 * (centers_arr * centers_arr).sum(axis=1)
            S_ = V @ centers_arr.T / n[:, None] - chalf_[None, :]
            cell = S_.argmax(axis=1)  # first-max == lowest-cell tie
            cnorm = np.sqrt((centers_arr * centers_arr).sum(axis=1))
            csim = (V @ centers_arr.T / n[:, None] / cnorm[None, :])[
                np.arange(len(V)), cell
            ]
            tau = np.inf
            loser = np.inf
            bnd = (
                np.abs(np.abs(csim * 1e6 - np.floor(csim * 1e6)) - 0.5).min()
                * 1e-6
            )
            for c in range(centers_arr.shape[0]):
                m = np.where(cell == c)[0]
                if len(m) < 2:
                    continue
                P = (V[m] @ V[m].T) / np.outer(n[m], n[m])
                iu = np.triu_indices(len(m), k=1)
                pc = P[iu]
                tau = min(tau, np.abs(pc - SEMDEDUP_TAU).min())
                bnd = min(
                    bnd,
                    np.abs(np.abs(pc * 1e6 - np.floor(pc * 1e6)) - 0.5).min()
                    * 1e-6,
                )
                dup = np.round(pc, 6) >= SEMDEDUP_TAU
                if dup.any():
                    ca = np.round(csim[m[iu[0][dup]]], 6)
                    cb = np.round(csim[m[iu[1][dup]]], 6)
                    d = np.abs(ca - cb)
                    d = d[d > 0]
                    if len(d):
                        loser = min(loser, d.min())
            return tau, loser, bnd

        sd_tau, sd_loser, boundary = semdedup_margins(C)
        from fsc_etl_spark.plans.oracles_training import _replicated_train_codebook

        TCB = np.array(_replicated_train_codebook(f"/root/testdata/{sf}", 16, 2))
        tr_tau, tr_loser, tr_boundary = semdedup_margins(TCB)

        # Round-10 DATA-GROWN codebook (k = clamp(n/512, 8, 1024)) —
        # the blocking key of the re-blocked dedup_embed_neardup /
        # embed_nn_within_label driver oracles: assignment argmax gap,
        # tau gap on within-cell pair cosines (threshold 0.30), and
        # 6dp round-boundary proximity of pair cosines (NN ranking
        # ties on equal ROUNDED values break on vec_id, so only
        # boundary proximity can fork engines).
        from fsc_etl_spark.operators.clustering import scaled_codebook_size

        k_sc = scaled_codebook_size(len(V))
        SCB = np.array(
            _replicated_train_codebook(f"/root/testdata/{sf}", k_sc, 2)
        )
        sc_S = V @ SCB.T / n[:, None] - (0.5 * (SCB * SCB).sum(axis=1))[None, :]
        sc_Ss = np.sort(sc_S, axis=1)[:, ::-1]
        scaled_assign = (sc_Ss[:, 0] - sc_Ss[:, 1]).min()
        sc_tau, _sc_loser, sc_bnd = semdedup_margins(SCB)

        # Round-13 MaxSim late interaction: every (query subvector,
        # doc subvector) cosine feeds a 6dp ROUND before the MAX /
        # micro-sum (both of which act on exact rounded values, so
        # boundary proximity is the only cross-engine fork risk;
        # score ties at the top-5 cutoff break on vec_id).
        subdim = 16
        maxsim_bnd = np.inf
        for s in range(4):
            Qs = V[qmask][:, s * subdim : (s + 1) * subdim]
            qn_ = np.sqrt((Qs * Qs).sum(axis=1))
            for s2 in range(4):
                Cs = V[:, s2 * subdim : (s2 + 1) * subdim]
                cn_ = np.sqrt((Cs * Cs).sum(axis=1))
                pc = (Qs @ Cs.T) / np.outer(qn_, cn_)
                maxsim_bnd = min(
                    maxsim_bnd,
                    np.abs(np.abs(pc * 1e6 - np.floor(pc * 1e6)) - 0.5).min()
                    * 1e-6,
                )

        for tier, margin, floor in [
            ("lsh_sign", lsh_margin, FLOOR),
            ("maxsim_round_boundary", maxsim_bnd, BOUNDARY_FLOOR),
            ("ivf_assign", ivf_assign, FLOOR),
            ("ivf_probe", ivf_probe, FLOOR),
            ("trained_ivf_assign", trained_ivf_assign, FLOOR),
            ("trained_ivf_probe", trained_ivf_probe, FLOOR),
            ("trained_pq_encode", trained_pq_enc, FLOOR),
            ("trained_pq_adc_cutoff", trained_pq_cut, FLOOR),
            ("pq_encode", pq_enc, FLOOR),
            ("pq_adc_cutoff", pq_cut, FLOOR),
            ("semdedup_tau", sd_tau, FLOOR),
            ("semdedup_loser", sd_loser, FLOOR),
            ("semdedup_round_boundary", boundary, BOUNDARY_FLOOR),
            ("trained_semdedup_tau", tr_tau, FLOOR),
            ("trained_semdedup_loser", tr_loser, FLOOR),
            ("trained_semdedup_round_boundary", tr_boundary, BOUNDARY_FLOOR),
            (f"scaled_k{k_sc}_assign", scaled_assign, FLOOR),
            (f"scaled_k{k_sc}_tau", sc_tau, FLOOR),
            (f"scaled_k{k_sc}_round_boundary", sc_bnd, BOUNDARY_FLOOR),
        ]:
            ok = margin >= floor or margin == np.inf
            print(f"{'PASS' if ok else 'FAIL'} {sf} {tier}: {margin:.3e}")
            if not ok:
                bad.append((sf, tier, margin))
    print(f"margin audit: {len(bad)} below floor")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
