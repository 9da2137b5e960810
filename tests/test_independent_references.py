"""Independent (non-twin) Python reference reimplementations for the
window/frame-heavy queries (VERDICT r6 Next-round #3).

The hash-oracle gate compares Spark against a DuckDB SQL twin — and a
twin TRANSLATED from the same window expressions hash-matches the
Spark plan's bugs (the r6 winnow_fingerprints lesson: a frame-mixing
bug shipped hash-green because the oracle shared it). Each test here
recomputes the query from its published DEFINITION in plain Python
over the raw fixture rows — different mechanism, different code path,
no Spark/DuckDB window machinery — and requires exact agreement.

Pattern follows tests/test_round2_curation.py::
test_winnow_fingerprints_against_reference.
"""

from __future__ import annotations

import hashlib
import re
from decimal import ROUND_HALF_UP, Decimal

from fsc_etl_spark.plans.analytics_ext import QUERIES as EXT_QUERIES
from fsc_etl_spark.plans.analytics_more import QUERIES as MORE_QUERIES
from fsc_etl_spark.plans.spark4_ops import QUERIES as S4_QUERIES
from fsc_etl_spark.plans.training_data import QUERIES as TD_QUERIES
from fsc_etl_spark.sources.readers import read_parquet_table


def _toks(text: str) -> list[str]:
    return [x for x in re.split(r"\s+", text.strip()) if x]


def _us(delta) -> int:
    """Exact microseconds of a timedelta (no float round-trip)."""
    return (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds


def test_dup_span_stats_against_reference(spark, sf_smoke):
    """Lee et al. 2022 maximal duplicated spans, recomputed with plain
    dict counting + linear run scanning (no islands trick, no windows):
    16-token segments, a segment is duplicated when its md5 occurs >= 2
    times corpus-wide, consecutive duplicated segments merge into
    maximal spans."""
    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "doc_id", "text"
    ).collect()
    seg_of = {}
    occ: dict[str, int] = {}
    for d in docs:
        tk = _toks(d.text)
        if not tk:
            continue
        hs = [
            hashlib.md5(" ".join(tk[i : i + 16]).encode()).hexdigest()
            for i in range(0, len(tk), 16)
        ]
        seg_of[d.doc_id] = hs
        for h in hs:
            occ[h] = occ.get(h, 0) + 1
    expect = {}
    for doc_id, hs in seg_of.items():
        dup = [occ[h] >= 2 for h in hs]
        spans: list[int] = []
        run = 0
        for f in dup:
            if f:
                run += 1
            elif run:
                spans.append(run)
                run = 0
        if run:
            spans.append(run)
        n_dup = sum(dup)
        expect[doc_id] = (
            len(hs),
            n_dup,
            len(spans),
            max(spans, default=0),
            (1_000_000 * n_dup) // len(hs),
        )
    got = {
        r.doc_id: (
            r.n_segments,
            r.n_dup_segments,
            r.n_spans,
            r.max_span_segments,
            r.dup_ppm,
        )
        for r in TD_QUERIES["dup_span_stats"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_session_window_stats_against_reference(spark, sf_smoke):
    """session_window(ts, 30 min) recomputed as a plain per-user sorted
    sweep: a new session starts when the gap since the previous event
    is >= 30 minutes exactly; session_start = first event ts; value
    sums in exact cents (2dp HALF_UP, the double->decimal(18,2) cast
    rule)."""
    ev = read_parquet_table(spark, sf_smoke, "events").select(
        "user_id", "ts", "event_id", "value"
    ).collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    expect = {}
    cent = Decimal("0.01")
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        start = None
        cur = []
        sessions = []
        for r in rows:
            if cur and _us(r.ts - cur[-1].ts) < 30 * 60 * 1_000_000:
                cur.append(r)
            else:
                if cur:
                    sessions.append(cur)
                cur = [r]
        if cur:
            sessions.append(cur)
        for s in sessions:
            cents = sum(
                int(
                    Decimal(repr(r.value)).quantize(cent, ROUND_HALF_UP) * 100
                )
                for r in s
            )
            expect[(uid, s[0].ts)] = (len(s), cents)
    got = {
        (r.user_id, r.session_start): (r.n_events, r.sum_cents)
        for r in S4_QUERIES["session_window_stats"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_scd2_user_value_history_against_reference(spark, sf_smoke):
    """SCD2 validity intervals recomputed with a plain dict-of-days
    pass: per (user, day) the value of the (ts, event_id)-max event;
    days sort ascending; valid_to = next day with an event, open-ended
    (NULL + is_current) on the last."""
    ev = read_parquet_table(spark, sf_smoke, "events").select(
        "user_id", "ts", "event_id", "value"
    ).collect()
    last: dict[tuple, tuple] = {}
    for r in ev:
        key = (r.user_id, r.ts.date())
        mark = (r.ts, r.event_id)
        if key not in last or mark > last[key][0]:
            last[key] = (mark, r.value)
    expect = {}
    days_by_user: dict[int, list] = {}
    for (uid, day) in last:
        days_by_user.setdefault(uid, []).append(day)
    for uid, days in days_by_user.items():
        days.sort()
        for i, day in enumerate(days):
            nxt = days[i + 1] if i + 1 < len(days) else None
            expect[(uid, day)] = (nxt, last[(uid, day)][1], nxt is None)
    got = {
        (r.user_id, r.valid_from): (r.valid_to, r.value, r.is_current)
        for r in MORE_QUERIES["scd2_user_value_history"](
            spark, sf_smoke
        ).collect()
    }
    assert got == expect


def test_event_burst_islands_against_reference(spark, sf_smoke):
    """Gaps-and-islands recomputed as a plain per-user sorted sweep:
    events < 10 minutes apart merge into a burst; report burst count,
    largest burst, and bursts of >= 3 events."""
    ev = read_parquet_table(spark, sf_smoke, "events").select(
        "user_id", "ts", "event_id"
    ).collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    expect = {}
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        sizes = []
        for i, r in enumerate(rows):
            if i and _us(r.ts - rows[i - 1].ts) < 600 * 1_000_000:
                sizes[-1] += 1
            else:
                sizes.append(1)
        expect[uid] = (len(sizes), max(sizes), sum(1 for s in sizes if s >= 3))
    got = {
        r.user_id: (r.n_bursts, r.max_burst, r.n_bursts_3plus)
        for r in EXT_QUERIES["event_burst_islands"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_decile_bucket_scalable_against_reference(spark, sf_smoke):
    """NTILE(10) deciles recomputed by LITERALLY sorting the rows and
    slicing them into buckets (the definition: first N mod 10 buckets
    take floor(N/10)+1 rows, the rest floor(N/10)) — no rank
    decomposition, no histogram, no windows."""
    cust = read_parquet_table(spark, sf_smoke, "customer").select(
        "c_custkey", "c_acctbal"
    ).collect()
    rows = sorted(cust, key=lambda r: (r.c_acctbal, r.c_custkey))
    n = len(rows)
    q, rem = divmod(n, 10)
    expect = {}
    pos = 0
    for b in range(1, 11):
        size = q + 1 if b <= rem else q
        if size == 0:
            continue
        chunk = rows[pos : pos + size]
        pos += size
        bals = [r.c_acctbal for r in chunk]
        expect[b] = (len(chunk), min(bals), max(bals))
    got = {
        r.decile: (r.n, r.min_bal, r.max_bal)
        for r in MORE_QUERIES["decile_bucket_scalable"](
            spark, sf_smoke
        ).collect()
    }
    assert got == expect


def test_pps_token_sample_against_reference(spark, sf_smoke):
    """Systematic PPS recomputed as a literal sequential sweep over
    the doc_id-ordered weights (exclusive prefix sum + stride
    gridpoint counting) — no Spark windows, no bucket decomposition,
    no DuckDB. Pins both the draw set and the multiplicities."""
    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "doc_id", "text"
    ).collect()
    rows = sorted((d.doc_id, len(_toks(d.text))) for d in docs)
    total = sum(w for _, w in rows)
    stride = max(total // 50, 1)
    expect = {}
    cb = 0
    for doc_id, w in rows:
        hits = (cb + w) // stride - cb // stride
        if hits >= 1:
            expect[doc_id] = (w, hits)
        cb += w
    got = {
        r.doc_id: (r.n_tokens, r.n_hits)
        for r in TD_QUERIES["pps_token_sample"](spark, sf_smoke).collect()
    }
    assert got == expect and len(got) > 0


def _cents(v) -> int:
    return int(Decimal(repr(v)).quantize(Decimal("0.01"), ROUND_HALF_UP) * 100)


def test_ewma_user_value_against_reference(spark, sf_smoke):
    """Integer EWMA (alpha = 1/2) recomputed as a plain Python loop
    over each user's (ts, event_id)-sorted cents — s1 = v1,
    st = (s(t-1) + vt) >> 1 (arithmetic shift = floor, including
    negatives). No fold packing, no arrays, no SQL."""
    from fsc_etl_spark.plans.scale_ops import QUERIES as SCALE_QUERIES

    ev = read_parquet_table(spark, sf_smoke, "events").select(
        "user_id", "ts", "event_id", "value"
    ).collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    expect = {}
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        acc = _cents(rows[0].value)
        for r in rows[1:]:
            acc = (acc + _cents(r.value)) >> 1
        expect[uid] = (len(rows), acc)
    got = {
        r.user_id: (r.n_events, r.ewma_cents)
        for r in SCALE_QUERIES["ewma_user_value"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_holt_user_forecast_against_reference(spark, sf_smoke):
    """Holt double-exponential smoothing (alpha = beta = 1/2)
    recomputed as a plain Python two-variable loop — l1 = v1, b1 = 0,
    lt = (v + l + b) >> 1, bt = ((lt - l) + b) >> 1 — with NO state
    packing, exercising the packed-BIGINT fold against the raw
    recurrence definition."""
    from fsc_etl_spark.plans.scale_ops import QUERIES as SCALE_QUERIES

    ev = read_parquet_table(spark, sf_smoke, "events").select(
        "user_id", "ts", "event_id", "value"
    ).collect()
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    expect = {}
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        l, b = _cents(rows[0].value), 0
        for r in rows[1:]:
            nl = (_cents(r.value) + l + b) >> 1
            b = ((nl - l) + b) >> 1
            l = nl
        expect[uid] = (len(rows), l, b, l + b)
    got = {
        r.user_id: (r.n_events, r.level_cents, r.trend_cents, r.forecast_cents)
        for r in SCALE_QUERIES["holt_user_forecast"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_skyline_orders_against_reference(spark, sf_smoke):
    """2-D Pareto frontier recomputed by the textbook O(n log n)
    sweep: collapse to (price -> max date), sort by price, keep a
    point iff every strictly cheaper price has a strictly earlier
    date. No range partitioning, no windows."""
    from decimal import Decimal as D

    from fsc_etl_spark.plans.scale_ops import QUERIES as SCALE_QUERIES

    orders = read_parquet_table(spark, sf_smoke, "orders").select(
        "o_totalprice", "o_orderdate"
    ).collect()
    import datetime as dt

    best: dict = {}
    for r in orders:
        p = D(str(r.o_totalprice)).quantize(D("0.01"))
        # the query casts to DATE; the raw column reads as a midnight
        # timestamp
        d = (
            r.o_orderdate.date()
            if isinstance(r.o_orderdate, dt.datetime)
            else r.o_orderdate
        )
        if p not in best or d > best[p]:
            best[p] = d
    expect = set()
    prefix_max = None
    for p in sorted(best):
        d = best[p]
        if prefix_max is None or d > prefix_max:
            expect.add((float(p), d))
        prefix_max = d if prefix_max is None or d > prefix_max else prefix_max
    got = {
        (r.price, r.odate)
        for r in SCALE_QUERIES["skyline_orders"](spark, sf_smoke).collect()
    }
    assert got == expect and len(got) > 0


def test_event_pattern_match_against_reference(spark, sf_smoke):
    """MATCH_RECOGNIZE-style sequence stats recomputed with plain
    Python string building + re over each user's (ts, event_id)-sorted
    event codes."""
    ev = read_parquet_table(spark, sf_smoke, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    code = {"signup": "s", "view": "v", "click": "c", "purchase": "p"}
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    expect = {}
    for uid, rows in by_user.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        s = "".join(code.get(r.event_type, "e") for r in rows)
        expect[uid] = (
            len(s),
            re.search("s.*p", s) is not None,
            s.count("cp"),  # non-overlapping, same as regexp_count
        )
    got = {
        r.user_id: (r.n_events, r.signup_then_purchase, r.n_click_to_buy)
        for r in EXT_QUERIES["event_pattern_match"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_mixture_temperature_sample_against_reference(spark, sf_smoke):
    """Temperature-2 mixture keep-rule recomputed with plain Python
    integers: h = 28 md5 bits of the doc id, keep iff
    h^2 * n_src < n_min * 2^56."""
    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "doc_id", "source"
    ).collect()
    n_src: dict[str, int] = {}
    for d in docs:
        n_src[d.source] = n_src.get(d.source, 0) + 1
    n_min = min(n_src.values())
    kept: dict[str, int] = {s: 0 for s in n_src}
    for d in docs:
        h = int(hashlib.md5(str(d.doc_id).encode()).hexdigest()[:7], 16)
        if h * h * n_src[d.source] < n_min * 2**56:
            kept[d.source] += 1
    expect = {s: (n_src[s], kept[s]) for s in n_src}
    got = {
        r.source: (r.n_src, r.n_kept)
        for r in TD_QUERIES["mixture_temperature_sample"](
            spark, sf_smoke
        ).collect()
    }
    assert got == expect


def test_token_budget_schedule_against_reference(spark, sf_smoke):
    """Token-budget epoch scheduling recomputed with plain Python
    integer arithmetic: even split with name-ordered remainder, then
    full/partial epochs per source."""
    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "source", "text"
    ).collect()
    stats: dict[str, list[int]] = {}
    for d in docs:
        s = stats.setdefault(d.source, [0, 0])
        s[0] += 1
        s[1] += len(_toks(d.text))
    budget = 200_000
    names = sorted(stats)
    n = len(names)
    expect = {}
    for rk, src in enumerate(names, start=1):
        share = budget // n + (1 if rk <= budget % n else 0)
        n_docs, avail = stats[src]
        expect[src] = (n_docs, avail, share, share // avail, share % avail)
    got = {
        r.source: (
            r.n_docs,
            r.avail_tokens,
            r.budget_tokens,
            r.full_epochs,
            r.partial_tokens,
        )
        for r in TD_QUERIES["token_budget_schedule"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_dup_span_trim_stats_against_reference(spark, sf_smoke):
    """Keep-first trim accounting recomputed with a plain global dict
    pass in (doc_id, seg_idx) order: first corpus-wide occurrence of a
    16-token segment survives, the rest are removed; token sums use
    the exact final-segment length. Also checks the conservation law
    kept + removed == n_tokens."""
    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "doc_id", "text"
    ).collect()
    per_doc: dict[int, list] = {}
    for d in docs:
        tk = _toks(d.text)
        if tk:
            per_doc[d.doc_id] = tk
    seen: set[str] = set()
    expect = {}
    for doc_id in sorted(per_doc):
        tk = per_doc[doc_id]
        n = len(tk)
        n_segs = -(-n // 16)
        removed = 0
        kept_tokens = 0
        for i in range(n_segs):
            h = hashlib.md5(" ".join(tk[i * 16 : i * 16 + 16]).encode()).hexdigest()
            seg_tokens = min(16, n - i * 16)
            if h in seen:
                removed += 1
            else:
                seen.add(h)
                kept_tokens += seg_tokens
        expect[doc_id] = (
            n,
            n_segs,
            removed,
            kept_tokens,
            (1_000_000 * (n - kept_tokens)) // n,
        )
    got = {}
    for r in TD_QUERIES["dup_span_trim_stats"](spark, sf_smoke).collect():
        assert r.kept_tokens <= r.n_tokens
        got[r.doc_id] = (
            r.n_tokens,
            r.n_segments,
            r.n_removed_segments,
            r.kept_tokens,
            r.trim_ppm,
        )
    assert got == expect


def test_dsir_importance_weights_against_reference(spark, sf_smoke):
    """DSIR recomputed with plain Python dicts + math.log: hashed
    unigram/bigram bucket counts, Laplace-smoothed micro-nat scores
    (floor(1e6*ln), the one float op — its floor-boundary margin is
    separately audited), exact integer per-doc sums. No Spark
    aggregation, no DuckDB."""
    import math

    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "doc_id", "lang", "text"
    ).collect()
    B = 64
    grams_of: dict[int, list[int]] = {}
    r_b = [0] * B
    t_b = [0] * B
    for d in docs:
        tk = _toks(d.text.lower())
        gs = tk + [f"{a} {b}" for a, b in zip(tk, tk[1:])]
        buckets = [
            int(hashlib.md5(g.encode()).hexdigest()[:4], 16) % B for g in gs
        ]
        grams_of[d.doc_id] = buckets
        for b in buckets:
            r_b[b] += 1
            if d.lang == "en":
                t_b[b] += 1
    r_tot, t_tot = float(sum(r_b)), float(sum(t_b))
    score = [
        int(
            math.floor(
                1e6
                * math.log(
                    ((t_b[b] + 1.0) * (r_tot + float(B)))
                    / ((r_b[b] + 1.0) * (t_tot + float(B)))
                )
            )
        )
        for b in range(B)
    ]
    expect = {}
    for d in docs:
        buckets = grams_of[d.doc_id]
        s = sum(score[b] for b in buckets)
        expect[d.doc_id] = (d.lang, len(buckets), s, s >= 0)
    got = {
        r.doc_id: (r.lang, r.n_grams, r.dsir_score_e6, r.kept)
        for r in TD_QUERIES["dsir_importance_weights"](
            spark, sf_smoke
        ).collect()
    }
    assert got == expect


def _semdedup_numpy(sf_smoke, centers):
    """Shared numpy recomputation of assignment/csim/pairs for the
    semdedup/knn independent tests: dense matmuls + python loops —
    no SQL joins, no Spark windows."""
    import duckdb
    import numpy as np

    con = duckdb.connect()
    try:
        rows = con.execute(
            f"SELECT vec_id, label, embedding FROM "
            f"read_parquet('{sf_smoke}/embeddings.parquet') ORDER BY vec_id"
        ).fetchall()
    finally:
        con.close()
    ids = np.array([r[0] for r in rows])
    labels = np.array([r[1] for r in rows])
    V = np.array([r[2] for r in rows], dtype="float64")
    n = np.sqrt((V * V).sum(axis=1))
    C = np.array(centers, dtype="float64")
    half = np.array([sum(x * x for x in c) / 2.0 for c in centers])
    cnorm = np.array(
        [__import__("math").sqrt(sum(x * x for x in c)) for c in centers]
    )
    S = V @ C.T / n[:, None] - half[None, :]
    cell = S.argmax(axis=1)
    csim6 = np.round(
        (V @ C.T / n[:, None] / cnorm[None, :])[np.arange(len(V)), cell], 6
    )
    return ids, labels, V, n, cell, csim6


def test_semdedup_prune_numpy_reference(spark, sf_smoke):
    """SemDeDup at the pinned 8-cell codebook recomputed densely in
    numpy + python loops (no cell-blocked joins, no distinct): same
    kept set, cells and 6dp centroid sims as the Spark operator."""
    import numpy as np

    from fsc_etl_spark.plans.training_data import IVF_PINNED_CENTROIDS

    ids, labels, V, n, cell, csim6 = _semdedup_numpy(
        sf_smoke, IVF_PINNED_CENTROIDS
    )
    losers = set()
    for c in set(cell.tolist()):
        m = np.where(cell == c)[0]
        P = np.round((V[m] @ V[m].T) / np.outer(n[m], n[m]), 6)
        for i in range(len(m)):
            for j in range(i + 1, len(m)):
                if P[i, j] >= 0.30:
                    a, b = m[i], m[j]
                    if (csim6[a], ids[a]) > (csim6[b], ids[b]):
                        losers.add(int(ids[a]))
                    else:
                        losers.add(int(ids[b]))
    expect = {
        int(ids[i]): (
            int(cell[i]),
            int(round(csim6[i] * 1e6)),
            int(ids[i]) not in losers,
        )
        for i in range(len(ids))
    }
    got = {
        r.vec_id: (r.cell, int(round(r.centroid_sim * 1e6)), r.kept)
        for r in TD_QUERIES["embed_semdedup_prune"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_knn_label_audit_numpy_reference(spark, sf_smoke):
    """The kNN label audit at the pinned 8-cell codebook recomputed
    densely in numpy + python sorts: 3-NN by (6dp cos DESC, id ASC)
    within the cell, majority by (count DESC, label ASC)."""
    import numpy as np

    from fsc_etl_spark.plans.training_data import IVF_PINNED_CENTROIDS

    ids, labels, V, n, cell, _ = _semdedup_numpy(
        sf_smoke, IVF_PINNED_CENTROIDS
    )
    expect = {}
    for c in set(cell.tolist()):
        m = np.where(cell == c)[0]
        P = np.round((V[m] @ V[m].T) / np.outer(n[m], n[m]), 6)
        for i in range(len(m)):
            others = [(float(-P[i, j]), int(ids[m[j]]), int(labels[m[j]]))
                      for j in range(len(m)) if j != i]
            others.sort()
            top = others[:3]
            n_nbrs = len(top)
            own = int(labels[m[i]])
            n_agree = sum(1 for _, _, lb in top if lb == own)
            if top:
                cnt: dict[int, int] = {}
                for _, _, lb in top:
                    cnt[lb] = cnt.get(lb, 0) + 1
                knn_label = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            else:
                knn_label = None
            expect[int(ids[m[i]])] = (
                int(c),
                own,
                n_nbrs,
                n_agree,
                knn_label,
                knn_label == own if knn_label is not None else False,
            )
    got = {
        r.vec_id: (r.cell, r.label, r.n_nbrs, r.n_agree, r.knn_label, r.consistent)
        for r in TD_QUERIES["embed_knn_label_audit"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_cms_topk_users_against_reference(spark, sf_smoke):
    """Count-min sketch recomputed with plain Python dicts: d=4 md5
    rows x w=64 counters built from the raw rows, estimate = min of
    the key's 4 cells, exact counts beside, top-20 by (est DESC,
    user ASC)."""
    from fsc_etl_spark.plans.scale_ops import QUERIES as SCALE_QUERIES

    ev = read_parquet_table(spark, sf_smoke, "events").select(
        "user_id"
    ).collect()
    counters: dict[tuple[int, int], int] = {}
    exact: dict[int, int] = {}
    def cell(j, uid):
        return int(
            hashlib.md5(f"cms{j}:{uid}".encode()).hexdigest()[:15], 16
        ) % 64
    for r in ev:
        exact[r.user_id] = exact.get(r.user_id, 0) + 1
        for j in range(4):
            k = (j, cell(j, r.user_id))
            counters[k] = counters.get(k, 0) + 1
    rows = [
        (uid, min(counters.get((j, cell(j, uid)), 0) for j in range(4)), c)
        for uid, c in exact.items()
    ]
    rows.sort(key=lambda t: (-t[1], t[0]))
    expect = rows[:20]
    got = [
        (r.user_id, r.est_cnt, r.exact_cnt)
        for r in SCALE_QUERIES["cms_topk_users"](spark, sf_smoke).collect()
    ]
    assert got == expect
    assert all(est >= c for _, est, c in got)  # CMS never undercounts


def test_hll_estimate_users_against_reference(spark, sf_smoke):
    """HyperLogLog registers + raw estimate recomputed in plain
    Python: p=6 (64 buckets), 60-bit md5 hashes, rank = leading zeros
    of the 54 rank bits + 1, harmonic fold in bucket order with exact
    dyadic 2^-reg terms — the float estimate must match BIT-FOR-BIT
    (same IEEE additions in the same sequence)."""
    from fsc_etl_spark.plans.scale_ops import QUERIES as SCALE_QUERIES

    ev = read_parquet_table(spark, sf_smoke, "events").select(
        "user_id"
    ).collect()
    regs: dict[int, int] = {}
    users = set()
    for r in ev:
        users.add(r.user_id)
        h = int(hashlib.md5(str(r.user_id).encode()).hexdigest()[:15], 16)
        bucket, v = h % 64, h // 64
        rank = 55 if v == 0 else 54 - v.bit_length() + 1
        regs[bucket] = max(regs.get(bucket, 0), rank)
    acc = 0.0
    for b in sorted(regs):
        acc = acc + 2.0 ** (-float(regs[b]))
    harmonic = acc + float(64 - len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / 64.0)
    est = alpha * 64 * 64 / harmonic
    [r] = SCALE_QUERIES["hll_estimate_users"](spark, sf_smoke).collect()
    assert (r.n_exact, r.n_used_buckets) == (len(users), len(regs))
    assert r.harmonic_sum == harmonic and r.hll_estimate == est


def test_heavy_hitter_users_against_reference(spark, sf_smoke):
    """Exact phi-heavy hitters recomputed by brute-force counting:
    users with 5*U*cnt >= 6*N (phi = 6/(5*U) as an exact rational) —
    no pigeonhole, no partition phase."""
    from fsc_etl_spark.plans.scale_ops import QUERIES as SCALE_QUERIES

    ev = read_parquet_table(spark, sf_smoke, "events").select(
        "user_id"
    ).collect()
    cnt: dict[int, int] = {}
    for r in ev:
        cnt[r.user_id] = cnt.get(r.user_id, 0) + 1
    n, u = len(ev), len(cnt)
    expect = {uid: c for uid, c in cnt.items() if 5 * u * c >= 6 * n}
    got = {
        r.user_id: r.cnt
        for r in SCALE_QUERIES["heavy_hitter_users"](spark, sf_smoke).collect()
    }
    assert got == expect


def _minhash_lsh_pairs_python(docs):
    """Plain-Python replication of the minhash(k=8)/LSH(4x2) candidate
    pair construction shared by the dedup cluster queries."""
    sigs = {}
    for d in docs:
        tk = _toks(d.text.lower())
        if len(tk) < 3:
            continue
        shingles = [" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)]
        mh = []
        for j in range(4):
            hexes = [
                hashlib.md5(f"s{j}:{s}".encode()).hexdigest() for s in shingles
            ]
            mh.append(min(h[:16] for h in hexes))
            mh.append(min(h[16:32] for h in hexes))
        sigs[d.doc_id] = mh
    buckets: dict[tuple[int, str], list[int]] = {}
    for doc_id, mh in sigs.items():
        for b in range(4):
            sig = hashlib.md5(f"{mh[2*b]}|{mh[2*b+1]}".encode()).hexdigest()
            buckets.setdefault((b, sig), []).append(doc_id)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.add((ids[i], ids[j]))
    return pairs


def test_dedup_cluster_assign_star_union_find_reference(spark, sf_smoke):
    """Connected components recomputed with textbook UNION-FIND over
    plain-Python-replicated minhash/LSH candidate pairs — a genuinely
    different mechanism from both the large-star/small-star rounds and
    the recursive-CTE oracle."""
    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "doc_id", "text"
    ).collect()
    parent: dict[int, int] = {d.doc_id: d.doc_id for d in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in _minhash_lsh_pairs_python(docs):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {d.doc_id: find(d.doc_id) for d in docs}
    got = {
        r.doc_id: r.cluster_root
        for r in TD_QUERIES["dedup_cluster_assign_star"](
            spark, sf_smoke
        ).collect()
    }
    assert got == expect


def test_pagerank_copurchase_against_reference(spark, sf_smoke):
    """Integer PageRank recomputed with plain Python dicts over the
    symmetrized co-purchase graph: 5 rounds of
    rank'(v) = base + (85 * sum(rank(u) div deg(u))) div 100 in exact
    integers, top-20 by (rank DESC, label ASC). No Pregel joins, no
    unrolled CTEs."""
    from fsc_etl_spark.plans.graph_ops import QUERIES as GRAPH_QUERIES

    orders = read_parquet_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_custkey"
    ).collect()
    li = read_parquet_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    cust_of: dict[int, int] = {o.o_orderkey: o.o_custkey for o in orders}
    cp = set()
    for r in li:
        c = cust_of.get(r.l_orderkey)
        if c is not None:
            cp.add((2 * c, 2 * r.l_partkey + 1))
    adj: dict[int, list[int]] = {}
    for a, b in cp:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    scale = 10**9
    base = ((100 - 85) * scale) // 100
    rank = {v: scale for v in adj}
    for _ in range(5):
        contrib = {v: rank[v] // len(adj[v]) for v in adj}
        rank = {
            v: base + (85 * sum(contrib[u] for u in adj[v])) // 100
            for v in adj
        }
    label = {
        v: (f"c{v // 2}" if v % 2 == 0 else f"p{(v - 1) // 2}") for v in adj
    }
    top = sorted(
        ((label[v], rank[v]) for v in adj), key=lambda t: (-t[1], t[0])
    )[:20]
    got = [
        (r.node, r.rank)
        for r in GRAPH_QUERIES["pagerank_copurchase"](spark, sf_smoke).collect()
    ]
    assert got == top


def test_embed_lsh_topk_numpy_reference(spark, sf_smoke):
    """Multi-table LSH ANN recomputed densely in numpy + python sets:
    signature = 4-bit sign pattern per table, candidates = corpus
    vectors sharing any table's signature with the query, exact
    re-rank by (6dp cos DESC, id ASC)."""
    import duckdb
    import numpy as np

    from fsc_etl_spark.plans.training_data import LSH_TABLES

    con = duckdb.connect()
    try:
        rows = con.execute(
            f"SELECT vec_id, embedding FROM "
            f"read_parquet('{sf_smoke}/embeddings.parquet') ORDER BY vec_id"
        ).fetchall()
    finally:
        con.close()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype="float64")
    n = np.sqrt((V * V).sum(axis=1))
    H = np.array(LSH_TABLES)  # (12, 4, 64)
    S = (V @ H.reshape(-1, 64).T >= 0).reshape(len(V), 12, 4)
    sigs = (S * (2 ** np.arange(4))).sum(axis=2)  # (N, 12)
    expect = []
    for qi in np.where(ids < 5)[0]:
        cand = set()
        for t in range(12):
            cand.update(
                int(ids[i])
                for i in np.where(sigs[:, t] == sigs[qi, t])[0]
                if ids[i] != ids[qi]
            )
        scored = sorted(
            (
                (
                    -round(
                        float(V[qi] @ V[list(ids).index(c)] )
                        / (n[qi] * n[list(ids).index(c)]),
                        6,
                    ),
                    c,
                )
                for c in cand
            ),
        )[:5]
        for rk, (negcos, c) in enumerate(scored, start=1):
            expect.append((int(ids[qi]), c, int(round(-negcos * 1e6)), rk))
    got = [
        (r.query_id, r.vec_id, int(round(r.cos * 1e6)), r.rank)
        for r in TD_QUERIES["embed_lsh_topk"](spark, sf_smoke).collect()
    ]
    assert sorted(got) == sorted(expect) and len(got) > 0


def _load_vecs(sf_smoke):
    import duckdb
    import numpy as np

    con = duckdb.connect()
    try:
        rows = con.execute(
            f"SELECT vec_id, embedding FROM "
            f"read_parquet('{sf_smoke}/embeddings.parquet') ORDER BY vec_id"
        ).fetchall()
    finally:
        con.close()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype="float64")
    return ids, V, np.sqrt((V * V).sum(axis=1))


def _ivf_numpy(ids, V, n, centers, nprobe):
    """Dense-numpy IVF: assignment/probing by dot/|x| - |c|^2/2 with
    lowest-cell ties, exact re-rank by (6dp cos DESC, id ASC)."""
    import numpy as np

    C = np.array(centers, dtype="float64")
    half = np.array([sum(x * x for x in c) / 2.0 for c in centers])
    S = V @ C.T / n[:, None] - half[None, :]
    cell = S.argmax(axis=1)
    expect = []
    for qi in np.where(ids < 5)[0]:
        order = sorted(range(C.shape[0]), key=lambda c: (-S[qi, c], c))
        probed = set(order[:nprobe])
        cand = [
            i
            for i in range(len(ids))
            if cell[i] in probed and ids[i] != ids[qi]
        ]
        scored = sorted(
            (
                (-round(float(V[qi] @ V[i]) / (n[qi] * n[i]), 6), int(ids[i]))
                for i in cand
            )
        )[:5]
        for rk, (negcos, c) in enumerate(scored, start=1):
            expect.append((int(ids[qi]), c, int(round(-negcos * 1e6)), rk))
    return expect


def _pq_numpy(ids, V, n, codebooks, refine_pool):
    """Dense-numpy PQ/ADC: encode argmax per subspace (lowest code on
    ties), LUT scoring, refine pool by (adc DESC, id ASC), exact
    re-rank by (6dp cos DESC, id ASC)."""
    import numpy as np

    B = np.array(codebooks, dtype="float64")  # (8, n_codes, sub)
    n_sub, _, sub = B.shape
    half = np.array(
        [[sum(x * x for x in cent) / 2.0 for cent in book] for book in codebooks]
    )
    codes = np.empty((len(V), n_sub), dtype=int)
    for s in range(n_sub):
        sc = V[:, s * sub : (s + 1) * sub] @ B[s].T / n[:, None] - half[s][None, :]
        codes[:, s] = sc.argmax(axis=1)
    expect = []
    for qi in np.where(ids < 5)[0]:
        lut = np.stack(
            [V[qi, s * sub : (s + 1) * sub] @ B[s].T / n[qi] for s in range(n_sub)]
        )
        adc = lut[np.arange(n_sub)[None, :], codes].sum(axis=1)
        cand = [i for i in range(len(ids)) if ids[i] != ids[qi]]
        pool = sorted(cand, key=lambda i: (-adc[i], ids[i]))[:refine_pool]
        scored = sorted(
            (
                (-round(float(V[qi] @ V[i]) / (n[qi] * n[i]), 6), int(ids[i]))
                for i in pool
            )
        )[:5]
        for rk, (negcos, c) in enumerate(scored, start=1):
            expect.append((int(ids[qi]), c, int(round(-negcos * 1e6)), rk))
    return expect


def test_ivf_tiers_numpy_reference(spark, sf_smoke):
    """Both IVF tiers — pinned (8 seeded centroids, nprobe=5) and
    Lloyd-trained (replicated codebook, nprobe=4) — recomputed densely
    in numpy + python sorts, no joins or windows."""
    from fsc_etl_spark.plans.oracles_training import _replicated_quantizers
    from fsc_etl_spark.plans.training_data import (
        IVF_PINNED_CENTROIDS,
        QUERIES,
    )

    ids, V, n = _load_vecs(sf_smoke)
    for qname, centers, nprobe in (
        ("embed_ivf_pinned_topk", IVF_PINNED_CENTROIDS, 5),
        ("embed_ivf_topk", _replicated_quantizers(sf_smoke)[0], 4),
    ):
        expect = _ivf_numpy(ids, V, n, centers, nprobe)
        got = [
            (r.query_id, r.vec_id, int(round(r.cos * 1e6)), r.rank)
            for r in QUERIES[qname](spark, sf_smoke).collect()
        ]
        assert sorted(got) == sorted(expect) and len(got) > 0, qname


def test_pq_tiers_numpy_reference(spark, sf_smoke):
    """Both PQ tiers — pinned (8x16 seeded codebooks) and
    Lloyd-trained (replicated codebooks) — recomputed densely in
    numpy + python sorts; refine pool 200 both."""
    from fsc_etl_spark.plans.oracles_training import _replicated_quantizers
    from fsc_etl_spark.plans.training_data import (
        PQ_PINNED_CODEBOOKS,
        QUERIES,
    )

    ids, V, n = _load_vecs(sf_smoke)
    for qname, books in (
        ("embed_pq_pinned_topk", PQ_PINNED_CODEBOOKS),
        ("embed_pq_topk", _replicated_quantizers(sf_smoke)[1]),
    ):
        expect = _pq_numpy(ids, V, n, books, 200)
        got = [
            (r.query_id, r.vec_id, int(round(r.cos * 1e6)), r.rank)
            for r in QUERIES[qname](spark, sf_smoke).collect()
        ]
        assert sorted(got) == sorted(expect) and len(got) > 0, qname


def test_cluster_soft_dedup_sample_against_reference(spark, sf_smoke):
    """Soft dedup recomputed with union-find clusters (over the shared
    Python minhash/LSH pair replication) + the plain integer bucket
    rule md5_bucket(doc_id) * size < 65536."""
    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "doc_id", "text"
    ).collect()
    parent = {d.doc_id: d.doc_id for d in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in _minhash_lsh_pairs_python(docs):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = {d.doc_id: find(d.doc_id) for d in docs}
    sizes: dict[int, int] = {}
    for r in roots.values():
        sizes[r] = sizes.get(r, 0) + 1
    expect = {}
    for d in docs:
        root = roots[d.doc_id]
        size = sizes[root]
        bucket = int(hashlib.md5(str(d.doc_id).encode()).hexdigest()[:4], 16)
        expect[d.doc_id] = (root, size, bucket * size < 65536)
    got = {
        r.doc_id: (r.cluster_root, r.cluster_size, r.kept)
        for r in TD_QUERIES["cluster_soft_dedup_sample"](
            spark, sf_smoke
        ).collect()
    }
    assert got == expect


def test_cluster_leakage_split_against_reference(spark, sf_smoke):
    """Leakage-safe split recomputed with union-find clusters (over
    the shared Python minhash/LSH pair replication), Python md5
    routing of BOTH the cluster root and the raw doc id, and plain
    dict aggregation — including the moved/torn audit columns and the
    structural invariant that the cluster route never tears a
    cluster."""
    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "doc_id", "text"
    ).collect()
    parent = {d.doc_id: d.doc_id for d in docs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in _minhash_lsh_pairs_python(docs):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    def split_of(key: int) -> str:
        h2 = hashlib.md5(str(key).encode()).hexdigest()[:2]
        return "train" if h2 < "cd" else ("val" if h2 < "e6" else "test")

    per_cluster: dict[int, dict] = {}
    for d in docs:
        root = find(d.doc_id)
        c = per_cluster.setdefault(
            root, {"docs": 0, "tokens": 0, "moved": 0, "doc_splits": set()}
        )
        c["docs"] += 1
        c["tokens"] += len([t for t in re.split(r"\s+", d.text.strip()) if t])
        ds = split_of(d.doc_id)
        c["doc_splits"].add(ds)
        if ds != split_of(root):
            c["moved"] += 1
    expect: dict[str, list[int]] = {}
    for root, c in per_cluster.items():
        agg = expect.setdefault(split_of(root), [0, 0, 0, 0, 0])
        agg[0] += 1
        agg[1] += c["docs"]
        agg[2] += c["tokens"]
        agg[3] += c["moved"]
        agg[4] += 1 if len(c["doc_splits"]) > 1 else 0
    got = {
        r.split: [
            r.n_clusters,
            r.n_docs,
            r.total_tokens,
            r.docs_moved,
            r.torn_clusters,
        ]
        for r in TD_QUERIES["cluster_leakage_split"](spark, sf_smoke).collect()
    }
    assert got == expect
    # the whole point: the cluster route assigns each cluster to
    # exactly ONE split (split is a function of cluster_root), so
    # total docs/clusters are partitioned, never duplicated
    assert sum(v[1] for v in got.values()) == len(docs)
    assert sum(v[0] for v in got.values()) == len(per_cluster)


def test_source_overlap_matrix_against_reference(spark, sf_smoke):
    """Cross-source overlap recomputed with plain Python set algebra:
    per-source distinct 3-gram md5 sets, pairwise intersections,
    floor-div ppm Jaccard/containments."""
    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "source", "text"
    ).collect()
    grams: dict[str, set] = {}
    for d in docs:
        tk = _toks(d.text.lower())
        s = grams.setdefault(d.source, set())
        for i in range(len(tk) - 2):
            s.add(hashlib.md5(" ".join(tk[i : i + 3]).encode()).hexdigest())
    expect = {}
    names = sorted(grams)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            shared = len(grams[a] & grams[b])
            if shared == 0:
                continue  # the pair join emits only sharing pairs
            ga, gb = len(grams[a]), len(grams[b])
            expect[(a, b)] = (
                shared,
                ga,
                gb,
                (1_000_000 * shared) // (ga + gb - shared),
                (1_000_000 * shared) // ga,
                (1_000_000 * shared) // gb,
            )
    got = {
        (r.source_a, r.source_b): (
            r.shared_grams,
            r.grams_a,
            r.grams_b,
            r.jaccard_ppm,
            r.contain_a_ppm,
            r.contain_b_ppm,
        )
        for r in TD_QUERIES["source_overlap_matrix"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_eval_contamination_flags_against_reference(spark, sf_smoke):
    """8-gram decontamination recomputed with plain Python sets: the
    doc_id % 29 == 0 slice's distinct 8-gram hashes vs every other
    doc's distinct hits."""
    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "doc_id", "text"
    ).collect()
    n = 8
    grams_of = {}
    for d in docs:
        tk = _toks(d.text.lower())
        grams_of[d.doc_id] = (
            max(len(tk) - (n - 1), 0),
            {
                hashlib.md5(" ".join(tk[i : i + n]).encode()).hexdigest()
                for i in range(len(tk) - n + 1)
            },
        )
    eval_set = set()
    for doc_id, (_, gs) in grams_of.items():
        if doc_id % 29 == 0:
            eval_set |= gs
    expect = {}
    for doc_id, (n_ngrams, gs) in grams_of.items():
        if doc_id % 29 == 0:
            continue
        hits = len(gs & eval_set)
        expect[doc_id] = (n_ngrams, hits, hits > 0)
    got = {
        r.doc_id: (r.n_ngrams, r.n_contaminated, r.contaminated)
        for r in TD_QUERIES["eval_contamination_flags"](
            spark, sf_smoke
        ).collect()
    }
    assert got == expect


def _copurchase_pairs(spark, sf_smoke):
    orders = read_parquet_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_custkey"
    ).collect()
    li = read_parquet_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    cust_of = {o.o_orderkey: o.o_custkey for o in orders}
    cp = set()
    for r in li:
        c = cust_of.get(r.l_orderkey)
        if c is not None:
            cp.add((c, r.l_partkey))
    return li, cp


def test_triangle_count_coparts_against_reference(spark, sf_smoke):
    """Triangle census recomputed with python adjacency sets and the
    textbook edge-iterator intersection count — no wedge joins."""
    from fsc_etl_spark.plans.graph_ops import QUERIES as GRAPH_QUERIES

    li, _ = _copurchase_pairs(spark, sf_smoke)
    by_order: dict[int, set] = {}
    for r in li:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n_nodes = len(adj)
    n_edges = len(edges)
    n_wedges = sum(d * (d - 1) // 2 for d in (len(v) for v in adj.values()))
    tri3 = sum(len(adj[a] & adj[b]) for a, b in edges)
    [r] = GRAPH_QUERIES["triangle_count_coparts"](spark, sf_smoke).collect()
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (
        n_nodes,
        n_edges,
        n_wedges,
        tri3 // 3,
    )


def test_bfs_hops_copurchase_against_reference(spark, sf_smoke):
    """3-hop BFS from 'c0' recomputed with a plain python frontier
    loop over the labeled co-purchase graph."""
    from fsc_etl_spark.plans.graph_ops import QUERIES as GRAPH_QUERIES

    _, cp = _copurchase_pairs(spark, sf_smoke)
    adj: dict[str, set] = {}
    for c, p in cp:
        a, b = f"c{c}", f"p{p}"
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {"c0": 0}
    frontier = ["c0"]
    for h in range(1, 4):
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = h
                    nxt.append(v)
        frontier = nxt
    hist: dict[int, list] = {}
    for node, d in dist.items():
        hist.setdefault(d, []).append(node)
    expect = {
        d: (len(ns), min(ns), max(ns)) for d, ns in hist.items()
    }
    got = {
        r.dist: (r.n_nodes, r.min_node, r.max_node)
        for r in GRAPH_QUERIES["bfs_hops_copurchase"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_ppr_copurchase_seeds_against_reference(spark, sf_smoke):
    """Personalized PageRank (3 integer rounds, nation-0 seeds)
    recomputed with plain python dicts: rank0 = init on seeds / 0
    elsewhere, base(v) = (15*init*n_nodes) div (100*n_seeds) on seeds,
    rank'(v) = base(v) + (85*inflow) div 100."""
    from fsc_etl_spark.plans.graph_ops import QUERIES as GRAPH_QUERIES

    _, cp = _copurchase_pairs(spark, sf_smoke)
    cust = read_parquet_table(spark, sf_smoke, "customer").select(
        "c_custkey", "c_nationkey"
    ).collect()
    adj: dict[int, list] = {}
    for c, p in cp:
        a, b = 2 * c, 2 * p + 1
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    seeds = {2 * r.c_custkey for r in cust if r.c_nationkey == 0} & set(adj)
    init = 10**9
    n_nodes, n_seeds = len(adj), len(seeds)
    base_seed = (15 * init * n_nodes) // (100 * n_seeds)
    rank = {v: (init if v in seeds else 0) for v in adj}
    for _ in range(3):
        contrib = {v: rank[v] // len(adj[v]) for v in adj}
        rank = {
            v: (base_seed if v in seeds else 0)
            + (85 * sum(contrib[u] for u in adj[v])) // 100
            for v in adj
        }
    label = {
        v: (f"c{v // 2}" if v % 2 == 0 else f"p{(v - 1) // 2}") for v in adj
    }
    top = sorted(
        ((label[v], rank[v]) for v in adj), key=lambda t: (-t[1], t[0])
    )[:20]
    got = [
        (r.node, r.rank)
        for r in GRAPH_QUERIES["ppr_copurchase_seeds"](
            spark, sf_smoke
        ).collect()
    ]
    assert got == top


def test_kcore_copurchase_against_reference(spark, sf_smoke):
    """20-core recomputed with a plain python peel-to-fixpoint loop,
    then the surviving-degree histogram with string-label extrema."""
    from fsc_etl_spark.plans.graph_ops import QUERIES as GRAPH_QUERIES

    _, cp = _copurchase_pairs(spark, sf_smoke)
    edges = {(2 * c, 2 * p + 1) for c, p in cp}
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    for _ in range(8):
        drop = {v for v in alive if len(adj[v] & alive) < 20}
        if not drop:
            break
        alive -= drop
    assert not {v for v in alive if len(adj[v] & alive) < 20}
    hist: dict[int, list] = {}
    for v in alive:
        d = len(adj[v] & alive)
        lb = f"c{v // 2}" if v % 2 == 0 else f"p{(v - 1) // 2}"
        hist.setdefault(d, []).append(lb)
    expect = {d: (len(ls), min(ls), max(ls)) for d, ls in hist.items()}
    got = {
        r.core_deg: (r.n_nodes, r.min_node, r.max_node)
        for r in GRAPH_QUERIES["kcore_copurchase"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_embed_mmr_select_against_reference(spark, sf_smoke):
    """Greedy MMR recomputed with a plain python loop: per round,
    score = round(0.7*rel - 0.3*max_sim_to_picked, 6), argmax by
    (score DESC, id ASC) — no per-round Spark plans."""
    import duckdb

    con = duckdb.connect()
    try:
        rows = con.execute(
            f"SELECT vec_id, embedding FROM "
            f"read_parquet('{sf_smoke}/embeddings.parquet') ORDER BY vec_id"
        ).fetchall()
    finally:
        con.close()
    import numpy as np

    ids = [r[0] for r in rows]
    V = np.array([r[1] for r in rows], dtype="float64")
    n = np.sqrt((V * V).sum(axis=1))
    qi = ids.index(0)
    rel = {
        ids[i]: round(float(V[qi] @ V[i]) / (n[qi] * n[i]), 6)
        for i in range(len(ids))
        if ids[i] != 0
    }
    picked = []  # (id, idx)
    expect = []
    for t in range(5):
        best = None
        for i in range(len(ids)):
            vid = ids[i]
            if vid == 0 or any(p[0] == vid for p in picked):
                continue
            if picked:
                ms = max(
                    round(float(V[i] @ V[pi]) / (n[i] * n[pi]), 6)
                    for _, pi in picked
                )
            else:
                ms = 0.0
            score = round(0.7 * rel[vid] - 0.3 * ms, 6)
            key = (-score, vid)
            if best is None or key < best[0]:
                best = (key, vid, i, score)
        picked.append((best[1], best[2]))
        expect.append(
            (
                t + 1,
                best[1],
                int(round(rel[best[1]] * 1e6)),
                int(round(best[3] * 1e6)),
            )
        )
    got = [
        (r.sel_rank, r.vec_id, int(round(r.rel_cos * 1e6)), int(round(r.mmr_score * 1e6)))
        for r in TD_QUERIES["embed_mmr_select"](spark, sf_smoke).collect()
    ]
    assert got == expect


def test_kmeans_cluster_stats_against_reference(spark, sf_smoke):
    """Integer-exact distributed K-Means recomputed with a plain
    python Lloyd loop: floor(x*127) quantization, k=4 lowest-id init,
    2 truncating-div update rounds, exact int64 distances."""
    import duckdb

    import numpy as np

    from fsc_etl_spark.plans.training_data import QUERIES as TDQ

    con = duckdb.connect()
    try:
        rows = con.execute(
            f"SELECT vec_id, embedding FROM "
            f"read_parquet('{sf_smoke}/embeddings.parquet') ORDER BY vec_id"
        ).fetchall()
    finally:
        con.close()
    V = np.array([r[1] for r in rows], dtype="float64")
    Q = np.floor(V * 127).astype("int64")
    cent = [list(map(int, Q[i])) for i in range(4)]

    def assign():
        out = []
        for q in Q:
            best_c, best_d = 0, None
            for c, cv in enumerate(cent):
                d = int(((q - np.array(cv)) ** 2).sum())
                if best_d is None or d < best_d:
                    best_c, best_d = c, d
            out.append((best_c, best_d))
        return out

    for _ in range(2):
        a = assign()
        nxt = [list(c) for c in cent]
        for c in range(4):
            members = [Q[i] for i in range(len(Q)) if a[i][0] == c]
            if members:
                s = np.array(members, dtype=object).sum(axis=0)
                cnt = len(members)
                nxt[c] = [
                    int(abs(int(x)) // cnt * (1 if x >= 0 else -1)) for x in s
                ]
        cent = nxt
    final = assign()
    expect = {}
    for c, d in final:
        n_m, t_d = expect.get(c, (0, 0))
        expect[c] = (n_m + 1, t_d + d)
    got = {
        r.cluster_id: (r.n_members, r.total_dist)
        for r in TDQ["kmeans_cluster_stats"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_embed_ann_recall_matrix_against_reference(spark, sf_smoke):
    """Recall matrix recomputed densely: exact brute-force top-5 and
    every tier's top-5 in numpy + python sorts (reusing this module's
    tier references), intersected per query — the driver-contract
    recall row must equal the dense recount exactly."""
    import numpy as np

    from fsc_etl_spark.plans.oracles_training import _replicated_quantizers
    from fsc_etl_spark.plans.training_data import (
        IVF_PINNED_CENTROIDS,
        LSH_TABLES,
        PQ_PINNED_CODEBOOKS,
        QUERIES,
    )

    ids, V, n = _load_vecs(sf_smoke)
    idx = {int(ids[i]): i for i in range(len(ids))}

    def topk_pairs(qi, cand_ids):
        scored = sorted(
            (-round(float(V[qi] @ V[idx[c]]) / (n[qi] * n[idx[c]]), 6), c)
            for c in cand_ids
        )[:5]
        return {(int(ids[qi]), c) for _, c in scored}

    exact = set()
    for qi in np.where(ids < 5)[0]:
        exact |= topk_pairs(qi, [int(i) for i in ids if i != ids[qi]])

    H = np.array(LSH_TABLES)
    S = (V @ H.reshape(-1, 64).T >= 0).reshape(len(V), H.shape[0], H.shape[1])
    sigs = (S * (2 ** np.arange(H.shape[1]))).sum(axis=2)
    lsh_pairs = set()
    for qi in np.where(ids < 5)[0]:
        cand = set()
        for t_ in range(H.shape[0]):
            cand.update(
                int(ids[i])
                for i in np.where(sigs[:, t_] == sigs[qi, t_])[0]
                if ids[i] != ids[qi]
            )
        lsh_pairs |= topk_pairs(qi, cand)

    trained_ivf, trained_pq = _replicated_quantizers(sf_smoke)
    tiers = {
        "ivf_pinned": {
            (q, c) for q, c, _, _ in _ivf_numpy(ids, V, n, IVF_PINNED_CENTROIDS, 5)
        },
        "ivf_trained": {
            (q, c) for q, c, _, _ in _ivf_numpy(ids, V, n, trained_ivf, 4)
        },
        "lsh_multitable": lsh_pairs,
        "pq_pinned": {
            (q, c) for q, c, _, _ in _pq_numpy(ids, V, n, PQ_PINNED_CODEBOOKS, 200)
        },
        "pq_trained": {
            (q, c) for q, c, _, _ in _pq_numpy(ids, V, n, trained_pq, 200)
        },
    }
    got = {
        r.tier: r
        for r in QUERIES["embed_ann_recall_matrix"](spark, sf_smoke).collect()
    }
    assert set(got) == set(tiers)
    for nm, pairs in tiers.items():
        hits = len(pairs & exact)
        assert (got[nm].hits, got[nm].n_total, got[nm].recall_ppm) == (
            hits,
            25,
            1_000_000 * hits // 25,
        ), nm


def _shingle_sets(spark, sf_smoke):
    from fsc_etl_spark.sources.readers import read_parquet_table

    docs = read_parquet_table(spark, sf_smoke, "documents").collect()
    sh = {}
    for d in docs:
        # lower() matches the audited query's case-insensitive
        # contract (minhash_signatures tokenizes lower(text)); without
        # it the reference only agrees on all-lowercase fixtures
        # (ADVICE r9).
        tk = _toks(d.text.lower())
        s = {" ".join(tk[i : i + 3]) for i in range(len(tk) - 2)}
        if s:
            sh[d.doc_id] = s
    return docs, sh


def test_minhash_jaccard_accuracy_against_reference(spark, sf_smoke):
    """MinHash estimator audit recomputed in plain hashlib + dicts:
    salted-md5 signatures, 4x2 banding, slot-match estimate, exact
    shingle-set Jaccard — exact ppm agreement required per pair."""
    import hashlib

    from fsc_etl_spark.plans.corpus_stats import QUERIES

    _, sh = _shingle_sets(spark, sf_smoke)
    sigs = {}
    for i, s in sh.items():
        sig = []
        for j in range(4):
            hexes = [hashlib.md5(f"s{j}:{x}".encode()).hexdigest() for x in s]
            sig.append(min(h[0:16] for h in hexes))
            sig.append(min(h[16:32] for h in hexes))
        sigs[i] = sig
    buckets: dict[tuple, list] = {}
    for i, sig in sigs.items():
        for b in range(4):
            key = (b, hashlib.md5(f"{sig[2*b]}|{sig[2*b+1]}".encode()).hexdigest())
            buckets.setdefault(key, []).append(i)
    pairs = set()
    for ids in buckets.values():
        for x in ids:
            for y in ids:
                if x < y:
                    pairs.add((x, y))
    expect = {}
    for a, b in pairs:
        m = sum(1 for i in range(8) if sigs[a][i] == sigs[b][i])
        inter = len(sh[a] & sh[b])
        jac = (1_000_000 * inter) // (len(sh[a]) + len(sh[b]) - inter)
        expect[(a, b)] = (m * 125_000, jac, abs(m * 125_000 - jac))
    got = {
        (r.id_a, r.id_b): (r.sig_est_ppm, r.jacc_ppm, r.err_ppm)
        for r in QUERIES["minhash_jaccard_accuracy"](spark, sf_smoke).collect()
    }
    assert got == expect and len(got) > 0


def test_ngram_novelty_curve_against_reference(spark, sf_smoke):
    from fsc_etl_spark.plans.corpus_stats import QUERIES

    docs, sh3 = _shingle_sets(spark, sf_smoke)
    n = len(docs)
    per_dec: dict[int, set] = {d: set() for d in range(1, 11)}
    for d in docs:
        dec = min((10 * d.doc_id) // n + 1, 10)
        per_dec[dec] |= sh3.get(d.doc_id, set())
    seen: set = set()
    expect = {}
    cum = 0
    for dec in range(1, 11):
        touched = len(per_dec[dec])
        new = len(per_dec[dec] - seen)
        seen |= per_dec[dec]
        cum += new
        nov = (1_000_000 * new) // touched if touched else None
        expect[dec] = (touched, new, nov, cum)
    got = {
        r.decile: (r.touched_grams, r.new_grams, r.novelty_ppm, r.cum_new_grams)
        for r in QUERIES["ngram_novelty_curve"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_stratified_sample_exact_against_reference(spark, sf_smoke):
    """Largest-remainder allocation + md5-rank take, recomputed with
    plain dicts and sorts."""
    import hashlib

    from fsc_etl_spark.plans.corpus_stats import (
        QUERIES,
        STRATIFIED_BUDGET,
    )
    from fsc_etl_spark.sources.readers import read_parquet_table

    docs = read_parquet_table(spark, sf_smoke, "documents").collect()
    strata: dict[tuple, list] = {}
    for d in docs:
        strata.setdefault((d.source, d.lang), []).append(d.doc_id)
    n_total = len(docs)
    b = STRATIFIED_BUDGET
    floors = {k: (b * len(v)) // n_total for k, v in strata.items()}
    rems = sorted(
        strata, key=lambda k: (-((b * len(strata[k])) % n_total), k[0], k[1])
    )
    leftover = b - sum(floors.values())
    quotas = dict(floors)
    for k in rems[:leftover]:
        quotas[k] += 1
    assert sum(quotas.values()) == b
    expect = set()
    for k, ids in strata.items():
        ranked = sorted(
            ids, key=lambda i: (hashlib.md5(f"strat:{i}".encode()).hexdigest(), i)
        )
        for rk, i in enumerate(ranked[: quotas[k]], start=1):
            expect.add((i, k[0], k[1], rk, quotas[k]))
    got = {
        (r.doc_id, r.source, r.lang, r.samp_rank, r.quota)
        for r in QUERIES["stratified_sample_exact"](spark, sf_smoke).collect()
    }
    assert got == expect and len(got) == b


def test_graph_label_propagation_against_reference(spark, sf_smoke):
    """3-round deterministic LPA recomputed with plain dicts: most
    frequent neighbor label, ties to the LARGEST label."""
    import __spark_entry__ as entrymod

    _, cp = _copurchase_pairs(spark, sf_smoke)
    adj: dict[int, list] = {}
    for c, p in cp:
        cn, pn = 2 * c, 2 * p + 1  # the BIGINT node encoding
        adj.setdefault(cn, []).append(pn)
        adj.setdefault(pn, []).append(cn)
    label = {v: v for v in adj}
    for _ in range(3):
        nxt = {}
        for v, neigh in adj.items():
            cnt: dict[int, int] = {}
            for u in neigh:
                cnt[label[u]] = cnt.get(label[u], 0) + 1
            nxt[v] = max(cnt.items(), key=lambda kv: (kv[1], kv[0]))[0]
        label = nxt
    sizes: dict[int, int] = {}
    for v in label:
        sizes[label[v]] = sizes.get(label[v], 0) + 1

    def render(x: int) -> str:
        return ("c" if x % 2 == 0 else "p") + str(x // 2)

    expect = {(render(v), render(label[v]), sizes[label[v]]) for v in adj}
    got = {
        (r.node, r.label, r.community_size)
        for r in entrymod.queries()["graph_label_propagation"](
            spark, sf_smoke
        ).collect()
    }
    assert got == expect and len(got) > 0


def test_daily_value_autocorr_against_reference(spark, sf_smoke):
    """Signed squared lag autocorrelation recomputed with plain dicts
    and Python big ints (exact: daily counts are integers)."""
    from fsc_etl_spark.plans.scale_ops import QUERIES as SCALE_QUERIES
    from fsc_etl_spark.sources.readers import read_parquet_table

    ev = read_parquet_table(spark, sf_smoke, "events").select(
        "event_type", "ts"
    ).collect()
    import datetime as dt

    daily: dict[tuple, int] = {}
    for r in ev:
        day = (r.ts.date() - dt.date(2000, 1, 1)).days
        daily[(r.event_type, day)] = daily.get((r.event_type, day), 0) + 1
    types = {k[0] for k in daily}
    expect = {}
    for et in types:
        days = {d: y for (t_, d), y in daily.items() if t_ == et}
        for lag in (1, 2, 3):
            pairs = [
                (days[d], days[d + lag]) for d in days if d + lag in days
            ]
            n = len(pairs)
            sx = sum(x for x, _ in pairs)
            sz = sum(z for _, z in pairs)
            sxz = sum(x * z for x, z in pairs)
            sxx = sum(x * x for x, _ in pairs)
            szz = sum(z * z for _, z in pairs)
            num = n * sxz - sx * sz
            vx, vz = n * sxx - sx * sx, n * szz - sz * sz
            c2 = (
                (1 if num >= 0 else -1) * ((1_000_000 * num * num) // (vx * vz))
                if vx > 0 and vz > 0
                else None
            )
            expect[(et, lag)] = (n, c2)
    got = {
        (r.event_type, r.lag): (r.n_pairs, r.corr2_signed_ppm)
        for r in SCALE_QUERIES["daily_value_autocorr"](spark, sf_smoke).collect()
    }
    assert got == expect and len(got) > 0


def test_ivf_cell_balance_against_reference(spark, sf_smoke):
    """Cell populations recomputed densely: the identity-pinned
    replicated codebook + numpy argmax assignment (dot/|v| − |c|²/2,
    lowest cell on ties) + plain counting."""
    import numpy as np

    from fsc_etl_spark.plans.oracles_training import _replicated_train_codebook
    from fsc_etl_spark.plans.training_data import QUERIES

    ids, V, n = _load_vecs(sf_smoke)
    C = np.array(
        [list(c) for c in _replicated_train_codebook(sf_smoke, k=16, iters=2)]
    )
    half = (C * C).sum(axis=1) / 2.0
    S = V @ C.T / n[:, None] - half[None, :]
    # lowest cell on ties: argmax returns the first (lowest) index
    cells = S.argmax(axis=1)
    pops = {c: 0 for c in range(16)}
    for c in cells:
        pops[int(c)] += 1
    total = len(ids)
    got = {
        r.cell: (r.n_vecs, r.share_ppm, r.load_x_uniform_ppm)
        for r in QUERIES["ivf_cell_balance"](spark, sf_smoke).collect()
    }
    assert set(got) == set(range(16))
    for c in range(16):
        p = pops[c]
        assert got[c] == (
            p,
            1_000_000 * p // total,
            16_000_000 * p // total,
        ), c


def test_ivf_nprobe_recall_curve_against_reference(spark, sf_smoke):
    """nprobe sweep recomputed densely: exact brute-force top-5 plus
    the pinned-IVF top-5 at every cutoff via this module's _ivf_numpy,
    intersected per query — each curve row must equal the dense
    recount exactly, and the nprobe=8 row must pin recall 1.0."""
    import numpy as np

    from fsc_etl_spark.plans.training_data import (
        IVF_PINNED_CENTROIDS,
        QUERIES,
        _NPROBE_SWEEP,
    )

    ids, V, n = _load_vecs(sf_smoke)
    idx = {int(ids[i]): i for i in range(len(ids))}

    exact = set()
    for qi in np.where(ids < 5)[0]:
        scored = sorted(
            (
                -round(float(V[qi] @ V[idx[c]]) / (n[qi] * n[idx[c]]), 6),
                c,
            )
            for c in (int(i) for i in ids)
            if c != ids[qi]
        )[:5]
        exact |= {(int(ids[qi]), c) for _, c in scored}

    got = {
        r.nprobe: r
        for r in QUERIES["ivf_nprobe_recall_curve"](spark, sf_smoke).collect()
    }
    assert set(got) == set(_NPROBE_SWEEP)
    for np_ in _NPROBE_SWEEP:
        pairs = {
            (q, c) for q, c, _, _ in _ivf_numpy(ids, V, n, IVF_PINNED_CENTROIDS, np_)
        }
        hits = len(pairs & exact)
        assert (got[np_].hits, got[np_].n_total, got[np_].recall_ppm) == (
            hits,
            25,
            1_000_000 * hits // 25,
        ), np_
    assert got[8].recall_ppm == 1_000_000  # all cells probed == exact


def test_graph_common_neighbors_against_reference(spark, sf_smoke):
    """Common-neighbor link prediction recomputed with plain dicts:
    distinct (cust, part) incidence, hub parts (fanout > 50) dropped,
    pair commons accumulated part-by-part, integer Jaccard ppm, the
    same (jacc DESC, common DESC, id_a, id_b) top-50."""
    from fsc_etl_spark.plans.graph_ops import (
        QUERIES,
        _CN_MAX_PART_FANOUT,
        _CN_TOPK,
    )

    o = read_parquet_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_custkey"
    ).collect()
    li = read_parquet_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    cust_of_order = {r.o_orderkey: r.o_custkey for r in o}
    part_custs: dict[int, set[int]] = {}
    for r in li:
        c = cust_of_order.get(r.l_orderkey)
        if c is not None:
            part_custs.setdefault(r.l_partkey, set()).add(c)
    deg: dict[int, int] = {}
    common: dict[tuple[int, int], int] = {}
    for custs in part_custs.values():
        if len(custs) > _CN_MAX_PART_FANOUT:
            continue
        for c in custs:
            deg[c] = deg.get(c, 0) + 1
        cl = sorted(custs)
        for i in range(len(cl)):
            for j in range(i + 1, len(cl)):
                k = (cl[i], cl[j])
                common[k] = common.get(k, 0) + 1
    rows = [
        ((1_000_000 * cm) // (deg[a] + deg[b] - cm), cm, a, b)
        for (a, b), cm in common.items()
    ]
    rows.sort(key=lambda r: (-r[0], -r[1], r[2], r[3]))
    expect = [(a, b, cm, j) for j, cm, a, b in rows[:_CN_TOPK]]
    got = [
        (r.id_a, r.id_b, r.common, r.jaccard_ppm)
        for r in QUERIES["graph_common_neighbors"](spark, sf_smoke).collect()
    ]
    assert got == expect


def test_char_trigram_diversity_against_reference(spark, sf_smoke):
    """Char-trigram stats recomputed with plain dict counting over
    lower(text) — totals, distincts, hottest gram and trunc-div ppm
    must match per source exactly."""
    from fsc_etl_spark.plans.corpus_stats import QUERIES

    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "source", "text"
    ).collect()
    per: dict[str, dict[str, int]] = {}
    for d in docs:
        txt = d.text.lower()
        if len(txt) < 3:
            continue
        cnts = per.setdefault(d.source, {})
        for i in range(len(txt) - 2):
            g = txt[i : i + 3]
            cnts[g] = cnts.get(g, 0) + 1
    expect = {}
    for src, cnts in per.items():
        total = sum(cnts.values())
        expect[src] = (
            total,
            len(cnts),
            max(cnts.values()),
            1_000_000 * len(cnts) // total,
        )
    got = {
        r.source: (r.n_grams, r.n_distinct, r.top_gram_n, r.diversity_ppm)
        for r in QUERIES["char_trigram_diversity"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_hits_copurchase_against_reference(spark, sf_smoke):
    """Integer HITS recomputed with plain dicts: distinct (cust, part)
    incidence, h0 = scale on every customer, per round a_raw = sum of
    h over in-edges then L1-renormalize via floor division, symmetric
    for hubs — then the same (score DESC, label ASC) top-10 per kind."""
    from fsc_etl_spark.operators.graph import RANK_SCALE
    from fsc_etl_spark.plans.graph_ops import _HITS_ITERS, _HITS_TOPK, QUERIES

    o = read_parquet_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_custkey"
    ).collect()
    li = read_parquet_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    cust_of_order = {r.o_orderkey: r.o_custkey for r in o}
    edges = set()
    for r in li:
        c = cust_of_order.get(r.l_orderkey)
        if c is not None:
            edges.add((c, r.l_partkey))
    h = {c: RANK_SCALE for c, _ in edges}
    a: dict[int, int] = {}
    for _ in range(_HITS_ITERS):
        a = {}
        for c, p in edges:
            a[p] = a.get(p, 0) + h[c]
        tot = sum(a.values())
        a = {p: (v * RANK_SCALE) // tot for p, v in a.items()}
        h = {}
        for c, p in edges:
            h[c] = h.get(c, 0) + a[p]
        tot = sum(h.values())
        h = {c: (v * RANK_SCALE) // tot for c, v in h.items()}
    top_a = sorted(
        (("auth", f"p{p}", v) for p, v in a.items()),
        key=lambda r: (-r[2], r[1]),
    )[:_HITS_TOPK]
    top_h = sorted(
        (("hub", f"c{c}", v) for c, v in h.items()),
        key=lambda r: (-r[2], r[1]),
    )[:_HITS_TOPK]
    got = [
        (r.kind, r.node, r.score)
        for r in QUERIES["hits_copurchase"](spark, sf_smoke).collect()
    ]
    assert got == top_a + top_h


def test_graph_assortativity_against_reference(spark, sf_smoke):
    """Degree-assortativity moments recomputed with plain dicts over
    the symmetrised copurchase edge list, r_ppm via trunc division."""
    from fsc_etl_spark.plans.graph_ops import QUERIES

    o = read_parquet_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_custkey"
    ).collect()
    li = read_parquet_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    cust_of_order = {r.o_orderkey: r.o_custkey for r in o}
    und = set()
    for r in li:
        c = cust_of_order.get(r.l_orderkey)
        if c is not None:
            und.add((2 * c, 2 * r.l_partkey + 1))
    edges = [(s, d) for s, d in und] + [(d, s) for s, d in und]
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    m = len(edges)
    sx = sum(deg[s] for s, _ in edges)
    sxx = sum(deg[s] * deg[s] for s, _ in edges)
    sxy = sum(deg[s] * deg[d] for s, d in edges)
    num = 1_000_000 * (m * sxy - sx * sx)
    den = m * sxx - sx * sx
    r_ppm = abs(num) // den * (1 if num >= 0 else -1)
    row = QUERIES["graph_assortativity"](spark, sf_smoke).collect()[0]
    assert (
        int(row.m),
        int(row.sum_x),
        int(row.sum_xx),
        int(row.sum_xy),
        row.r_ppm,
    ) == (m, sx, sxx, sxy, r_ppm)


def test_embed_kcenter_coreset_against_reference(spark, sf_smoke):
    """Greedy k-center recomputed with numpy int64: floor(x*127) grid,
    exact squared-L2, farthest-point loop with (dist DESC, id ASC)
    tie-break."""
    import math

    import numpy as np

    from fsc_etl_spark.plans.training_data import QUERIES

    rows = read_parquet_table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    rows.sort(key=lambda r: r.vec_id)
    ids = np.array([r.vec_id for r in rows], dtype="int64")
    Q = np.array(
        [[math.floor(float(x) * 127) for x in r.embedding] for r in rows],
        dtype="int64",
    )
    expect = [(1, int(ids[0]), 0)]
    md = ((Q - Q[0]) ** 2).sum(axis=1)
    for r in range(2, 9):
        best = md.max()
        i = int(np.nonzero(md == best)[0][0])  # rows are id-sorted
        expect.append((r, int(ids[i]), int(best)))
        md = np.minimum(md, ((Q - Q[i]) ** 2).sum(axis=1))
    got = [
        (r.sel_round, r.center_id, r.sel_dist_sq)
        for r in QUERIES["embed_kcenter_coreset"](spark, sf_smoke)
        .orderBy("sel_round")
        .collect()
    ]
    assert got == expect


def test_mg_frequent_tokens_against_reference(spark, sf_smoke):
    """Two-level Misra–Gries recomputed with plain dicts: md5 shards,
    exact per-shard counts, value-based subtract-(k+1)th prunes under
    (cnt DESC, tok ASC), merge, final prune, exact-count audit — and
    the published undercount bound re-proved on the result."""
    from fsc_etl_spark.plans.corpus_stats import MG_K, QUERIES

    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "doc_id", "text"
    ).collect()
    shard_counts: dict[int, dict[str, int]] = {}
    exact: dict[str, int] = {}
    n_total = 0
    for d in docs:
        sh = (
            int(hashlib.md5(f"mg:{d.doc_id}".encode()).hexdigest()[:15], 16)
            % 16
        )
        for tok in _toks(d.text.lower()):
            shard_counts.setdefault(sh, {})[tok] = (
                shard_counts.get(sh, {}).get(tok, 0) + 1
            )
            exact[tok] = exact.get(tok, 0) + 1
            n_total += 1

    def prune(counts: dict[str, int]) -> dict[str, int]:
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        t = ranked[MG_K][1] if len(ranked) > MG_K else 0
        return {k: v - t for k, v in counts.items() if v - t > 0}

    merged: dict[str, int] = {}
    for counts in shard_counts.values():
        for tok, v in prune(counts).items():
            merged[tok] = merged.get(tok, 0) + v
    summ = prune(merged)
    expect = sorted(
        (tok, est, exact[tok], exact[tok] - est,
         (exact[tok] - est) * (MG_K + 1) <= n_total)
        for tok, est in summ.items()
    )
    got = sorted(
        (r.tok, r.mg_est, r.exact_cnt, r.undercount, r.within_bound)
        for r in QUERIES["mg_frequent_tokens"](spark, sf_smoke).collect()
    )
    assert got == expect
    assert len(expect) <= MG_K
    # the mergeable-summaries guarantee, re-proved on the data: every
    # token above the n/(k+1) threshold survives with a bounded
    # undercount
    for tok, cnt in exact.items():
        if cnt > n_total // (MG_K + 1):
            assert tok in summ and cnt - summ[tok] <= n_total // (MG_K + 1)


def test_streaming_mg_heavy_tokens_against_reference(spark, sf_smoke):
    """The streaming left-fold replayed in plain Python: doc_id-range
    batches (the staging rule), per-batch two-level shard summary,
    sequential merge + prune — then the same exact-count audit."""
    from fsc_etl_spark.plans.corpus_stats import MG_K
    from fsc_etl_spark.plans.streaming_queries import QUERIES

    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "doc_id", "text"
    ).collect()
    lo = min(d.doc_id for d in docs)
    hi = max(d.doc_id for d in docs)
    step = (hi - lo) // 4 + 1

    def prune(counts: dict[str, int]) -> dict[str, int]:
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        t = ranked[MG_K][1] if len(ranked) > MG_K else 0
        return {k: v - t for k, v in counts.items() if v - t > 0}

    exact: dict[str, int] = {}
    n_total = 0
    summ: dict[str, int] = {}
    for i in range(4):
        shard_counts: dict[int, dict[str, int]] = {}
        for d in docs:
            if (d.doc_id - lo) // step != i:
                continue
            sh = (
                int(hashlib.md5(f"mg:{d.doc_id}".encode()).hexdigest()[:15], 16)
                % 16
            )
            for tok in _toks(d.text.lower()):
                shard_counts.setdefault(sh, {})[tok] = (
                    shard_counts.get(sh, {}).get(tok, 0) + 1
                )
                exact[tok] = exact.get(tok, 0) + 1
                n_total += 1
        merged_shards: dict[str, int] = {}
        for counts in shard_counts.values():
            for tok, v in prune(counts).items():
                merged_shards[tok] = merged_shards.get(tok, 0) + v
        batch_summ = prune(merged_shards)
        if not batch_summ:
            continue
        folded = dict(summ)
        for tok, v in batch_summ.items():
            folded[tok] = folded.get(tok, 0) + v
        summ = prune(folded)

    expect = sorted(
        (tok, est, exact[tok], exact[tok] - est,
         (exact[tok] - est) * (MG_K + 1) <= n_total)
        for tok, est in summ.items()
    )
    got = sorted(
        (r.tok, r.mg_est, r.exact_cnt, r.undercount, r.within_bound)
        for r in QUERIES["streaming_mg_heavy_tokens"](spark, sf_smoke).collect()
    )
    assert got == expect


def test_graph_seed_ball_sizes_against_reference(spark, sf_smoke):
    """Per-seed exact neighborhood function recomputed with a plain
    adjacency-dict BFS over the symmetrised copurchase graph."""
    from fsc_etl_spark.plans.graph_ops import _BALL_HOPS, _BALL_SEEDS, QUERIES

    o = read_parquet_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_custkey"
    ).collect()
    li = read_parquet_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    custs = sorted(
        r.c_custkey
        for r in read_parquet_table(spark, sf_smoke, "customer")
        .select("c_custkey")
        .collect()
    )[:_BALL_SEEDS]
    cust_of_order = {r.o_orderkey: r.o_custkey for r in o}
    adj: dict[int, set[int]] = {}
    for r in li:
        c = cust_of_order.get(r.l_orderkey)
        if c is None:
            continue
        cn, pn = 2 * c, 2 * r.l_partkey + 1
        adj.setdefault(cn, set()).add(pn)
        adj.setdefault(pn, set()).add(cn)
    expect: dict[tuple[str, int], int] = {}
    for c in custs:
        seed = 2 * c
        dist = {seed: 0}
        frontier = {seed}
        for h in range(1, _BALL_HOPS + 1):
            nxt = set()
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = h
                        nxt.add(v)
            frontier = nxt
        for h in range(_BALL_HOPS + 1):
            n = sum(1 for d in dist.values() if d == h)
            if n:
                expect[(f"c{c}", h)] = n
    got = {
        (r.seed, r.dist): r.n_nodes
        for r in QUERIES["graph_seed_ball_sizes"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_psi_value_drift_against_reference(spark, sf_smoke):
    """PSI recomputed with plain Python (decimal cents, dict counts,
    math.log) — plus the floor-boundary margin audit the micro-nat
    idiom requires: every quantized ln must sit far enough from its
    floor boundary that cross-engine ulp noise cannot flip it."""
    import math
    from decimal import Decimal

    from fsc_etl_spark.plans.scale_ops import _PSI_B, _PSI_BOUNDS, QUERIES

    ev = read_parquet_table(spark, sf_smoke, "events").select(
        "event_type", "value"
    ).collect()
    counts: dict[tuple[str, int], int] = {}
    ntot: dict[str, int] = {}
    for r in ev:
        # _cents (line ~252) exists for exactly this: Spark's
        # cast(double as decimal(18,2)) rounds HALF_UP, while
        # Decimal.quantize defaults to HALF_EVEN — a half-cent fixture
        # value would flake under the default (ADVICE r10).
        vc = _cents(r.value)
        b = _PSI_B - 1
        for i, bound in enumerate(_PSI_BOUNDS):
            if vc < bound:
                b = i
                break
        counts[(r.event_type, b)] = counts.get((r.event_type, b), 0) + 1
        ntot[r.event_type] = ntot.get(r.event_type, 0) + 1
    corpus = {b: 0 for b in range(_PSI_B)}
    for (_, b), h in counts.items():
        corpus[b] += h
    m_total = sum(corpus.values())
    expect = {}
    min_margin = 1.0
    for et, n in ntot.items():
        psi_num = 0
        for b in range(_PSI_B):
            num = (counts.get((et, b), 0) + 1) * (m_total + _PSI_B)
            den = (corpus[b] + 1) * (n + _PSI_B)
            x = 1e6 * math.log(num / den)
            lnq = math.floor(x)
            min_margin = min(min_margin, abs(x - lnq), abs(lnq + 1 - x))
            psi_num += (num - den) * lnq
        denom = (n + _PSI_B) * (m_total + _PSI_B)
        expect[et] = (n, abs(psi_num) // denom * (1 if psi_num >= 0 else -1))
    got = {
        r.event_type: (r.n_events, r.psi_micro)
        for r in QUERIES["psi_value_drift"](spark, sf_smoke).collect()
    }
    assert got == expect
    # the dsir precedent's bound (test_dsir_floor_distance_margins):
    # |1e6·ln(ratio)| <= ~2e6 at 1e-16 relative puts cross-engine ulp
    # noise at ~1e-3 micro-nats; require the margin above it (measured
    # 1.2e-2 at sf0.001 — an order of magnitude of headroom)
    assert min_margin > 1e-3, f"quantization margin too thin: {min_margin}"


def test_graph_adamic_adar_against_reference(spark, sf_smoke):
    """Adamic–Adar recomputed with plain dicts: incidence sets, the
    pinned weight table regenerated from math.log, per-pair weighted
    sums, top-50 under the same (aa DESC, common DESC, a, b) order.
    Also audits that the pinned table matches floor(1e6/ln n) exactly
    and that each 1e6/ln(n) sits far from its floor boundary (the
    table is generated once in one interpreter, so this is a
    generation-stability check, not a cross-engine one)."""
    import math

    from fsc_etl_spark.plans.graph_ops import (
        _AA_TOPK,
        _AA_WEIGHTS,
        _CN_MAX_PART_FANOUT,
        QUERIES,
    )

    for i, w in enumerate(_AA_WEIGHTS):
        n = i + 2
        exact = 1_000_000 / math.log(n)
        assert w == int(exact)
        # distance from both floor boundaries ≫ any libm ulp spread
        assert min(exact - w, w + 1 - exact) > 1e-4

    o = read_parquet_table(spark, sf_smoke, "orders").select(
        "o_orderkey", "o_custkey"
    ).collect()
    li = read_parquet_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    cust_of_order = {r.o_orderkey: r.o_custkey for r in o}
    members: dict[int, set[int]] = {}
    for r in li:
        c = cust_of_order.get(r.l_orderkey)
        if c is not None:
            members.setdefault(r.l_partkey, set()).add(c)
    scores: dict[tuple[int, int], int] = {}
    common: dict[tuple[int, int], int] = {}
    for custs in members.values():
        if not (2 <= len(custs) <= _CN_MAX_PART_FANOUT):
            continue
        w = _AA_WEIGHTS[len(custs) - 2]
        cl = sorted(custs)
        for i, ca in enumerate(cl):
            for cb in cl[i + 1:]:
                scores[(ca, cb)] = scores.get((ca, cb), 0) + w
                common[(ca, cb)] = common.get((ca, cb), 0) + 1
    expect = sorted(
        ((aa, common[p], p[0], p[1]) for p, aa in scores.items()),
        key=lambda t: (-t[0], -t[1], t[2], t[3]),
    )[:_AA_TOPK]
    got = [
        (r.aa_micro, r.common, r.id_a, r.id_b)
        for r in QUERIES["graph_adamic_adar"](spark, sf_smoke).collect()
    ]
    assert got == expect and len(got) > 0


def test_basket_pair_support_against_reference(spark, sf_smoke):
    """A-Priori 2-itemset pass recomputed with plain dicts: distinct
    baskets, the ≤32-item cap, pair supports, exact integer lift via
    Python bigints (no overflow by construction), top-100 under the
    same (support DESC, a, b) order."""
    from fsc_etl_spark.plans.tpch_more import (
        _BASKET_MAX_ITEMS,
        _BASKET_TOPK,
        QUERIES,
    )

    li = read_parquet_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    baskets: dict[int, set[int]] = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    baskets = {k: v for k, v in baskets.items() if len(v) <= _BASKET_MAX_ITEMS}
    nb = len(baskets)
    cnt: dict[int, int] = {}
    sup: dict[tuple[int, int], int] = {}
    for parts in baskets.values():
        pl = sorted(parts)
        for i, pa in enumerate(pl):
            cnt[pa] = cnt.get(pa, 0) + 1
            for pb in pl[i + 1:]:
                sup[(pa, pb)] = sup.get((pa, pb), 0) + 1
    top = sorted(sup.items(), key=lambda kv: (-kv[1], kv[0]))[:_BASKET_TOPK]
    expect = [
        (pa, pb, s, (1_000_000 * s * nb) // (cnt[pa] * cnt[pb]))
        for (pa, pb), s in top
    ]
    got = [
        (r.part_a, r.part_b, r.support, r.lift_ppm)
        for r in QUERIES["basket_pair_support"](spark, sf_smoke).collect()
    ]
    assert got == expect and len(got) > 0


def test_rolling_distinct_users_against_reference(spark, sf_smoke):
    """Trailing-7-day distinct users recomputed with plain sets: per
    observed day, the union of active-user sets over [day-6, day]."""
    import datetime

    from fsc_etl_spark.plans.analytics_ext import _ROLLING_DAYS, QUERIES

    ev = read_parquet_table(spark, sf_smoke, "events").select(
        "ts", "user_id"
    ).collect()
    by_day: dict[datetime.date, set[int]] = {}
    for r in ev:
        by_day.setdefault(r.ts.date(), set()).add(r.user_id)
    expect = {}
    for d, users in by_day.items():
        win: set[int] = set()
        for k in range(_ROLLING_DAYS):
            win |= by_day.get(d - datetime.timedelta(days=k), set())
        expect[d] = (len(users), len(win))
    got = {
        r.day: (r.users_1d, r.users_7d)
        for r in QUERIES["rolling_distinct_users"](spark, sf_smoke).collect()
    }
    assert got == expect and len(got) > 0


def test_ktruss_coparts_against_reference(spark, sf_smoke):
    """k-truss recomputed with plain sets: adjacency dicts, per-edge
    common-neighbor counts, literal peel loop to the fixpoint (no
    round cap — the reference iterates until stable), then the same
    support histogram."""
    from fsc_etl_spark.plans.graph_ops import _KTRUSS_K, QUERIES

    li = read_parquet_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    by_order: dict[int, set[int]] = {}
    for r in li:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    edges: set[tuple[int, int]] = set()
    for parts in by_order.values():
        pl = sorted(parts)
        for i, x in enumerate(pl):
            for y in pl[i + 1:]:
                edges.add((x, y))
    while True:
        nb: dict[int, set[int]] = {}
        for x, y in edges:
            nb.setdefault(x, set()).add(y)
            nb.setdefault(y, set()).add(x)
        sup = {e: len(nb[e[0]] & nb[e[1]]) for e in edges}
        bad = {e for e, s in sup.items() if s < _KTRUSS_K - 2}
        if not bad:
            break
        edges -= bad
    hist: dict[int, list[int]] = {}
    for (x, y), s in sup.items():
        h = hist.setdefault(s, [0, x, y])
        h[0] += 1
        h[1] = min(h[1], x)
        h[2] = max(h[2], y)
    expect = {s: tuple(v) for s, v in hist.items()}
    got = {
        r.sup: (r.n_edges, r.min_lo, r.max_hi)
        for r in QUERIES["ktruss_coparts"](spark, sf_smoke).collect()
    }
    assert got == expect and len(got) > 0


def test_cusum_changepoint_against_reference(spark, sf_smoke):
    """Page's CUSUM recomputed with plain dicts: per-type daily
    counts, n_days-scaled deviations (so the walk is integer and ends
    at exactly 0), running-sum walk, range and earliest-argmax-|S|
    changepoint."""
    from fsc_etl_spark.plans.scale_ops import QUERIES

    ev = read_parquet_table(spark, sf_smoke, "events").select(
        "event_type", "ts"
    ).collect()
    daily: dict[str, dict] = {}
    for r in ev:
        d = daily.setdefault(r.event_type, {})
        day = r.ts.date()
        d[day] = d.get(day, 0) + 1
    expect = {}
    for et, d in daily.items():
        days = sorted(d)
        n, total = len(days), sum(d.values())
        s = 0
        walk = []
        for day in days:
            s += n * d[day] - total
            walk.append((day, s))
        assert walk[-1][1] == 0  # the scaled walk must close exactly
        rng = max(v for _, v in walk) - min(v for _, v in walk)
        cp_day, cp_s = min(walk, key=lambda t: (-abs(t[1]), t[0]))
        expect[et] = (n, rng, cp_day, cp_s)
    got = {
        r.event_type: (r.n_days, r.cusum_range, r.cp_day, r.s_at_cp)
        for r in QUERIES["cusum_changepoint"](spark, sf_smoke).collect()
    }
    assert got == expect and len(got) > 0


def test_community_modularity_against_reference(spark, sf_smoke):
    """3-round deterministic LPA over the co-parts graph plus Newman
    modularity recomputed with plain dicts and Python big ints: e_c
    counts directed intra-community edges, d_c sums member degrees,
    q_ppm via the same truncating division the Spark `div` uses."""
    from fsc_etl_spark.plans.graph_ops import QUERIES as GRAPH_QUERIES

    li, _ = _copurchase_pairs(spark, sf_smoke)
    by_order: dict[int, set] = {}
    for r in li:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label = {v: v for v in adj}
    for _ in range(3):
        nxt = {}
        for v, neigh in adj.items():
            cnt: dict[int, int] = {}
            for u in neigh:
                cnt[label[u]] = cnt.get(label[u], 0) + 1
            nxt[v] = max(cnt.items(), key=lambda kv: (kv[1], kv[0]))[0]
        label = nxt
    two_m = 2 * len(edges)
    e_c: dict[int, int] = {}
    d_c: dict[int, int] = {}
    for a, b in edges:
        if label[a] == label[b]:
            e_c[label[a]] = e_c.get(label[a], 0) + 2
    for v, neigh in adj.items():
        d_c[label[v]] = d_c.get(label[v], 0) + len(neigh)
    sum_e = sum(e_c.values())
    sum_d2 = sum(d * d for d in d_c.values())
    num = 1_000_000 * (two_m * sum_e - sum_d2)
    den = two_m * two_m
    q = (num // den) if num >= 0 else -((-num) // den)  # Spark-div truncation
    [r] = GRAPH_QUERIES["community_modularity"](spark, sf_smoke).collect()
    assert (
        r.n_communities,
        r.two_m,
        r.internal_edges,
        r.deg_sq_sum,
        r.q_ppm,
    ) == (len(d_c), two_m, sum_e, sum_d2, q)


def test_graph_conductance_against_reference(spark, sf_smoke):
    """Per-community conductance recomputed with plain dicts and
    Python big ints over the same 3-round LPA partition: cut = vol −
    directed-internal, phi_ppm = (10⁶·cut) // min(vol, 2m−vol)
    (non-negative, floor == Spark's truncating div), NULL when the
    community spans the whole graph; top-20 by (size DESC, label)."""
    from fsc_etl_spark.plans.graph_ops import QUERIES as GRAPH_QUERIES

    li, _ = _copurchase_pairs(spark, sf_smoke)
    by_order: dict[int, set] = {}
    for r in li:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    label = {v: v for v in adj}
    for _ in range(3):
        nxt = {}
        for v, neigh in adj.items():
            cnt: dict[int, int] = {}
            for u in neigh:
                cnt[label[u]] = cnt.get(label[u], 0) + 1
            nxt[v] = max(cnt.items(), key=lambda kv: (kv[1], kv[0]))[0]
        label = nxt
    two_m = 2 * len(edges)
    size: dict[int, int] = {}
    vol: dict[int, int] = {}
    e_c: dict[int, int] = {}
    for v, neigh in adj.items():
        size[label[v]] = size.get(label[v], 0) + 1
        vol[label[v]] = vol.get(label[v], 0) + len(neigh)
    for a, b in edges:
        if label[a] == label[b]:
            e_c[label[a]] = e_c.get(label[a], 0) + 2
    expected = []
    for lab in sorted(size, key=lambda c: (-size[c], c))[:20]:
        cut = vol[lab] - e_c.get(lab, 0)
        den = min(vol[lab], two_m - vol[lab])
        phi = (1_000_000 * cut) // den if den > 0 else None
        expected.append((lab, size[lab], vol[lab], cut, phi))
    got = [
        (r.label, r.community_size, r.vol, r.cut_edges, r.phi_ppm)
        for r in GRAPH_QUERIES["graph_conductance"](spark, sf_smoke).collect()
    ]
    assert got == expected


def test_local_clustering_coeff_against_reference(spark, sf_smoke):
    """Per-node lcc recomputed by brute force over neighbor sets
    (tri(v) = adjacent neighbor pairs), lcc_ppm via Python floor of
    non-negative big ints, then the same decile bucketing with d < 2
    in bucket −1."""
    from fsc_etl_spark.plans.graph_ops import QUERIES as GRAPH_QUERIES

    li, _ = _copurchase_pairs(spark, sf_smoke)
    by_order: dict[int, set] = {}
    for r in li:
        by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    adj: dict[int, set] = {}
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                adj.setdefault(ps[i], set()).add(ps[j])
                adj.setdefault(ps[j], set()).add(ps[i])
    buckets: dict[int, list] = {}
    for v, neigh in adj.items():
        nl = sorted(neigh)
        tri = sum(
            1
            for i in range(len(nl))
            for j in range(i + 1, len(nl))
            if nl[j] in adj[nl[i]]
        )
        d = len(neigh)
        if d < 2:
            b, ppm = -1, None
        else:
            ppm = (2_000_000 * tri) // (d * (d - 1))
            b = min(ppm // 100_000, 9)
        buckets.setdefault(b, []).append((ppm, tri))
    expected = [
        (
            b,
            len(vals),
            min((p for p, _ in vals if p is not None), default=None),
            max((p for p, _ in vals if p is not None), default=None),
            sum(t for _, t in vals),
        )
        for b, vals in sorted(buckets.items())
    ]
    got = [
        (r.bucket, r.n_nodes, r.min_lcc_ppm, r.max_lcc_ppm, r.sum_triangles)
        for r in GRAPH_QUERIES["local_clustering_coeff"](spark, sf_smoke).collect()
    ]
    assert got == expected


def test_weighted_priority_sample_against_reference(spark, sf_smoke):
    """Priority sampling recomputed with hashlib and Python big ints:
    u = 28 bits of md5(str(doc_id)) + 1, priority = (w << 40) // u
    (non-negative, so floor == Spark's truncating div), top-50 by
    (priority DESC, doc_id ASC)."""
    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "doc_id", "text"
    ).collect()
    scored = []
    for d in docs:
        w = len(_toks(d.text))
        u = int(hashlib.md5(str(d.doc_id).encode()).hexdigest()[:7], 16) + 1
        scored.append(((w * (1 << 40)) // u, d.doc_id, w))
    scored.sort(key=lambda t: (-t[0], t[1]))
    expect = [(doc_id, w, q) for q, doc_id, w in scored[:50]]
    got = [
        (r.doc_id, r.n_tokens, r.priority)
        for r in TD_QUERIES["weighted_priority_sample"](spark, sf_smoke).collect()
    ]
    assert got == expect and len(got) == 50


def test_sorted_neighborhood_pairs_against_reference(spark, sf_smoke):
    """Block-scoped sorted-neighborhood blocking recomputed with plain
    Python: 24-char lowercased key, 8-char prefix blocks, per-block
    sort by (key, doc_id), offsets 1-2 pairs, distinct-token Jaccard
    ppm via non-negative big-int floor; top-20 by the same order."""
    from fsc_etl_spark.plans.training_data import QUERIES as TD_QUERIES

    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "doc_id", "text"
    ).collect()
    rows = []
    for r in docs:
        key = r.text.strip().lower()[:24]
        tok = set(t for t in r.text.strip().split() if t)
        rows.append((key[:8], key, r.doc_id, tok))
    blocks: dict[str, list] = {}
    for b, key, did, tok in rows:
        blocks.setdefault(b, []).append((key, did, tok))
    pairs = []
    for b, members in blocks.items():
        members.sort(key=lambda x: (x[0], x[1]))
        for i, (_, did, tok) in enumerate(members):
            for off in (1, 2):
                if i + off < len(members):
                    _, did2, tok2 = members[i + off]
                    nu = len(tok | tok2)
                    if nu > 0:
                        pairs.append(
                            (b, did, did2, (1_000_000 * len(tok & tok2)) // nu)
                        )
    pairs.sort(key=lambda p: (-p[3], p[1], p[2]))
    expect = pairs[:20]
    got = [
        (r.block, r.doc_a, r.doc_b, r.jaccard_ppm)
        for r in TD_QUERIES["sorted_neighborhood_pairs"](spark, sf_smoke).collect()
    ]
    assert got == expect


def test_maxsim_late_interaction_against_reference(spark, sf_smoke):
    """MaxSim recomputed with plain Python floats: 4x16 subvector
    slices, per-pair cos rounded to 6dp, max per query slot, micro
    quantization, integer sum, top-5 per query by (score, vec_id)."""
    import math

    from fsc_etl_spark.plans.training_data import QUERIES as TD_QUERIES

    rows = read_parquet_table(spark, sf_smoke, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    subs = {}
    for r in rows:
        v = [float(x) for x in r.embedding]
        subs[r.vec_id] = [
            (sv, math.sqrt(sum(x * x for x in sv)))
            for sv in (v[i * 16 : (i + 1) * 16] for i in range(4))
        ]
    scores = {}
    for qid in [i for i in subs if i < 5]:
        for cid in subs:
            if cid == qid:
                continue
            total = 0
            for qv, qn in subs[qid]:
                best = max(
                    round(
                        sum(a * b for a, b in zip(qv, cv)) / (qn * cn), 6
                    )
                    for cv, cn in subs[cid]
                )
                total += int(round(best * 1_000_000))
            scores[(qid, cid)] = total
    expect = []
    for qid in sorted({q for q, _ in scores}):
        cand = sorted(
            ((s, c) for (q, c), s in scores.items() if q == qid),
            key=lambda x: (-x[0], x[1]),
        )[:5]
        expect += [(qid, c, s, i + 1) for i, (s, c) in enumerate(cand)]
    got = sorted(
        (r.query_id, r.vec_id, r.score_micro, r.rank)
        for r in TD_QUERIES["maxsim_late_interaction"](spark, sf_smoke).collect()
    )
    assert got == sorted(expect)


def test_basket_triple_support_against_reference(spark, sf_smoke):
    """A-Priori 3-itemsets recomputed with itertools over per-order
    distinct-part baskets (cap 32), all-confidence via non-negative
    big-int floor; top-50 by (support DESC, a, b, c)."""
    from itertools import combinations

    from fsc_etl_spark.plans.tpch_more import QUERIES as TPCH_QUERIES

    li = read_parquet_table(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    baskets: dict[int, set] = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    baskets = {k: v for k, v in baskets.items() if len(v) <= 32}
    cnt: dict[int, int] = {}
    sup: dict[tuple, int] = {}
    for parts in baskets.values():
        for p in parts:
            cnt[p] = cnt.get(p, 0) + 1
        for tri in combinations(sorted(parts), 3):
            sup[tri] = sup.get(tri, 0) + 1
    rows = sorted(
        (
            (-s, a, b, c, s, (1_000_000 * s) // max(cnt[a], cnt[b], cnt[c]))
            for (a, b, c), s in sup.items()
        )
    )[:50]
    expect = [(a, b, c, s, ac) for _, a, b, c, s, ac in rows]
    got = [
        (r.part_a, r.part_b, r.part_c, r.support, r.all_conf_ppm)
        for r in TPCH_QUERIES["basket_triple_support"](spark, sf_smoke).collect()
    ]
    assert got == expect


def test_weak_label_agreement_against_reference(spark, sf_smoke):
    """The 21 weak-supervision counters recomputed with plain Python
    token counting over the same three keyword labeling functions."""
    from fsc_etl_spark.plans.training_data import (
        QUERIES as TD_QUERIES,
        _WEAK_LFS,
    )

    docs = read_parquet_table(spark, sf_smoke, "documents").select(
        "text"
    ).collect()
    names = [n for n, _, _ in _WEAK_LFS]
    labels = []
    for r in docs:
        tk = [t for t in r.text.strip().split() if t]
        lab = {}
        for name, p, n in _WEAK_LFS:
            d = tk.count(p) - tk.count(n)
            lab[name] = (d > 0) - (d < 0)
        s = sum(lab.values())
        lab["vote"] = (s > 0) - (s < 0)
        labels.append(lab)
    c: dict[tuple, int] = {}

    def add(scope, metric, cond):
        c[(scope, metric)] = c.get((scope, metric), 0) + (1 if cond else 0)

    for lab in labels:
        for name in names:
            add(name, "coverage", lab[name] != 0)
            add(name, "n_neg", lab[name] == -1)
            add(name, "n_pos", lab[name] == 1)
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                a, b = names[i], names[j]
                both = lab[a] != 0 and lab[b] != 0
                add(f"{a}|{b}", "n_agree", both and lab[a] == lab[b])
                add(f"{a}|{b}", "n_both", both)
                add(f"{a}|{b}", "n_conflict", both and lab[a] != lab[b])
        add("vote", "n_neg", lab["vote"] == -1)
        add("vote", "n_pos", lab["vote"] == 1)
        add("vote", "n_zero", lab["vote"] == 0)
    expect = [(s, m, v) for (s, m), v in sorted(c.items())]
    got = [
        (r.scope, r.metric, r.value)
        for r in TD_QUERIES["weak_label_agreement"](spark, sf_smoke).collect()
    ]
    assert got == expect
