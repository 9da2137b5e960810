"""Round-8 extension of the independent-reference program: plain-
Python recomputations for the JOIN-SEMANTICS-heavy queries (as-of,
interval, point-in-time), the time-series densification pair, and the
remaining event-analytics shapes — the classes where a translated
DuckDB twin would share exactly the subtle bugs (inclusive bounds,
same-instant ties, leakage windows) these tests pin.

Same contract as tests/test_independent_references.py: recompute from
the published definition with loops and dicts, require exact equality.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from fsc_etl_spark.plans.analytics import QUERIES as A_QUERIES
from fsc_etl_spark.plans.analytics_ext import QUERIES as EXT_QUERIES
from fsc_etl_spark.plans.analytics_more import QUERIES as MORE_QUERIES
from fsc_etl_spark.plans.incremental import QUERIES as INC_QUERIES
from fsc_etl_spark.plans.scale_ops import QUERIES as SCALE_QUERIES
from fsc_etl_spark.plans.training_data import QUERIES as TD_QUERIES
from fsc_etl_spark.sources.readers import read_parquet_table


def _events(spark, sf):
    return read_parquet_table(spark, sf, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    ).collect()


def _r6(v: float) -> Decimal:
    return Decimal(repr(v)).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def test_asof_click_purchase_against_reference(spark, sf_smoke):
    """Backward as-of join replayed as a per-click linear max scan:
    latest purchase with ts <= click_ts; same-instant purchases match
    (inclusive), ties at one instant resolve to the max
    (ts, event_id) — the documented struct-max rule."""
    ev = _events(spark, sf_smoke)
    purchases: dict[int, list] = {}
    for e in ev:
        if e.event_type == "purchase":
            purchases.setdefault(e.user_id, []).append((e.ts, e.event_id))
    expect = {}
    for e in ev:
        if e.event_type != "click":
            continue
        best = max(
            (p for p in purchases.get(e.user_id, []) if p[0] <= e.ts),
            default=None,
        )
        expect[e.event_id] = (
            e.user_id,
            e.ts,
            best[1] if best else None,
            best[0] if best else None,
        )
    got = {
        x.event_id: (x.user_id, x.click_ts, x.purchase_event_id, x.purchase_ts)
        for x in EXT_QUERIES["asof_click_purchase"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_range_join_recent_views_against_reference(spark, sf_smoke):
    """Interval join replayed as per-purchase counting with the exact
    documented bounds: left_ts − 30min < view_ts <= left_ts (strict
    lower, inclusive upper); purchases with no views emit 0 (left)."""
    from datetime import timedelta

    ev = _events(spark, sf_smoke)
    views: dict[int, list] = {}
    for e in ev:
        if e.event_type == "view":
            views.setdefault(e.user_id, []).append(e.ts)
    expect = {}
    for e in ev:
        if e.event_type != "purchase":
            continue
        lo = e.ts - timedelta(minutes=30)
        expect[(e.user_id, e.event_id)] = sum(
            1 for vt in views.get(e.user_id, []) if lo < vt <= e.ts
        )
    got = {
        (x.user_id, x.event_id): x.n_views
        for x in EXT_QUERIES["range_join_recent_views"](spark, sf_smoke).collect()
    }
    assert got == expect


def _cents(v, scale="0.01", mult=100) -> int:
    return int(Decimal(repr(v)).quantize(Decimal(scale), ROUND_HALF_UP) * mult)


def test_pit_feature_join_against_reference(spark, sf_smoke):
    """Point-in-time join replayed directly from the leakage rule:
    each purchase sees the last-event-of-day state of the latest day
    STRICTLY BEFORE the purchase day — never same-day, never future."""
    ev = _events(spark, sf_smoke)
    # daily state: last event per (user, day) by (ts desc, event_id desc)
    daily: dict[tuple, tuple] = {}
    for e in ev:
        k = (e.user_id, e.ts.date())
        cur = daily.get(k)
        if cur is None or (e.ts, e.event_id) > (cur[0], cur[1]):
            daily[k] = (e.ts, e.event_id, _cents(e.value))
    by_user: dict[int, list] = {}
    for (u, day), (_, _, st) in daily.items():
        by_user.setdefault(u, []).append((day, st))
    for lst in by_user.values():
        lst.sort()
    expect = {}
    for e in ev:
        if e.event_type != "purchase":
            continue
        day = e.ts.date()
        prior = [s for d, s in by_user.get(e.user_id, []) if d < day]
        expect[e.event_id] = (
            e.user_id,
            _cents(e.value),
            prior[-1] if prior else None,
        )
    got = {
        x.event_id: (x.user_id, x.vc, x.pit_state_cents)
        for x in INC_QUERIES["pit_feature_join"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_timeseries_gapfill_against_reference(spark, sf_smoke):
    from datetime import timedelta

    ev = _events(spark, sf_smoke)
    counts: dict[tuple, int] = {}
    for e in ev:
        k = (e.user_id, e.ts.date())
        counts[k] = counts.get(k, 0) + 1
    expect = {}
    users = {u for u, _ in counts}
    for u in users:
        days = [d for uu, d in counts if uu == u]
        d = min(days)
        while d <= max(days):
            expect[(u, d)] = counts.get((u, d), 0)
            d += timedelta(days=1)
    got = {
        (x.user_id, x.day): x.n_events
        for x in MORE_QUERIES["timeseries_gapfill"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_timeseries_locf_against_reference(spark, sf_smoke):
    """LOCF replayed as a per-user day sweep carrying the last
    observed exact-decimal day sum; days before the first observation
    stay None."""
    from datetime import timedelta

    ev = _events(spark, sf_smoke)
    sums: dict[tuple, Decimal] = {}
    for e in ev:
        k = (e.user_id, e.ts.date())
        sums[k] = sums.get(k, Decimal(0)) + Decimal(repr(e.value)).quantize(
            Decimal("0.000001"), ROUND_HALF_UP
        )
    expect = {}
    users = {u for u, _ in sums}
    for u in users:
        days = [d for uu, d in sums if uu == u]
        d, last = min(days), None
        while d <= max(days):
            if (u, d) in sums:
                last = float(sums[(u, d)])
            expect[(u, d)] = last
            d += timedelta(days=1)
    got = {
        (x.user_id, x.day): x.locf_value
        for x in MORE_QUERIES["timeseries_locf"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_sessionize_events_against_reference(spark, sf_smoke):
    """Sessionization replayed as a per-user ordered sweep: new
    session when the second-gap to the previous event EXCEEDS 1800
    (strict); the session counter is the running flag sum. Ties at
    one instant share a session by construction (gap 0)."""
    ev = sorted(_events(spark, sf_smoke), key=lambda e: (e.user_id, e.ts, e.event_id))
    expect = {}
    prev_user, prev_sec, sid = None, None, 0
    for e in ev:
        sec = int(e.ts.timestamp())  # epoch seconds, matches cast(ts as long)
        if e.user_id != prev_user:
            sid = 1
        elif sec - prev_sec > 1800:
            sid += 1
        expect[e.event_id] = (e.user_id, sid)
        prev_user, prev_sec = e.user_id, sec
    got = {
        x.event_id: (x.user_id, x.session_id)
        for x in A_QUERIES["sessionize_events"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_event_transition_matrix_against_reference(spark, sf_smoke):
    ev = sorted(_events(spark, sf_smoke), key=lambda e: (e.user_id, e.ts, e.event_id))
    counts: dict[tuple, int] = {}
    prev_user, prev_type = None, None
    for e in ev:
        if e.user_id == prev_user:
            k = (prev_type, e.event_type)
            counts[k] = counts.get(k, 0) + 1
        prev_user, prev_type = e.user_id, e.event_type
    totals: dict[str, int] = {}
    for (p, _), n in counts.items():
        totals[p] = totals.get(p, 0) + n
    expect = {
        k: (n, float(_r6(n / totals[k[0]]))) for k, n in counts.items()
    }
    got = {
        (x.prev_type, x.next_type): (x.n, x.p)
        for x in EXT_QUERIES["event_transition_matrix"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_user_funnel_against_reference(spark, sf_smoke):
    ev = _events(spark, sf_smoke)
    firsts: dict[int, dict[str, object]] = {}
    for e in ev:
        d = firsts.setdefault(e.user_id, {})
        if e.event_type in ("view", "click", "purchase"):
            if e.event_type not in d or e.ts < d[e.event_type]:
                d[e.event_type] = e.ts
    expect = {}
    for u, d in firsts.items():
        v, c, p = d.get("view"), d.get("click"), d.get("purchase")
        conv = v is not None and c is not None and p is not None and v < c < p
        expect[u] = (v, c, p, conv)
    got = {
        x.user_id: (x.first_view, x.first_click, x.first_purchase, x.converted)
        for x in TD_QUERIES["user_funnel"](spark, sf_smoke).collect()
    }
    assert got == expect


def test_k_anonymity_audit_against_reference(spark, sf_smoke):
    cust = read_parquet_table(spark, sf_smoke, "customer").select(
        "c_mktsegment", "c_nationkey"
    ).collect()
    counts: dict[tuple, int] = {}
    for c in cust:
        k = (c.c_mktsegment, c.c_nationkey)
        counts[k] = counts.get(k, 0) + 1
    expect = {k: (n, n < 5) for k, n in counts.items()}
    got = {
        (x.c_mktsegment, x.c_nationkey): (x.class_size, x.at_risk)
        for x in SCALE_QUERIES["k_anonymity_audit"](spark, sf_smoke).collect()
    }
    assert got == expect
