"""Edge-case and accuracy tests for the §2.12 gap operators — the
oracle gate covers happy-path parity; these cover what SQL comparison
can't: approximate-aggregate error bounds and as-of/range join
boundary semantics on crafted inputs.
"""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fsc_etl_spark.operators.joins import asof_join, range_join
from fsc_etl_spark.plans.analytics_ext import approx_user_stats
from fsc_etl_spark.sources.readers import read_parquet_table

T0 = dt.datetime(2024, 5, 1, 12, 0, 0)

LEFT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("lid", T.LongType()),
        T.StructField("lts", T.TimestampType()),
    ]
)
RIGHT_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("rid", T.LongType()),
        T.StructField("rts", T.TimestampType()),
    ]
)


def _mins(m: int) -> dt.datetime:
    return T0 + dt.timedelta(minutes=m)


def test_asof_join_boundaries(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, lid=1, lts=_mins(10)),  # right rows at 0 and 10 -> picks 10 (<=)
            Row(k=1, lid=2, lts=_mins(5)),   # only right row at 0 qualifies
            Row(k=2, lid=3, lts=_mins(1)),   # right row is LATER -> null
            Row(k=3, lid=4, lts=_mins(1)),   # key has no right rows -> null
        ],
        LEFT_SCHEMA,
    )
    right = spark.createDataFrame(
        [
            Row(k=1, rid=100, rts=_mins(0)),
            Row(k=1, rid=101, rts=_mins(10)),
            Row(k=2, rid=200, rts=_mins(2)),
        ],
        RIGHT_SCHEMA,
    )
    out = {
        r["lid"]: (r["rid_asof"], r["rts_asof"])
        for r in asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts").collect()
    }
    assert out[1] == (101, _mins(10))  # equal ts matches
    assert out[2] == (100, _mins(0))
    assert out[3] == (None, None)  # no earlier right row
    assert out[4] == (None, None)  # no right rows at all


def test_asof_payload_fields_come_from_same_row(spark):
    """A right payload column that is null in the LATEST row must stay
    null — not be backfilled from an older row (struct semantics)."""
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("rts", T.TimestampType()),
            T.StructField("a", T.StringType()),
            T.StructField("b", T.StringType()),
        ]
    )
    right = spark.createDataFrame(
        [Row(k=1, rts=_mins(0), a="old_a", b="old_b"), Row(k=1, rts=_mins(5), a=None, b="new_b")],
        schema,
    )
    left = spark.createDataFrame([Row(k=1, lid=1, lts=_mins(9))], LEFT_SCHEMA)
    row = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts").collect()[0]
    assert row["b_asof"] == "new_b"
    assert row["a_asof"] is None  # NOT "old_a"


def test_range_join_window_boundaries(spark):
    left = spark.createDataFrame([Row(k=1, lid=1, lts=_mins(60))], LEFT_SCHEMA)
    right = spark.createDataFrame(
        [
            Row(k=1, rid=1, rts=_mins(29)),  # 31 min before: outside (> lower)
            Row(k=1, rid=2, rts=_mins(30)),  # exactly 30 min before: inside (strict >)
            Row(k=1, rid=3, rts=_mins(60)),  # same instant: inside (<=)
            Row(k=1, rid=4, rts=_mins(61)),  # after: outside
            Row(k=2, rid=5, rts=_mins(45)),  # other key
        ],
        RIGHT_SCHEMA,
    )
    out = range_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts", lower="INTERVAL 30 MINUTES"
    )
    got = sorted(r["rid"] for r in out.collect())
    # boundary at exactly -30min: rts > lts - 30min is strict, so rid=2
    # (exactly 30 before) is EXCLUDED; same-instant rid=3 included.
    assert got == [3]


def test_approx_aggregates_error_bounds(spark, sf_smoke):
    """The query now EMBEDS its error bounds as boolean contract
    columns (VERDICT r8 #6); every bound must hold on the fixtures and
    the exact column must equal an independently-computed distinct."""
    ev = read_parquet_table(spark, sf_smoke, "events")
    exact = {
        r["event_type"]: r["users"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"))
        .collect()
    }
    approx = {r["event_type"]: r for r in approx_user_stats(spark, sf_smoke).collect()}
    assert set(approx) == set(exact)
    for et, row in approx.items():
        assert row["exact_users"] == exact[et]
        assert row["users_within_5pct"], et
        assert row["p50_within_tol"], et
        assert row["p95_within_tol"], et
        assert row["quantiles_ordered"], et


def test_builtin_moments_match_exact_closed_form(spark, sf_smoke):
    """stats_moments_breadth computes moments from exact decimal power
    sums; Spark's double-accumulating built-ins must agree to ~1e-6 —
    this bounds the closed form against var_samp/stddev/corr."""
    from fsc_etl_spark.plans.analytics_more import stats_moments_breadth

    exact = {
        r["l_returnflag"]: r for r in stats_moments_breadth(spark, sf_smoke).collect()
    }
    built = (
        read_parquet_table(spark, sf_smoke, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.var_samp("l_quantity").alias("v"),
            F.stddev("l_extendedprice").alias("s"),
            F.corr("l_quantity", "l_extendedprice").alias("c"),
        )
        .collect()
    )
    assert {r["l_returnflag"] for r in built} == set(exact)
    for r in built:
        e = exact[r["l_returnflag"]]
        assert abs(r["v"] - e["var_qty"]) < 1e-4 * max(1.0, abs(e["var_qty"]))
        assert abs(r["s"] - e["std_price"]) < 1e-4 * max(1.0, abs(e["std_price"]))
        assert abs(r["c"] - e["corr_qty_price"]) < 1e-6


def test_dq_enforce_raises_and_passes(spark):
    from fsc_etl_spark.operators.quality import (
        enforce,
        expect_between,
        expect_in_set,
        expect_not_null,
        expect_unique,
    )

    bad = spark.createDataFrame(
        [(1, "A", 10.0), (1, "Z", -5.0), (None, "A", 20.0)], "k int, s string, v double"
    )
    with pytest.raises(ValueError) as exc:
        enforce(
            bad,
            {
                "null_k": expect_not_null("k"),
                "dup_k": expect_unique("k"),
                "bad_s": expect_in_set("s", ["A", "B"]),
                "v_range": expect_between("v", 0.0, 100.0),
            },
        )
    msg = str(exc.value)
    for rule in ("null_k", "dup_k", "bad_s", "v_range"):
        assert rule in msg
    ok = spark.createDataFrame([(1, "A", 10.0), (2, "B", 5.0)], "k int, s string, v double")
    out = enforce(ok, {"null_k": expect_not_null("k"), "dup_k": expect_unique("k")})
    assert out is ok


def test_rollup_merge_is_one_shuffle_per_branch(spark, sf_smoke):
    """The maintenance merge must re-aggregate partials (sum of n,
    sum of sums), not re-expand: the plan has hash aggregates, no
    window, no join on the merged side."""
    import __spark_entry__ as entrymod

    df = entrymod.queries()["rollup_incremental_merge"](spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan


def test_hll_estimates_close_to_exact(spark, sf_smoke):
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["hll_daily_users"](spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r.daily_within_10pct, r
        assert r.total_within_5pct, r
        assert r.exact_daily > 0, r
    all_days = {r.day for r in rows}  # sanity: days distinct
    assert len(all_days) == len(rows)
