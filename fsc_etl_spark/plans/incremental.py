"""Derived-state maintenance queries: incremental join refresh and the
feature-store point-in-time join — driver-checkable with exact
oracles.

No reference twin: the reference (549-line Databricks notebook ETL,
/root/reference/main.py) maintains state only via full MERGEs; these
extend SURVEY.md §2.12 with the two patterns a 100 TB feature/metrics
platform lives on: refreshing a materialized join with delta-sized
work instead of a recompute, and attaching the dimension state that
was valid AT event time (no leakage from the future).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fsc_etl_spark.sources.readers import read_parquet_table as t

_CUTOFF = "1999-01-01"


def incremental_join_maintenance(spark: SparkSession, sf: str) -> DataFrame:
    """Materialized-join refresh with delta-sized work: with
    A = orders (base before {cutoff} / delta after) and B = customer
    (base keys / delta keys), the maintained join is

        A_base ⋈ B_base  ∪  ΔA ⋈ B_full  ∪  A_base ⋈ ΔB

    — an exact decomposition of A_full ⋈ B_full (each pair lands in
    exactly one term), so refresh shuffles only the deltas against the
    other side instead of recomputing the join. The oracle IS the
    monolithic full join, which is the whole point: incremental
    result == recompute result, hash-checked.

    At 100 TB the base⋈base term is the standing materialization (not
    recomputed per refresh); here it's evaluated inline because the
    driver contract is a single stateless query.
    """
    o = t(spark, sf, "orders").select(
        "o_custkey",
        "o_orderdate",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias("vc"),
    )
    c = t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    cut = F.lit(_CUTOFF).cast("timestamp")
    a_base = o.filter(F.col("o_orderdate") < cut)
    a_delta = o.filter(F.col("o_orderdate") >= cut)
    b_base = c.filter(F.col("c_custkey") % 10 != 0)
    b_delta = c.filter(F.col("c_custkey") % 10 == 0)

    on = lambda a, b: a["o_custkey"] == b["c_custkey"]  # noqa: E731
    joined = (
        a_base.join(b_base, on(a_base, b_base))
        .unionByName(a_delta.join(c, on(a_delta, c)))
        .unionByName(a_base.join(b_delta, on(a_base, b_delta)))
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("vc").alias("sum_cents"),
    )


def pit_feature_join(spark: SparkSession, sf: str) -> DataFrame:
    """Feature-store point-in-time join: each purchase event gets the
    user's daily value-state that was valid STRICTLY BEFORE the
    purchase day — never same-day or future state, the leakage rule
    every training-label join must obey.

    One shuffle on user_id: daily states (last event per user-day)
    and purchases are unioned and swept with an ignorenulls last()
    window; the sort key (day, kind) puts same-day states AFTER
    purchases so they are invisible to them. No per-event interval
    probe, no range join — the as-of union-sweep shape.
    """
    ev = t(spark, sf, "events").select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.to_date("ts").alias("day"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("vc"),
    )
    w_day = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    daily = (
        ev.withColumn("rn", F.row_number().over(w_day))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "day",
            F.lit(1).alias("kind"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("long").alias("vc"),
            F.col("vc").alias("state_cents"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "day",
        F.lit(0).alias("kind"),
        "event_id",
        "vc",
        F.lit(None).cast("long").alias("state_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = daily.unionByName(purchases).withColumn(
        "pit_state_cents", F.last("state_cents", ignorenulls=True).over(w)
    )
    return swept.filter(F.col("kind") == 0).select(
        "event_id", "user_id", "vc", "pit_state_cents"
    )


QUERIES = {
    "incremental_join_maintenance": incremental_join_maintenance,
    "pit_feature_join": pit_feature_join,
}

INCREMENTAL_ORACLES = {
    "incremental_join_maintenance": """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
            AS BIGINT) AS sum_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    "pit_feature_join": """
WITH ranked AS (
  SELECT user_id, CAST(ts AS DATE) AS day, value,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, CAST(ts AS DATE)
           ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
),
daily AS (
  SELECT user_id, day,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS state_cents
  FROM ranked WHERE rn = 1
),
p AS (
  SELECT event_id, user_id, CAST(ts AS DATE) AS day,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.vc,
       (SELECT d.state_cents FROM daily d
        WHERE d.user_id = p.user_id AND d.day < p.day
        ORDER BY d.day DESC LIMIT 1) AS pit_state_cents
FROM p
""",
}
