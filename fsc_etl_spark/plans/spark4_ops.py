"""Spark 4-native SQL surfaces: the VARIANT semi-structured type and
SQL scripting (BEGIN/END procedural blocks) — driver-checkable with
exact DuckDB oracles.

No reference twin: the reference (549-line Databricks notebook,
/root/reference/main.py) predates both features; they extend
SURVEY.md §2.12's engine-surface coverage. The recursive-CTE twin of
this module lives in plans/graph_ops.recursive_ancestor_depth.

Both queries keep every computed quantity integer/decimal-exact so
the oracles hash-match: VARIANT extraction pulls BIGINTs, and the
scripted loop iterates an integer floor-division mean (no float
division anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fsc_etl_spark.sources.readers import read_parquet_table as t


def variant_props_stats(spark: SparkSession, sf: str) -> DataFrame:
    """events.props parsed into Spark 4's VARIANT type, typed field
    extraction via ``variant_get``, then a per-type rollup.

    VARIANT is the shredded semi-structured path — unlike
    ``get_json_object`` (string re-parse per access) the parse cost is
    paid once and fields extract from the binary encoding, which is
    the 100 TB answer for ragged JSON event payloads. The oracle reads
    the same field with DuckDB's JSON extraction.
    """
    ev = t(spark, sf, "events").select(
        "event_type",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


def sql_scripting_trimmed_mean(spark: SparkSession, sf: str) -> DataFrame:
    """Spark 4 SQL scripting (BEGIN/END, DECLARE, WHILE): an iterated
    trimmed mean over order prices — each round recomputes the
    floor-division mean of the values at or below the previous
    threshold, a classic robust-statistic loop that pure one-shot SQL
    cannot express without manual unrolling.

    All arithmetic is integer cents with ``div`` (floor on positives),
    so the three-round fixpoint is bit-identical to the oracle's
    unrolled CTE chain. The script runs on the engine; only the final
    SELECT's result comes back.
    """
    vc = (
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    )
    src = f"parquet.`{sf}/orders.parquet`"
    # Scripting is enabled only around the script call: the statement
    # body executes eagerly inside spark.sql (verified — the returned
    # frame collects fine after the restore), so flipping the conf
    # back never changes SQL semantics for later queries on the
    # shared session.
    prev = spark.conf.get("spark.sql.scripting.enabled", None)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        return spark.sql(
            f"""
            BEGIN
              DECLARE thr BIGINT DEFAULT 0;
              DECLARE i INT DEFAULT 0;
              SET thr = (SELECT sum({vc}) div count(*) FROM {src});
              WHILE i < 2 DO
                SET thr = (SELECT sum({vc}) div count(*) FROM {src}
                           WHERE {vc} <= thr);
                SET i = i + 1;
              END WHILE;
              SELECT thr AS trimmed_mean_cents,
                     (SELECT CAST(count(*) AS BIGINT) FROM {src}
                      WHERE {vc} <= thr) AS n_below;
            END
            """
        )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.scripting.enabled")
        else:
            spark.conf.set("spark.sql.scripting.enabled", prev)


def lateral_topk_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated LATERAL subquery (per-customer top-3 orders by
    price): the SQL-native form of top-k-per-group. Catalyst
    decorrelates this into a ranked window with a pushed group limit —
    the same physical shape as the explicit Window API twin
    (`window_topk_per_group`) — so the lateral syntax costs nothing
    at scale. Deterministic: ties broken by order key.
    """
    return spark.sql(
        f"""
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM parquet.`{sf}/customer.parquet` c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM parquet.`{sf}/orders.parquet` o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
        ) t
        """
    )


def xml_roundtrip_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Native XML source/sink parity (Spark 4 built-in, S5-family
    breadth): the documents profile written as row-tagged XML
    (partitioned write, no coalesce) and read back schema-first, then
    aggregated. Same invariant as the ORC twin
    (training_data.orc_roundtrip_stats): the oracle runs on the
    ORIGINAL parquet table, so a lossy round trip breaks the hash.
    """
    from fsc_etl_spark.scratch import scratch_path

    docs = t(spark, sf, "documents").select("doc_id", "source", "lang", "n_chars")
    path = scratch_path("xml") + "/documents_xml"
    docs.write.format("xml").option("rowTag", "doc").mode("overwrite").save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema(docs.schema)
        .load(path)
    )
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.col("lang")).alias("n_langs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


def session_window_stats(spark: SparkSession, sf: str) -> DataFrame:
    """The engine-native session operator: ``session_window(ts, gap)``
    groups each user's events into gap-separated sessions inside ONE
    aggregation (SessionWindow exec — sort within user partition, no
    self-join), versus the manual lag+cumsum islands the
    `sessionize_events` twin builds from window primitives.

    Gap semantics pinned by the oracle: a new session starts when the
    gap is >= 30 minutes exactly (Spark merges only on strict window
    overlap). Value sums in exact cents.
    """
    ev = t(spark, sf, "events").select(
        "user_id",
        "ts",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("vc"),
    )
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("vc").alias("sum_cents"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            "n_events",
            "sum_cents",
        )
    )


QUERIES = {
    "lateral_topk_orders": lateral_topk_orders,
    "session_window_stats": session_window_stats,
    "xml_roundtrip_stats": xml_roundtrip_stats,
    "sql_scripting_trimmed_mean": sql_scripting_trimmed_mean,
    "variant_props_stats": variant_props_stats,
}

SPARK4_ORACLES = {
    "session_window_stats": """
WITH ev AS (
  SELECT user_id, ts,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   < INTERVAL 30 MINUTE
              THEN 0 ELSE 1 END AS new_s,
         event_id
  FROM events
),
g AS (
  SELECT user_id, ts, vc,
         SUM(new_s) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS sid
  FROM ev
)
SELECT user_id,
       MIN(ts) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(vc) AS BIGINT) AS sum_cents
FROM g GROUP BY user_id, sid
""",
    "xml_roundtrip_stats": """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_id
FROM documents GROUP BY source
""",
    "lateral_topk_orders": """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
) t
""",
    "variant_props_stats": """
WITH ev AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(k) AS BIGINT) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(MAX(k) AS BIGINT) AS max_k
FROM ev GROUP BY event_type
""",
    "sql_scripting_trimmed_mean": """
WITH base AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
  FROM orders
),
t0 AS (SELECT SUM(vc) // COUNT(*) AS thr FROM base),
t1 AS (SELECT SUM(vc) // COUNT(*) AS thr FROM base, t0 WHERE vc <= t0.thr),
t2 AS (SELECT SUM(vc) // COUNT(*) AS thr FROM base, t1 WHERE vc <= t1.thr)
SELECT CAST(t2.thr AS BIGINT) AS trimmed_mean_cents,
       CAST(COUNT(*) AS BIGINT) AS n_below
FROM base, t2 WHERE vc <= t2.thr
GROUP BY t2.thr
""",
}
