"""TPC-H Q2/Q11/Q16/Q20 — the four shapes whose original form needs
the partsupp table, which the driver's trimmed schema omits. They run
here over a DERIVED part-supplier relation: the distinct
(l_partkey, l_suppkey) pairs observed in lineitem, with
``supplycost := min(l_extendedprice)`` and ``availqty :=
sum(l_quantity)`` as deterministic proxies (exact decimal aggregates,
so both engines derive bit-identical relations). The query SHAPES —
correlated-min subquery, group-vs-global-scalar HAVING, NOT-IN
anti-join with multi-column grouping, nested semi-joins with a
correlated aggregate threshold — are the TPC-H originals.

This module completes the full TPC-H 22 across plans/analytics*.py /
tpch_more.py (the reference has none of these — SURVEY.md §2.12).

Scale notes (100 TB posture):
- the derived relation is ONE exact groupBy of lineitem on
  (partkey, suppkey) — at scale you'd materialize it bucketed by
  partkey and reuse it across all four queries;
- Q2's per-part minimum is a window over the correlation key (single
  shuffle), not a self-join;
- Q11's global total is a 1-row broadcast; Q16's exclusion list and
  Q20's part filter broadcast into semi/anti joins — no fact-side
  duplication anywhere.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fsc_etl_spark.sources.readers import read_parquet_table as t


def _dec(col: str, scale: int = 2) -> F.Column:
    return F.col(col).cast(f"decimal(18,{scale})")


def _partsupp(spark: SparkSession, sf: str) -> DataFrame:
    """The derived part-supplier relation (see module docstring)."""
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(_dec("l_extendedprice")).cast("double").alias("supplycost"),
            F.sum(_dec("l_quantity")).cast("double").alias("availqty"),
        )
    )


def q2_min_cost_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape: for STANDARD parts of size 15, the EUROPE
    supplier(s) offering the minimum cost. The correlated MIN subquery
    is a window over the correlation key (l_partkey) computed on the
    already-region-filtered relation — one shuffle, no self-join."""
    ps = _partsupp(spark, sf)
    part = t(spark, sf, "part").filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") == 15)
    ).select("p_partkey", "p_name")
    supp = t(spark, sf, "supplier").select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    nation = t(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = t(spark, sf, "region").filter(F.col("r_name") == "EUROPE").select("r_regionkey")
    eu = (
        ps.join(F.broadcast(part), ps["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), ps["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        eu.withColumn("min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supplycost")
    )


def q11_important_stock(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape: per-part stock value for NATION_3 suppliers,
    kept when above 1/1000 of the national total — a grouped aggregate
    HAVING-compared against a scalar aggregate of itself (1-row
    broadcast cross join, exact decimal sums)."""
    ps = _partsupp(spark, sf)
    supp = t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf, "nation").filter(F.col("n_name") == "NATION_3").select("n_nationkey")
    nat = (
        ps.join(F.broadcast(supp), ps["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn(
            "value_dec",
            (F.col("supplycost").cast("decimal(18,2)")
             * F.col("availqty").cast("decimal(18,2)")).cast("decimal(28,4)"),
        )
    )
    # The national total folds from the per-part decimal sums (exact,
    # so sum-of-group-sums == global sum): the partsupp derivation and
    # its shuffle run ONCE, and the threshold branch re-reads by_part's
    # exchange (ReuseExchange) instead of re-joining lineitem.
    by_part = nat.groupBy("l_partkey").agg(F.sum("value_dec").alias("part_value_dec"))
    total = by_part.agg(
        (F.sum("part_value_dec").cast("double") / F.lit(1000.0)).alias("threshold")
    )
    return (
        by_part.withColumn("part_value", F.col("part_value_dec").cast("double"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("p_partkey"), "part_value")
    )


def q16_supplier_count(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type,
    size) for a size list, excluding one brand, one type, and a
    NOT-IN supplier set ('%7%' names stand in for the complaints
    filter) — the NOT IN compiles to a broadcast left-anti join."""
    ps = _partsupp(spark, sf).select("l_partkey", "l_suppkey")
    part = t(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 15, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    excluded = (
        t(spark, sf, "supplier")
        .filter(F.col("s_name").like("%7%"))
        .select(F.col("s_suppkey").alias("x_suppkey"))
    )
    return (
        ps.join(F.broadcast(part), ps["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(excluded), ps["l_suppkey"] == F.col("x_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q20_excess_stock_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_1 suppliers holding excess stock of
    'red' parts — availqty > 2x the 1996 shipped quantity for that
    (part, supplier). Nested semi-joins: the part filter semi-joins
    into the derived relation, the correlated 1996 aggregate joins on
    the composite key, and the qualifying suppkey set semi-joins into
    supplier. All small sides broadcast."""
    red_parts = (
        t(spark, sf, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = t(spark, sf, "lineitem")
    q96 = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(
            F.col("l_partkey").alias("q_partkey"), F.col("l_suppkey").alias("q_suppkey")
        )
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("qty96"))
    )
    ps = _partsupp(spark, sf)
    qualifying = (
        ps.join(F.broadcast(red_parts), ps["l_partkey"] == red_parts["p_partkey"], "left_semi")
        .join(
            q96,
            (ps["l_partkey"] == q96["q_partkey"]) & (ps["l_suppkey"] == q96["q_suppkey"]),
        )
        .filter(F.col("availqty") > F.lit(2.0) * F.col("qty96"))
        .select("l_suppkey")
    )
    supp = t(spark, sf, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = t(spark, sf, "nation").filter(F.col("n_name") == "NATION_1").select("n_nationkey")
    return (
        supp.join(qualifying, supp["s_suppkey"] == qualifying["l_suppkey"], "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("s_suppkey", "s_name")
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_stock": q11_important_stock,
    "q16_supplier_count": q16_supplier_count,
    "q20_excess_stock_suppliers": q20_excess_stock_suppliers,
}


_PS_SQL = """
  SELECT l_partkey, l_suppkey,
         CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS supplycost,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS availqty
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
"""

PARTSUPP_ORACLES: dict[str, str] = {}

PARTSUPP_ORACLES["q2_min_cost_supplier"] = f"""
WITH ps AS ({_PS_SQL}),
eu AS (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supplycost
  FROM ps
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_type = 'STANDARD' AND p_size = 15 AND r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supplycost
FROM eu e
WHERE supplycost = (SELECT MIN(supplycost) FROM eu e2 WHERE e2.p_partkey = e.p_partkey)
"""

PARTSUPP_ORACLES["q11_important_stock"] = f"""
WITH ps AS ({_PS_SQL}),
nat AS (
  SELECT l_partkey,
         CAST(CAST(supplycost AS DECIMAL(18,2))
              * CAST(availqty AS DECIMAL(18,2)) AS DECIMAL(28,4)) AS value_dec
  FROM ps
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
)
SELECT l_partkey AS p_partkey,
       CAST(SUM(value_dec) AS DOUBLE) AS part_value
FROM nat
GROUP BY l_partkey
HAVING CAST(SUM(value_dec) AS DOUBLE)
       > (SELECT CAST(SUM(value_dec) AS DOUBLE) / 1000.0 FROM nat)
"""

PARTSUPP_ORACLES["q16_supplier_count"] = f"""
WITH ps AS ({_PS_SQL})
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 15, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%')
GROUP BY p_brand, p_type, p_size
"""

PARTSUPP_ORACLES["q20_excess_stock_suppliers"] = f"""
WITH ps AS ({_PS_SQL}),
q96 AS (
  SELECT l_partkey AS q_partkey, l_suppkey AS q_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty96
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY 1, 2
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT ps.l_suppkey
  FROM ps
  JOIN q96 ON ps.l_partkey = q_partkey AND ps.l_suppkey = q_suppkey
  WHERE ps.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND availqty > 2.0 * qty96
)
AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_1')
"""
