"""Analytic breadth beyond plans/analytics{,_ext}: subquery shapes
(EXISTS, IN, scalar, correlated), conditional aggregation, join+agg+
top-k, lag/ntile windows, sorted array aggregation, exact percentiles,
and string/date scalar-function coverage.

The reference has none of these (SURVEY.md §2.12 gap list) — they are
the general-analytics surface a user of a Spark-native engine expects.
Same determinism rules as plans/analytics.py: exact-decimal
accumulation wherever doubles are summed (so Spark's partial-agg order
cannot drift from DuckDB's sequential order), explicit aliases shared
with the oracle, and total orderings before any LIMIT.

Scale notes (100 TB posture):
- every aggregate is expressed groupBy-first so map-side partial
  aggregation shrinks the shuffle before it happens;
- q10 aggregates lineitem⋈orders down to one row per custkey BEFORE
  touching the customer dimension — the wide rows join after the
  reduction, not before;
- the EXISTS / IN shapes compile to left-semi hash joins (no row
  explosion, no distinct needed);
- the NTILE decile surface is lowered to a value-domain histogram +
  integer split arithmetic (decile_bucket_scalable) — bit-identical to
  the global NTILE window without a single-partition full-table sort.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fsc_etl_spark.sources.readers import read_parquet_table as t


def _dec(col: str, scale: int = 2) -> F.Column:
    return F.col(col).cast(f"decimal(18,{scale})")


def _disc_price() -> F.Column:
    """extendedprice * (1 - discount) with exact decimal accumulation
    (the plans/analytics.py q1 convention)."""
    return (
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("decimal(18,4)")


def q4_priority_exists(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts for a quarter, restricted
    to orders where EXISTS a returned lineitem. The EXISTS compiles to
    a left-semi join — probe side never duplicates, so no DISTINCT is
    needed regardless of how many lineitems match."""
    orders = t(spark, sf, "orders")
    returned = (
        t(spark, sf, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-07-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-10-01").cast("timestamp"))
        )
        .join(returned, orders["o_orderkey"] == returned["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns.

    Aggregation happens BEFORE the dimension joins: lineitem⋈orders is
    reduced to one (custkey, revenue) row per customer, then the small
    nation dim and the customer attributes attach to the already-tiny
    aggregate. At 100 TB this is the difference between shuffling the
    fact table wide (with c_name strings) and shuffling 8-byte keys.
    (revenue DESC, c_custkey) is a total order, so LIMIT 20 is
    deterministic."""
    li = t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01").cast("timestamp"))
    )
    rev = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_custkey")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )
    cust = t(spark, sf, "customer")
    nation = t(spark, sf, "nation").select("n_nationkey", "n_name")
    return (
        rev.join(cust, rev["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .select("c_custkey", "c_name", "n_name", "c_acctbal", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q12_priority_by_status(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → linestatus): conditional aggregation
    — one pass over the join computes both the high- and low-priority
    counts via SUM(CASE WHEN ...), instead of two filtered scans."""
    orders = t(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    li = t(spark, sf, "lineitem").select("l_orderkey", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q14_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — a conditional numerator
    over an unconditional denominator, both exact-decimal sums, single
    output row. The part dimension broadcasts; at scale this is a
    map-side join plus one partial-aggregated scalar."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    part = t(spark, sf, "part").select("p_partkey", "p_type")
    joined = li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
    promo = F.when(F.col("p_type").like("PROMO%"), _disc_price()).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return joined.agg(
        F.round(
            F.lit(100.0) * F.sum(promo).cast("double") / F.sum(_disc_price()).cast("double"),
            6,
        ).alias("promo_pct"),
        F.sum(_disc_price()).cast("double").alias("total_revenue"),
    )


def correlated_above_avg(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated-subquery shape: orders whose price exceeds 1.5× their
    customer's average. Spark-first: the correlated aggregate is a
    window over the correlation key — one shuffle on o_custkey, no
    self-join. The average is (exact decimal sum → double) / count so
    both engines compare against bit-identical thresholds."""
    w = Window.partitionBy("o_custkey")
    cust_avg = (
        F.sum(_dec("o_totalprice")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        t(spark, sf, "orders")
        .withColumn("cust_avg", cust_avg)
        .filter(F.col("o_totalprice") > F.lit(1.5) * F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
    )


def scalar_subquery_bigspenders(spark: SparkSession, sf: str) -> DataFrame:
    """IN-subquery + scalar-subquery shape (TPC-H Q18 flavor): orders
    of customers whose lifetime spend exceeds 1.5× the average
    customer spend. The scalar (global avg) is a 1-row broadcast cross
    join; the IN is a left-semi join on the qualifying custkeys."""
    orders = t(spark, sf, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(_dec("o_totalprice")).cast("double").alias("spend")
    )
    avg_spend = spend.agg(
        (F.sum(F.col("spend").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_spend"
        )
    )
    big = (
        spend.crossJoin(F.broadcast(avg_spend))
        .filter(F.col("spend") > F.lit(1.5) * F.col("avg_spend"))
        .select("o_custkey")
    )
    return (
        orders.join(big, "o_custkey", "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def window_lag_delta(spark: SparkSession, sf: str) -> DataFrame:
    """LAG window: day-over-day change in each user's event count.
    (user_id, day) is unique after the rollup, so the lag frame is a
    total order and the delta is deterministic."""
    daily = (
        t(spark, sf, "events")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("user_id").orderBy("day")
    return daily.select(
        "user_id",
        "day",
        "n",
        (F.col("n") - F.lag("n").over(w)).alias("delta"),
    )


def ntile_customer_deciles(spark: SparkSession, sf: str) -> DataFrame:
    """NTILE(10) deciles over account balance with a unique tie-break
    (c_acctbal, c_custkey) so bucket assignment is stable.

    The headline NTILE surface — but lowered to the global-sort-free
    histogram decomposition (:func:`decile_bucket_scalable`), which is
    bit-identical to ``NTILE(10) OVER (ORDER BY c_acctbal, c_custkey)``
    (same oracle) without ever moving the full table through one
    partition. The literal ``F.ntile`` window form this replaces is
    preserved (and equivalence-tested against this plan) in
    tests/test_round3_ops.py; no ``queries()`` entry carries an
    unpartitioned full-table sort."""
    return decile_bucket_scalable(spark, sf)


def decile_bucket_scalable(spark: SparkSession, sf: str) -> DataFrame:
    """NTILE(10)-identical deciles WITHOUT a global row sort.

    Decomposition of the global rank over (c_acctbal, c_custkey):

    - a histogram of c_acctbal (groupBy + count). Distinct balances are
      bounded by the VALUE DOMAIN (2-dp decimals in a fixed range, ~1M
      values max), not the table, so the cumulative-sum window over the
      histogram stays dimension-sized at any corpus scale — same
      pattern as length_quantile_filter;
    - row_number within each equal-balance group ordered by c_custkey —
      partitioned window, tie-group-sized partitions;
    - global_rank = (count of strictly smaller balances) + within-rank.

    NTILE's uneven split (first N mod 10 buckets take the extra row) is
    then pure integer arithmetic on (rank, N): with q = N div 10,
    r = N mod 10, ranks ≤ r·(q+1) fall in bucket ⌈rank/(q+1)⌉ and the
    rest in r + ⌈(rank − r·(q+1))/q⌉ — all `div`-based, no float
    division to drift at exact-multiple boundaries. Output is
    bit-identical to the NTILE oracle; nothing in the plan sorts more
    than the balance histogram on one partition.

    Assumes a non-NULL bucketing column (account balances here): with
    NULLs, Spark's default window order (NULLS FIRST) and DuckDB's
    (NULLS LAST) rank them differently, so both the histogram and the
    NTILE oracle would need an explicit NULL policy first.
    """
    cust = t(spark, sf, "customer").select("c_custkey", "c_acctbal")
    hist = cust.groupBy("c_acctbal").agg(F.count(F.lit(1)).alias("cnt"))
    cum_w = Window.orderBy("c_acctbal").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "c_acctbal",
        F.coalesce(F.sum("cnt").over(cum_w), F.lit(0)).alias("cum_before"),
    )
    within_w = Window.partitionBy("c_acctbal").orderBy("c_custkey")
    n = cust.agg(F.count(F.lit(1)).alias("n_total"))
    ranked = (
        cust.withColumn("rk_in", F.row_number().over(within_w))
        .join(cum, "c_acctbal")
        .crossJoin(F.broadcast(n))
        .withColumn("rk", F.col("cum_before") + F.col("rk_in"))
        .withColumn("q", F.expr("n_total div 10"))
        .withColumn("r", F.col("n_total") % 10)
    )
    decile = F.when(
        F.col("rk") <= F.col("r") * (F.col("q") + 1),
        F.expr("(rk + q) div (q + 1)"),
    ).otherwise(
        F.col("r") + F.expr("(rk - r * (q + 1) + greatest(q, 1L) - 1) div greatest(q, 1L)")
    )
    return (
        ranked.withColumn("decile", decile)
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


def array_agg_cust_years(spark: SparkSession, sf: str) -> DataFrame:
    """Sorted array aggregation: the distinct order-years per customer
    as an ascending array — collect_set stays a hash set on the
    executors; sort_array makes the result deterministic. The final
    array_join stringifies the array so the driver's row canonicalizer
    (which hashes sorted pandas rows) gets hashable cells; the
    collect_set/sort_array pipeline is still fully exercised."""
    return (
        t(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set(F.year("o_orderdate"))), ","
            ).alias("years"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def string_funcs_breadth(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar string-function coverage (upper/lower/substr/lpad/
    regexp_replace/length/concat_ws) — all JVM codegen, no UDFs."""
    return t(spark, sf, "part").select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("low_brand"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


def date_funcs_breadth(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar date-function coverage: extract fields, truncate, month
    boundaries, day arithmetic. Spark's dayofweek is 1=Sunday; the
    oracle compensates DuckDB's 0=Sunday convention."""
    return t(spark, sf, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.dayofweek("o_orderdate").alias("dow_sun1"),
        F.quarter("o_orderdate").alias("q"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.last_day("o_orderdate").alias("month_end"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_98"
        ),
    )


def median_price_by_status(spark: SparkSession, sf: str) -> DataFrame:
    """Exact median + 90th percentile (percentile_cont interpolation)
    per order status. Rounded to 4 decimals so the interpolation
    arithmetic cannot drift between engines at the last ulp."""
    return (
        t(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.median("o_totalprice"), 4).alias("med_price"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum quarterly
    revenue — an aggregate feeding a scalar MAX that filters the same
    aggregate. The 1-row max broadcasts into an equality join (exact
    doubles from decimal accumulation, so `=` is safe on both
    engines); supplier attributes attach after the reduction."""
    li = t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_disc_price()).cast("double").alias("total_revenue"))
    maxr = rev.agg(F.max("total_revenue").alias("max_revenue"))
    supp = t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(maxr), rev["total_revenue"] == maxr["max_revenue"])
        .join(supp, rev["l_suppkey"] == supp["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


def sliding_window_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding time windows (2h width, 1h slide) — each event lands in
    two overlapping buckets. F.window generates both assignments in one
    projection (an Expand, no self-union), then one shuffle aggregates;
    value sums use exact-decimal accumulation for oracle parity."""
    ev = t(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def multi_distinct_by_flag(spark: SparkSession, sf: str) -> DataFrame:
    """Several COUNT(DISTINCT) over different columns in one grouped
    aggregate — Spark compiles this to a single Expand + two-stage
    aggregation (one shuffle per distinct set, partials map-side), not
    N scans."""
    return (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def window_frames_breadth(spark: SparkSession, sf: str) -> DataFrame:
    """Window-frame breadth: dense_rank / percent_rank / cume_dist on a
    unique (o_orderdate, o_orderkey) ordering (no peer ambiguity),
    first/last value over explicit ROWS frames, and a RANGE frame over
    the numeric orderkey. All single-shuffle on o_custkey — every
    window shares the partition key, so Catalyst reuses one sort."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_past = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_future = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    w_range = (
        Window.partitionBy("o_custkey").orderBy("o_orderkey").rangeBetween(-100000, 0)
    )
    return t(spark, sf, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.dense_rank().over(w).alias("drank"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.first("o_orderkey").over(w_past).alias("first_key"),
        F.last("o_orderkey").over(w_future).alias("last_key"),
        F.sum(_dec("o_totalprice")).over(w_range).cast("double").alias("range_sum"),
    )


def scd2_user_value_history(spark: SparkSession, sf: str) -> DataFrame:
    """SCD2 dimension build (the warehouse-load shape the reference's
    J5/J6 upserts feed, re-expressed declaratively): each user's last
    event value per day becomes a validity interval
    [valid_from, valid_to) with an open-ended current row. Day-level
    winner is row_number over the unique (ts, event_id) tie-break;
    intervals come from LEAD — two window passes over one shuffle on
    user_id (day winner partitions by (user_id, day), a strict
    refinement, so AQE coalesces without a second exchange)."""
    ev = t(spark, sf, "events").withColumn("day", F.to_date("ts"))
    w_day = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    daily = (
        ev.withColumn("rn", F.row_number().over(w_day))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "value")
    )
    w = Window.partitionBy("user_id").orderBy("day")
    lead_day = F.lead("day").over(w)
    return daily.select(
        "user_id",
        F.col("day").alias("valid_from"),
        lead_day.alias("valid_to"),
        "value",
        lead_day.isNull().alias("is_current"),
    )


def array_funcs_breadth(spark: SparkSession, sf: str) -> DataFrame:
    """Higher-order array functions (transform / filter / aggregate /
    zip_with) plus slice / contains / max over a synthesized integer
    array (sequence keyed on o_orderkey — integer arrays keep the
    lambda arithmetic exact on both engines, unlike float vectors).
    All pure projections: no shuffle, whole-stage codegen end to end.
    Array-valued results are array_join-stringified in the final
    select so the driver's row canonicalizer gets hashable cells; the
    higher-order lambdas are still fully exercised upstream. The
    stringify is a whole-array cast, not a per-element transform
    lambda — the extra four lambdas tripled the generated-code size
    and put ~2 s of one-off janino compile time on the cold-run bench
    (r2's 2x regression)."""
    arr = F.sequence(F.lit(1), (F.col("o_orderkey") % 7 + 1).cast("int"))

    def s(col):  # stringify an int array for hashable driver output
        return F.array_join(col.cast("array<string>"), ",")

    return t(spark, sf, "orders").select(
        "o_orderkey",
        F.size(arr).alias("n"),
        s(F.transform(arr, lambda x: x * x)).alias("squares"),
        s(F.filter(arr, lambda x: x % 2 == 0)).alias("evens"),
        F.aggregate(arr, F.lit(0), lambda acc, x: acc + x).alias("total"),
        s(F.zip_with(arr, F.reverse(arr), lambda a, b: a + b)).alias("sym_sum"),
        s(F.slice(arr, 2, 3)).alias("mid"),
        F.array_contains(arr, 3).alias("has3"),
        F.array_max(arr).alias("amax"),
    )


def regex_null_funcs_breadth(spark: SparkSession, sf: str) -> DataFrame:
    """Regex + null-handling scalar breadth: regexp_extract, rlike,
    translate, reverse, instr, nullif/coalesce, least/greatest — the
    conditional-expression surface (SURVEY §2.8 gap). Pure codegen
    projection over the part dim."""
    p = t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.col("p_name").rlike("w.dget").alias("is_widget"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.reverse("p_type").alias("type_rev"),
        F.instr("p_name", " ").alias("space_at"),
        F.coalesce(F.nullif("p_type", F.lit("ECONOMY")), F.lit("BUDGET")).alias(
            "type_or_budget"
        ),
        F.least("p_size", F.lit(25)).alias("size_cap"),
        F.greatest("p_size", F.lit(10)).alias("size_floor"),
    )


def sql_direct_q6(spark: SparkSession, sf: str) -> DataFrame:
    """The raw SQL entry surface: the engine's tables registered as
    temp views and queried through spark.sql — proving the full
    SQL-string API works against the same readers (Catalyst plans SQL
    text and DataFrame calls identically, so this shares Q6's
    pushdown-verified physical plan)."""
    t(spark, sf, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem_v
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """
    )


def map_funcs_breadth(spark: SparkSession, sf: str) -> DataFrame:
    """Map-typed column functions: map_from_arrays construction,
    element_at lookup (null on miss), map_keys/map_values, size.
    Insertion order is preserved by both engines, so the key/value
    array projections compare exactly. Pure codegen projection. The
    map_keys/map_values arrays are array_join-stringified so the
    driver's row canonicalizer gets hashable cells."""
    ev = t(spark, sf, "events")
    m = F.map_from_arrays(
        F.array(F.lit("type"), F.lit("user")),
        F.array(F.col("event_type"), F.col("user_id").cast("string")),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.element_at(m, "user").alias("m_user"),
        F.element_at(m, "missing").alias("m_miss"),
        F.array_join(F.map_keys(m), ",").alias("m_keys"),
        F.array_join(F.map_values(m), ",").alias("m_vals"),
        F.size(m).alias("m_size"),
    )


def stats_moments_breadth(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregates (variance / stddev / correlation) per
    return flag, computed from EXACT decimal power sums then a fixed
    double-arithmetic closed form — the only accumulation-order-proof
    way to oracle-match moment statistics (built-in stddev/corr
    accumulate doubles whose partial-merge order drifts; a test bounds
    the built-ins against these exact values instead)."""
    x = _dec("l_quantity")
    y = _dec("l_extendedprice")
    agg = (
        t(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).cast("double").alias("sx"),
            F.sum(y).cast("double").alias("sy"),
            F.sum((x * x).cast("decimal(28,4)")).cast("double").alias("sxx"),
            F.sum((y * y).cast("decimal(28,4)")).cast("double").alias("syy"),
            F.sum((x * y).cast("decimal(28,4)")).cast("double").alias("sxy"),
        )
    )
    n = F.col("n").cast("double")
    var_q = (n * F.col("sxx") - F.col("sx") * F.col("sx")) / (n * (n - F.lit(1.0)))
    var_p = (n * F.col("syy") - F.col("sy") * F.col("sy")) / (n * (n - F.lit(1.0)))
    corr_num = n * F.col("sxy") - F.col("sx") * F.col("sy")
    corr_den = F.sqrt(n * F.col("sxx") - F.col("sx") * F.col("sx")) * F.sqrt(
        n * F.col("syy") - F.col("sy") * F.col("sy")
    )
    return agg.select(
        "l_returnflag",
        "n",
        F.round(var_q, 6).alias("var_qty"),
        F.round(F.sqrt(var_q), 6).alias("std_qty"),
        F.round(F.sqrt(var_p), 6).alias("std_price"),
        F.round(corr_num / corr_den, 6).alias("corr_qty_price"),
    )


def timeseries_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user daily event counts with missing days densified to 0.

    The calendar spine is generated per group with sequence()+explode
    bounded by each user's own [min_day, max_day] span — no global
    calendar cross join, so spine size is O(active span), and the
    spine⋈daily join keys on (user_id, day), the same key the daily
    aggregate already shuffled on.
    """
    ev = t(spark, sf, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    spans = daily.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = spans.select(
        "user_id", F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    return spine.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
    )


def timeseries_locf(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-filled per-user daily value series with last observation
    carried forward (LOCF) across the filled gaps.

    The carry is `last(value, ignorenulls=True)` over an unbounded-
    preceding running frame — one window pass over the densified grid,
    partitioned on user_id (same shuffle key the grid join already
    used, so the exchange reuses the partitioning). Days before a
    user's first observation stay NULL on both engines.
    """
    ev = t(spark, sf, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("day_value")
    )
    spans = daily.groupBy("user_id").agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = spans.select(
        "user_id", F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    grid = spine.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.select(
        "user_id",
        "day",
        F.last("day_value", ignorenulls=True).over(w).alias("locf_value"),
    )


def histogram_price_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-width histogram of l_extendedprice (width 10000): a pure
    map-side bucket expression + one hash aggregate, the shape that
    survives any scale (bucket count is data-range-bounded, not
    row-count-bounded)."""
    li = t(spark, sf, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / F.lit(10000.0)).cast("int")
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_price"),
        )
        .select(
            "bucket",
            (F.col("bucket").cast("double") * 10000.0).alias("lo"),
            ((F.col("bucket") + 1).cast("double") * 10000.0).alias("hi"),
            "n",
            "sum_price",
        )
    )


def exact_quantiles_scalable(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT p50/p90/p99/p99.9 of o_totalprice WITHOUT a global row
    sort — the tail-latency/price-distribution readout every 100 TB
    profile job wants exactly, not approximately.

    Same decomposition family as decile_bucket_scalable: the rank
    domain collapses onto a value histogram (2-dp decimals in a fixed
    range — dimension-sized at any corpus scale), the cumulative
    count rides a histogram-sized window, and each target rank
    k_q = (q‰·(n−1)) div 1000 + 1 (the lower nearest-rank definition)
    picks MIN(value | cum ≥ k) through a 4×|hist| bounded range join.
    All integer arithmetic — bit-identical to the sorted-row-number
    oracle, which is an independent construction (ORDER BY + rank
    pick), not a histogram twin.
    """
    vals = t(spark, sf, "orders").select("o_totalprice")
    hist = vals.groupBy("o_totalprice").agg(F.count(F.lit(1)).alias("cnt"))
    cum_w = Window.orderBy("o_totalprice").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.select(
        "o_totalprice", F.sum("cnt").over(cum_w).alias("cum_le")
    )
    n = vals.agg(F.count(F.lit(1)).alias("n"))
    targets = n.select(
        "n",
        F.explode(F.array(*[F.lit(q) for q in (500, 900, 990, 999)])).alias(
            "q_permille"
        ),
    ).withColumn("k", F.expr("(q_permille * (n - 1)) div 1000 + 1"))
    picked = (
        cum.join(
            F.broadcast(targets), F.col("cum_le") >= F.col("k"), "inner"
        )
        .groupBy("q_permille", "n", "k")
        .agg(F.min("o_totalprice").alias("value"))
    )
    return picked.select(
        F.col("q_permille").cast("int").alias("q_permille"), "n", "k", "value"
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "exact_quantiles_scalable": exact_quantiles_scalable,
    "q4_priority_exists": q4_priority_exists,
    "q10_returned_items": q10_returned_items,
    "q12_priority_by_status": q12_priority_by_status,
    "q14_promo_revenue": q14_promo_revenue,
    "correlated_above_avg": correlated_above_avg,
    "scalar_subquery_bigspenders": scalar_subquery_bigspenders,
    "window_lag_delta": window_lag_delta,
    "ntile_customer_deciles": ntile_customer_deciles,
    "decile_bucket_scalable": decile_bucket_scalable,
    "array_agg_cust_years": array_agg_cust_years,
    "string_funcs_breadth": string_funcs_breadth,
    "date_funcs_breadth": date_funcs_breadth,
    "median_price_by_status": median_price_by_status,
    "q15_top_supplier": q15_top_supplier,
    "sliding_window_rollup": sliding_window_rollup,
    "multi_distinct_by_flag": multi_distinct_by_flag,
    "window_frames_breadth": window_frames_breadth,
    "scd2_user_value_history": scd2_user_value_history,
    "array_funcs_breadth": array_funcs_breadth,
    "regex_null_funcs_breadth": regex_null_funcs_breadth,
    "sql_direct_q6": sql_direct_q6,
    "map_funcs_breadth": map_funcs_breadth,
    "stats_moments_breadth": stats_moments_breadth,
    "timeseries_gapfill": timeseries_gapfill,
    "timeseries_locf": timeseries_locf,
    "histogram_price_buckets": histogram_price_buckets,
}


_DISC_PRICE_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"
)

MORE_ORACLES: dict[str, str] = {}

# Independent construction (sorted row_number rank pick, not a
# histogram twin): value at rank k = (q‰·(n−1)) div 1000 + 1.
MORE_ORACLES["exact_quantiles_scalable"] = """
WITH s AS (
  SELECT o_totalprice, ROW_NUMBER() OVER (ORDER BY o_totalprice) AS rk
  FROM orders
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders),
t AS (SELECT unnest([500, 900, 990, 999]) AS q_permille),
k AS (SELECT t.q_permille, n.n,
             (t.q_permille * (n.n - 1)) // 1000 + 1 AS k
      FROM t CROSS JOIN n)
SELECT CAST(k.q_permille AS INT) AS q_permille, k.n, CAST(k.k AS BIGINT) AS k,
       s.o_totalprice AS value
FROM k JOIN s ON s.rk = k.k
"""

MORE_ORACLES["q4_priority_exists"] = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1995-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
"""

MORE_ORACLES["q10_returned_items"] = f"""
WITH rev AS (
  SELECT o_custkey,
         CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, n_name, c_acctbal, revenue
FROM rev
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

MORE_ORACLES["q12_priority_by_status"] = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_linestatus
"""

MORE_ORACLES["q14_promo_revenue"] = f"""
SELECT
  ROUND(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_DISC_PRICE_SQL}
                              ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
              / CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE), 6) AS promo_pct,
  CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-07-01 00:00:00'
"""

MORE_ORACLES["correlated_above_avg"] = """
WITH avgs AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS cust_avg
  FROM orders GROUP BY o_custkey
)
SELECT o_orderkey, o.o_custkey, o_totalprice, cust_avg
FROM orders o JOIN avgs USING (o_custkey)
WHERE o_totalprice > 1.5 * cust_avg
"""

MORE_ORACLES["scalar_subquery_bigspenders"] = """
WITH spend AS (
  SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey
)
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (
  SELECT o_custkey FROM spend
  WHERE spend > 1.5 * (SELECT CAST(SUM(CAST(spend AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
                       FROM spend)
)
"""

MORE_ORACLES["window_lag_delta"] = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id, day, n,
       n - LAG(n) OVER (PARTITION BY user_id ORDER BY day) AS delta
FROM daily
"""

MORE_ORACLES["ntile_customer_deciles"] = """
WITH tiled AS (
  SELECT c_acctbal,
         NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
  FROM customer
)
SELECT decile, COUNT(*) AS n, MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
FROM tiled GROUP BY decile
"""

MORE_ORACLES["decile_bucket_scalable"] = """
WITH tiled AS (
  SELECT c_acctbal,
         NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
  FROM customer
)
SELECT decile, COUNT(*) AS n, MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
FROM tiled GROUP BY decile
"""

MORE_ORACLES["array_agg_cust_years"] = """
SELECT o_custkey,
       ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT EXTRACT(year FROM o_orderdate))), ',') AS years,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
"""

MORE_ORACLES["string_funcs_breadth"] = """
SELECT p_partkey,
       UPPER(p_name) AS up_name,
       LOWER(p_brand) AS low_brand,
       SUBSTR(p_type, 1, 5) AS type5,
       LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
       REGEXP_REPLACE(p_name, ' ', '_', 'g') AS name_snake,
       LENGTH(p_name) AS name_len,
       CONCAT_WS(':', p_brand, p_type) AS brand_type
FROM part
"""

MORE_ORACLES["date_funcs_breadth"] = """
SELECT o_orderkey,
       EXTRACT(year FROM o_orderdate) AS y,
       EXTRACT(month FROM o_orderdate) AS m,
       EXTRACT(day FROM o_orderdate) AS d,
       DAYOFWEEK(o_orderdate) + 1 AS dow_sun1,
       EXTRACT(quarter FROM o_orderdate) AS q,
       CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
       LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
       DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98
FROM orders
"""

MORE_ORACLES["q15_top_supplier"] = f"""
WITH rev AS (
  SELECT l_suppkey, CAST(SUM({_DISC_PRICE_SQL}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""

MORE_ORACLES["sliding_window_rollup"] = """
WITH assigned AS (
  SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type, value
  FROM events
  UNION ALL
  SELECT CAST(date_trunc('hour', ts) - INTERVAL 1 HOUR AS TIMESTAMP), event_type, value
  FROM events
)
SELECT window_start, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM assigned
GROUP BY 1, 2
"""

MORE_ORACLES["multi_distinct_by_flag"] = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""

MORE_ORACLES["window_frames_breadth"] = """
SELECT o_orderkey, o_custkey,
       DENSE_RANK() OVER w AS drank,
       ROUND(PERCENT_RANK() OVER w, 6) AS prank,
       ROUND(CUME_DIST() OVER w, 6) AS cdist,
       FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key,
       LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS last_key,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
           ORDER BY o_orderkey
           RANGE BETWEEN 100000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_sum
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""

MORE_ORACLES["scd2_user_value_history"] = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id,
       day AS valid_from,
       LEAD(day) OVER w AS valid_to,
       value,
       LEAD(day) OVER w IS NULL AS is_current
FROM daily
WHERE rn = 1
WINDOW w AS (PARTITION BY user_id ORDER BY day)
"""

MORE_ORACLES["array_funcs_breadth"] = """
WITH base AS (
  SELECT o_orderkey,
         range(1, CAST(o_orderkey % 7 + 1 AS INTEGER) + 1) AS arr
  FROM orders
)
SELECT o_orderkey,
       len(arr) AS n,
       COALESCE(array_to_string(list_transform(arr, x -> x * x), ','), '') AS squares,
       COALESCE(array_to_string(list_filter(arr, x -> x % 2 = 0), ','), '') AS evens,
       CAST(list_sum(arr) AS INTEGER) AS total,
       COALESCE(array_to_string(list_transform(range(1, len(arr) + 1),
                      i -> arr[CAST(i AS INTEGER)]
                           + arr[CAST(len(arr) - i + 1 AS INTEGER)]), ','), '') AS sym_sum,
       COALESCE(array_to_string(arr[2:4], ','), '') AS mid,
       list_contains(arr, 3) AS has3,
       list_max(arr) AS amax
FROM base
"""

MORE_ORACLES["regex_null_funcs_breadth"] = r"""
SELECT p_partkey,
       regexp_extract(p_name, '^(\w+)', 1) AS first_word,
       regexp_matches(p_name, 'w.dget') AS is_widget,
       replace(p_brand, '#', '-') AS brand_dash,
       reverse(p_type) AS type_rev,
       CAST(strpos(p_name, ' ') AS INTEGER) AS space_at,
       COALESCE(NULLIF(p_type, 'ECONOMY'), 'BUDGET') AS type_or_budget,
       LEAST(p_size, 25) AS size_cap,
       GREATEST(p_size, 10) AS size_floor
FROM part
"""

MORE_ORACLES["sql_direct_q6"] = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

MORE_ORACLES["map_funcs_breadth"] = """
WITH base AS (
  SELECT event_id,
         map(['type','user'], [event_type, CAST(user_id AS VARCHAR)]) AS m
  FROM events
)
SELECT event_id,
       m['type'][1] AS m_type,
       m['user'][1] AS m_user,
       m['missing'][1] AS m_miss,
       array_to_string(map_keys(m), ',') AS m_keys,
       array_to_string(map_values(m), ',') AS m_vals,
       CAST(cardinality(m) AS INTEGER) AS m_size
FROM base
"""

MORE_ORACLES["stats_moments_breadth"] = """
WITH sums AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                       * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                       * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2))
                       * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS sxy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       n,
       ROUND((CAST(n AS DOUBLE) * sxx - sx * sx)
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6) AS var_qty,
       ROUND(SQRT((CAST(n AS DOUBLE) * sxx - sx * sx)
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 6) AS std_qty,
       ROUND(SQRT((CAST(n AS DOUBLE) * syy - sy * sy)
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 6) AS std_price,
       ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (SQRT(CAST(n AS DOUBLE) * sxx - sx * sx)
                * SQRT(CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS corr_qty_price
FROM sums
"""

MORE_ORACLES["timeseries_gapfill"] = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
spans AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
spine AS (
  SELECT user_id,
         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM spans
)
SELECT s.user_id, s.day, CAST(COALESCE(d.n_events, 0) AS BIGINT) AS n_events
FROM spine s
LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
"""

MORE_ORACLES["timeseries_locf"] = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS day_value
  FROM events GROUP BY 1, 2
),
spans AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
spine AS (
  SELECT user_id,
         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM spans
),
grid AS (
  SELECT s.user_id, s.day, d.day_value
  FROM spine s
  LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
)
SELECT user_id, day,
       last_value(day_value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
FROM grid
"""

MORE_ORACLES["histogram_price_buckets"] = """
SELECT CAST(FLOOR(l_extendedprice / 10000.0) AS INT) AS bucket,
       CAST(FLOOR(l_extendedprice / 10000.0) AS INT) * 10000.0 AS lo,
       (CAST(FLOOR(l_extendedprice / 10000.0) AS INT) + 1) * 10000.0 AS hi,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY 1, 2, 3
"""

MORE_ORACLES["median_price_by_status"] = """
SELECT o_orderstatus,
       ROUND(MEDIAN(o_totalprice), 4) AS med_price,
       ROUND(QUANTILE_CONT(o_totalprice, 0.9), 4) AS p90_price,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderstatus
"""
