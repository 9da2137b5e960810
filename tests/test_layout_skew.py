"""Physical-layout and skew-mitigation tests: bucketed joins must be
shuffle-free, salted operators must be result-identical to their
direct forms, maintenance passes must preserve data while fixing
file counts and enabling stat-based skipping.
"""

from __future__ import annotations

import contextlib
import io
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from fsc_etl_spark.operators.maintenance import cluster_by, compact
from fsc_etl_spark.operators.skew import salted_aggregate, salted_join
from fsc_etl_spark.sources.readers import read_parquet_table
from fsc_etl_spark.sources.writers import write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke):
    orders = read_parquet_table(spark, sf_smoke, "orders")
    lineitem = read_parquet_table(spark, sf_smoke, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """Same bucket count + key on both sides ⇒ the join reads buckets
    directly: NO Exchange in the plan (the 100 TB fact⋈fact story)."""
    t1, t2 = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t1).join(spark.table(t2), "o_orderkey")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    t1, _ = bucketed_tables
    agg = spark.table(t1).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    assert "Exchange" not in _plan(agg), "bucketed groupBy must not shuffle"


def test_bucketed_join_rollup_query_plan(spark, sf_smoke):
    """The queries() entry `bucketed_join_rollup` must actually use
    the bucket layout: bucketed scans feed the join with no Exchange
    below it — the only Exchange in the whole plan is the final
    rollup's (different key), regardless of layout."""
    from fsc_etl_spark.plans.scale_ops import bucketed_join_rollup

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(bucketed_join_rollup(spark, sf_smoke))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan, "join inputs must be bucketed scans"
    # formatted plans list each node twice (tree + details); count the
    # tree form "Exchange (n)" so the rollup's is the only one
    assert plan.count("Exchange (") == 1, plan


def test_salted_aggregate_matches_direct(spark, sf_smoke):
    li = read_parquet_table(spark, sf_smoke, "lineitem")
    direct = {
        r["l_returnflag"]: (r["n"], r["s"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("s"),
        )
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["n"], r["s"])
        for r in salted_aggregate(
            li,
            keys=["l_returnflag"],
            partial_aggs=[
                F.count(F.lit(1)).alias("pn"),
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("ps"),
            ],
            final_aggs=[F.sum("pn").alias("n"), F.sum("ps").alias("s")],
            buckets=8,
        ).collect()
    }
    assert salted == direct


def test_salted_join_matches_direct(spark, sf_smoke):
    li = read_parquet_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_quantity")
    orders = read_parquet_table(spark, sf_smoke, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    direct = li.join(orders, "l_orderkey").groupBy("o_orderstatus").count()
    salted = salted_join(li, orders, on=["l_orderkey"], buckets=4).groupBy(
        "o_orderstatus"
    ).count()
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, salted.collect()))


def test_compact_preserves_data_and_bounds_files(spark, sf_smoke):
    src = read_parquet_table(spark, sf_smoke, "orders")
    path = os.path.join(tempfile.mkdtemp(prefix="fsc_maint_"), "t")
    # A deliberately fragmented write: one file per partition.
    src.repartition(16).write.parquet(path)
    before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert before >= 16
    n_before = src.count()
    compact(spark, path, target_file_mb=128)
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 1  # tiny table packs into one target-size file
    assert spark.read.parquet(path).count() == n_before


def test_cluster_by_orders_rows_for_skipping(spark, sf_correct):
    src = read_parquet_table(spark, sf_correct, "lineitem")
    path = os.path.join(tempfile.mkdtemp(prefix="fsc_maint_"), "t")
    src.repartition(8).write.parquet(path)
    cluster_by(spark, path, ["l_shipdate"], target_file_mb=1)
    back = spark.read.parquet(path)
    assert back.count() == src.count()
    # Within every file, l_shipdate must be non-decreasing (this is
    # what makes parquet min/max stats selective for file skipping).
    rows = (
        back.withColumn("f", F.input_file_name())
        .select("f", "l_shipdate")
        .collect()
    )
    by_file: dict[str, list] = {}
    for r in rows:
        by_file.setdefault(r["f"], []).append(r["l_shipdate"])
    assert len(by_file) >= 2  # 1MB target actually split the table
    for dates in by_file.values():
        assert dates == sorted(dates)


def test_zorder_prunes_both_dimensions(spark, sf_correct):
    """Z-order on (user_id, value) must make file min/max stats
    selective in BOTH columns; single-column clustering leaves the
    other column at ~full range in every file."""
    import pyarrow.parquet as pq

    from fsc_etl_spark.operators.maintenance import zorder_by

    src = read_parquet_table(spark, sf_correct, "events").select(
        "event_id", "user_id", "value"
    )
    zpath = os.path.join(tempfile.mkdtemp(prefix="fsc_z_"), "t")
    cpath = os.path.join(tempfile.mkdtemp(prefix="fsc_c_"), "t")
    src.repartition(8).write.parquet(zpath)
    src.repartition(8).write.parquet(cpath)
    zorder_by(spark, zpath, "user_id", "value", n_files=16)
    cluster_by(spark, cpath, ["user_id"], n_files=16)

    def overlap_fraction(path, col, lo, hi):
        files = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        ]
        assert len(files) >= 4, "fixture must split into several files"
        hit = 0
        for fp in files:
            md = pq.ParquetFile(fp).metadata
            mn = min(
                md.row_group(g).column(
                    next(
                        i
                        for i in range(md.num_columns)
                        if md.row_group(g).column(i).path_in_schema == col
                    )
                ).statistics.min
                for g in range(md.num_row_groups)
            )
            mx = max(
                md.row_group(g).column(
                    next(
                        i
                        for i in range(md.num_columns)
                        if md.row_group(g).column(i).path_in_schema == col
                    )
                ).statistics.max
                for g in range(md.num_row_groups)
            )
            if mx >= lo and mn <= hi:
                hit += 1
        return hit / len(files)

    assert spark.read.parquet(zpath).count() == src.count()

    # ~10%-wide boxes in each dimension (user_id uniform 0..1500,
    # value distribution unknown -> use observed quantiles).
    v10, v20 = src.approxQuantile("value", [0.45, 0.55], 0.01)
    u_lo, u_hi = 700, 850

    # Overlap fractions are quantized to 1/n_files and the exact file
    # boundaries wobble with repartitionByRange's sampling (which sees
    # whatever input split layout session history left) — so assert
    # with a one-file margin and, most importantly, the CONTRASTS that
    # carry the claim: z-order prunes BOTH dimensions, single-column
    # clustering only its own.
    z_user = overlap_fraction(zpath, "user_id", u_lo, u_hi)
    c_user = overlap_fraction(cpath, "user_id", u_lo, u_hi)
    assert z_user < 0.85, f"z-order failed to prune on user_id: {z_user}"
    assert c_user < 0.6, f"clustering failed to prune its own column: {c_user}"

    # value-dim predicate: only the z-ordered layout can prune.
    z_val = overlap_fraction(zpath, "value", v10, v20)
    c_val = overlap_fraction(cpath, "value", v10, v20)
    assert z_val < 0.85, f"z-order failed to prune on value: {z_val}"
    assert c_val > 0.9, f"single-dim clustering unexpectedly pruned value: {c_val}"
    assert z_val <= c_val - 0.15, f"no z-order advantage on value: {z_val} vs {c_val}"


def test_partitioned_sink_enables_partition_pruning(spark, sf_smoke):
    """A filter on the partition key of a write_partitioned() dataset
    must prune at PLANNING time: the scan's PartitionFilters carries
    the predicate, only the matching directories are listed, and no
    data filter remains (directory dispatch, not row filtering) — the
    property that turns a 100 TB date-partitioned table into a
    one-partition read."""
    import re

    from fsc_etl_spark.sources.writers import write_partitioned

    # read_parquet_table normalizes events.ts to a real timestamp
    # whatever the fixture's parquet encoding (NANOS-as-long or MICROS)
    ev = (
        read_parquet_table(spark, sf_smoke, "events")
        .select("event_id", "user_id", "value", "ts")
        .withColumn("day", F.to_date("ts"))
    )
    n_days = ev.select("day").distinct().count()
    assert n_days >= 3
    path = os.path.join(tempfile.mkdtemp(prefix="fsc_part_"), "t")
    write_partitioned(ev, path, partition_by=["day"], mode="overwrite")

    one_day = ev.agg(F.min("day")).first()[0]
    scan = spark.read.parquet(path).filter(F.col("day") == F.lit(one_day))
    plan = _plan(scan)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "day" in m.group(1), plan
    # the partition predicate must NOT degrade into a data-filter push
    # (no PushedFilters line at all is also fine — pure dir dispatch)
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed is None or "day" not in pushed.group(1)
    # row counts prove only that day's directory contributed
    assert scan.count() == ev.filter(F.col("day") == F.lit(one_day)).count()
    # pruned partition count visible in the formatted scan node
    assert scan.count() < ev.count()
