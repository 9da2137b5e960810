"""Unit tests for the scale-pattern operators (plans/scale_ops.py,
operators/bloom.py, operators/skew.heavy_hitters_exact).

The entry-contract test already oracle-checks the three driver queries;
these tests pin the OPERATOR-level guarantees the oracles can't see:
bloom supersets, pigeonhole candidate supersets, layout-independent
determinism.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from fsc_etl_spark.operators.bloom import (
    bloom_pruned_semi_join,
    build_bloom,
    might_contain,
)
from fsc_etl_spark.operators.skew import heavy_hitters_exact


def test_bloom_no_false_negatives(spark):
    """Every inserted key must test positive — bloom filters may only
    err toward inclusion."""
    keys = spark.range(0, 5000, 7).select(F.col("id").alias("k"))
    words = build_bloom(keys, "k")
    n = keys.count()
    hits = keys.filter(might_contain(words, F.col("k"))).count()
    assert hits == n


def test_bloom_false_positive_rate_bounded(spark):
    """Non-member fp rate should be near the textbook (1-e^{-kn/m})^k —
    assert an order-of-magnitude bound, not the exact value."""
    keys = spark.range(1000).select(F.col("id").alias("k"))
    words = build_bloom(keys, "k")
    probes = spark.range(1_000_000, 1_050_000).select(F.col("id").alias("k"))
    fp = probes.filter(might_contain(words, F.col("k"))).count()
    # m=2^16, k=5, n=1000 -> fp ~ 2e-6; 50k probes -> expect ~0. Allow
    # a generous 0.5% before calling the construction broken.
    assert fp < 250


def test_bloom_pruned_semi_join_exact(spark, sf_smoke):
    """Pruned semi join must equal the plain semi join — false
    positives die in the final exact join."""
    from fsc_etl_spark.sources.readers import read_parquet_table as t

    li = t(spark, sf_smoke, "lineitem")
    keys = (
        t(spark, sf_smoke, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    got = bloom_pruned_semi_join(li, keys, "l_orderkey", "o_orderkey")
    want = li.join(
        keys.withColumnRenamed("o_orderkey", "l_orderkey").distinct(),
        "l_orderkey",
        "left_semi",
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_heavy_hitters_matches_naive_on_skewed_data(spark):
    """Pigeonhole candidates + recount == naive groupBy/HAVING, on a
    deliberately skewed, multi-partition input."""
    base = spark.range(10_000).repartition(8)
    df = base.select(
        F.when(F.col("id") % 100 < 60, F.lit(1))  # whale key: 60%
        .when(F.col("id") % 100 < 70, F.lit(2))  # 10%
        .otherwise(F.col("id"))  # long tail of near-unique keys
        .alias("k")
    )
    share = df.agg(
        F.lit(1).cast("long").alias("num"), F.lit(20).cast("long").alias("den")
    )  # φ = 5%
    got = {(r["k"], r["cnt"]) for r in heavy_hitters_exact(df, ["k"], share).collect()}
    n = df.count()
    naive = {
        (r["k"], r["cnt"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * 20 >= n)
        .collect()
    }
    assert got == naive
    assert len(got) == 2  # exactly the two planted hot keys


def test_heavy_hitters_partition_layout_invariant(spark):
    """Result must not depend on how rows are split into partitions."""
    df = spark.range(2000).select((F.col("id") % 37).alias("k"))
    share = df.agg(
        F.lit(1).cast("long").alias("num"), F.lit(40).cast("long").alias("den")
    )
    a = {tuple(r) for r in heavy_hitters_exact(df.repartition(1), ["k"], share).collect()}
    b = {tuple(r) for r in heavy_hitters_exact(df.repartition(13), ["k"], share).collect()}
    assert a == b and a  # non-empty (every key has ~54 >= 2000/40)


def test_reservoir_sample_layout_invariant(spark, sf_smoke):
    """The md5-ranked reservoir picks the same rows whatever the input
    partitioning — the determinism rand()-sampling lacks."""
    from fsc_etl_spark.sources.readers import read_parquet_table as t

    docs = t(spark, sf_smoke, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )

    def pick(d):
        return {
            tuple(r)
            for r in d.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 5)
            .collect()
        }

    assert pick(docs.repartition(1)) == pick(docs.repartition(7))
    per_group = (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .groupBy("source")
        .count()
        .collect()
    )
    assert all(r["count"] <= 5 for r in per_group)


def test_bloom_never_false_negative_property(spark):
    """Property: for ANY key set and probe values, every inserted key
    tests positive (bloom filters may only err toward inclusion)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(
        keys=st.lists(
            st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=40
        )
    )
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    def check(keys):
        df = spark.createDataFrame([(k,) for k in keys], "k long")
        words = build_bloom(df, "k", num_bits=1 << 10, num_hashes=3)
        hits = df.filter(might_contain(words, F.col("k"), num_hashes=3)).count()
        assert hits == df.count()

    check()


def test_heavy_hitters_threshold_products_exceed_int64(spark):
    """den·cnt / num·n near 2^63: int64 multiplies would silently wrap
    under non-ANSI Spark and flip the threshold comparison; the
    decimal(38,0) comparison must stay exact."""
    big = (1 << 61)  # den = 3·2^61 > 2^62; den·cnt overflows int64 at cnt ≥ 2
    df = spark.range(300).select(
        F.when(F.col("id") % 3 < 2, F.lit(1)).otherwise(F.col("id")).alias("k")
    )
    share = df.agg(
        F.lit(big).cast("long").alias("num"),
        F.lit(3 * big).cast("long").alias("den"),
    )  # φ = 1/3 exactly, encoded with operands that overflow int64 products
    got = {(r["k"], r["cnt"]) for r in heavy_hitters_exact(df, ["k"], share).collect()}
    assert got == {(1, 200)}  # the 2/3 whale; nothing else reaches 1/3


def test_zorder_empty_and_all_null_fall_back_to_compact(spark):
    """zorder_by on an empty table or an all-NULL z-column has no
    percentile boundaries — it must fall back to a plain compact, not
    crash iterating a None bounds array."""
    import os as _os
    import tempfile as _tempfile

    from pyspark.sql import types as T

    from fsc_etl_spark.operators.maintenance import zorder_by

    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.DoubleType())]
    )
    empty = spark.createDataFrame([], schema)
    p1 = _os.path.join(_tempfile.mkdtemp(prefix="fsc_zempty_"), "t")
    empty.write.parquet(p1)
    zorder_by(spark, p1, "a", "b", n_files=2)
    assert spark.read.schema(schema).parquet(p1).count() == 0

    allnull = spark.createDataFrame([(i, None) for i in range(50)], schema)
    p2 = _os.path.join(_tempfile.mkdtemp(prefix="fsc_znull_"), "t")
    allnull.write.parquet(p2)
    zorder_by(spark, p2, "a", "b", n_files=2)
    assert spark.read.parquet(p2).count() == 50


def _ewma_ref(values):
    # s1 = v1; s_t = floor((s_{t-1} + v_t) / 2) — floor, not trunc,
    # so negatives round toward -inf exactly like arithmetic shift.
    import math

    s = values[0]
    for v in values[1:]:
        s = math.floor((s + v) / 2)
    return s


def test_ewma_fold_matches_reference_with_negatives(spark):
    """The fixtures have no negative values, so pin the shift ==
    floor-division semantics here: -3 >> 1 must be -2 (floor), not -1
    (truncation), in both the fold and the oracle's // twin."""
    rows = [
        # (user, t, vc) — user 1 mixes signs, user 2 is all-negative,
        # user 3 is a single event (init-only fold)
        (1, 1, 10), (1, 2, -3), (1, 3, 7), (1, 4, -11),
        (2, 1, -5), (2, 2, -4), (2, 3, -1),
        (3, 1, -7),
    ]
    df = spark.createDataFrame(rows, "user_id long, t long, vc long")
    g = df.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("t", "vc"))).alias("a")
    )
    out = g.select(
        "user_id",
        F.aggregate(
            F.slice("a", 2, F.size("a") - 1),
            F.element_at("a", 1)["vc"],
            lambda acc, x: F.shiftright(acc + x["vc"], 1),
        ).alias("s"),
    )
    got = {r["user_id"]: r["s"] for r in out.collect()}
    by_user = {}
    for u, _, v in rows:
        by_user.setdefault(u, []).append(v)
    assert got == {u: _ewma_ref(vs) for u, vs in by_user.items()}
    # and the literal floor identity the oracle relies on
    assert got[2] == _ewma_ref([-5, -4, -1]) == -3
    assert (-3 >> 1) == -2  # arithmetic shift is floor


def test_ewma_duckdb_twin_agrees_on_negatives():
    """DuckDB's integer // TRUNCATES on negatives ((-9)//2 == -4), so
    the oracle must spell floor((acc+x)/2) to match Spark's arithmetic
    shift. This pins the exact lambda form the oracle uses."""
    import duckdb

    r = duckdb.sql(
        """
        SELECT list_reduce(list(v ORDER BY t),
                           (acc, x) -> CAST(floor((acc + x) / 2) AS BIGINT))
        FROM (VALUES (1, -5), (2, -4), (3, -1)) AS tv(t, v)
        """
    ).fetchone()[0]
    assert r == -3
    # and the documented divergence of the naive // form
    assert duckdb.sql("SELECT (-9) // 2").fetchone()[0] == -4


def _holt_ref(values):
    import math

    l, b = values[0], 0
    for v in values[1:]:
        nl = math.floor((v + l + b) / 2)
        b = math.floor(((nl - l) + b) / 2)
        l = nl
    return l, b


def test_holt_packed_fold_matches_reference(spark):
    """The packed-BIGINT (level, trend) fold must reproduce the plain
    two-variable recurrence — including declining series where the
    trend goes negative and the floors bite."""
    from fsc_etl_spark.plans.scale_ops import (
        _HOLT_OFF_B,
        _HOLT_OFF_L,
        _HOLT_RAWMAX,
        _HOLT_W,
    )

    series = {
        1: [1000, 1100, 1250, 1400, 1600],   # rising trend
        2: [5000, 4000, 3100, 2050, 900],    # falling -> negative trend
        3: [700],                            # single element (raw seed)
        4: [0, 0, 3, 0, 0, 7],               # sparse/zero-heavy
    }
    rows = [(u, i, v) for u, vs in series.items() for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "user_id long, t long, vc long")
    g = df.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("t", "vc"))).alias("a")
    )

    def step(acc, x):
        is_raw = acc < F.lit(_HOLT_RAWMAX)
        l = F.when(is_raw, acc).otherwise(F.shiftright(acc, 31) - F.lit(_HOLT_OFF_L))
        b = F.when(is_raw, F.lit(0).cast("long")).otherwise(
            (acc % F.lit(_HOLT_W)) - F.lit(_HOLT_OFF_B)
        )
        newl = F.shiftright(x["vc"] + l + b, 1)
        newb = F.shiftright((newl - l) + b, 1)
        return (newl + F.lit(_HOLT_OFF_L)) * F.lit(_HOLT_W) + (newb + F.lit(_HOLT_OFF_B))

    out = g.select(
        "user_id",
        F.aggregate(
            F.slice("a", 2, F.size("a") - 1), F.element_at("a", 1)["vc"], step
        ).alias("acc"),
    )
    got = {}
    for r in out.collect():
        acc = r["acc"]
        if acc < _HOLT_RAWMAX:
            got[r["user_id"]] = (acc, 0)
        else:
            got[r["user_id"]] = ((acc >> 31) - _HOLT_OFF_L, (acc % _HOLT_W) - _HOLT_OFF_B)
    assert got == {u: _holt_ref(vs) for u, vs in series.items()}
    assert got[2][1] < 0  # the falling series really exercised negative trend
