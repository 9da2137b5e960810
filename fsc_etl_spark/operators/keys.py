"""Surrogate-key assignment (SURVEY.md §2.9 R2).

The reference drops to the RDD layer — ``df.rdd.zipWithIndex()`` plus a
per-row Python lambda (``/root/reference/main.py:283-286``) — which
(a) breaks whole-stage codegen, (b) serializes every row across the
JVM↔Python boundary, and (c) is partition-order-dependent, i.e. not
deterministic across runs.

Spark-first replacement: ``row_number()`` over an explicit, stable
ordering, plus the current max key. Stays entirely in Tungsten.

Scale note: a global ``row_number`` needs a total order — a single-
partition sort at the window. For 100 TB loads where strict contiguity
is NOT required, use ``mode="distributed"`` which combines
``monotonically_increasing_id`` normalization via ``zipWithIndex``-free
two-pass (partition offsets computed from counts) — still deterministic
given a stable sort, but avoids the single-partition window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def surrogate_keys(
    df: DataFrame,
    order_by: Sequence[str],
    key_col: str = "_SK",
    start_from: int = 0,
    mode: str = "window",
) -> DataFrame:
    """Assign contiguous surrogate keys ``start_from + 1 .. n``.

    ``order_by`` must be a deterministic total order (e.g. the natural
    key). ``mode="window"`` is exact and simple; ``mode="distributed"``
    computes per-partition offsets with a range repartition first so no
    single task sees all rows (the 100 TB path).
    """
    if mode == "window":
        w = Window.orderBy(*[F.col(c) for c in order_by])
        return df.withColumn(key_col, (F.row_number().over(w) + F.lit(start_from)).cast("long"))

    if mode == "distributed":
        # Range-partition on the ordering key, then number rows as
        # (rows in earlier partitions) + (row_number within partition).
        ranged = df.repartitionByRange(*[F.col(c) for c in order_by]).withColumn(
            "__pid", F.spark_partition_id()
        )
        counts = ranged.groupBy("__pid").count()
        w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
        offsets = counts.withColumn("__offset", F.coalesce(F.sum("count").over(w_off), F.lit(0))).select(
            "__pid", "__offset"
        )
        w_in = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in order_by])
        return (
            ranged.join(F.broadcast(offsets), "__pid")
            .withColumn(key_col, (F.row_number().over(w_in) + F.col("__offset") + F.lit(start_from)).cast("long"))
            .drop("__pid", "__offset")
        )

    raise ValueError(f"unknown surrogate key mode {mode!r}")


def max_key(df: DataFrame, key_col: str) -> int:
    """Current max key as a scalar (replaces the reference's JDBC
    pushdown probe + ``first()`` action, main.py:252-258,283)."""
    row = df.agg(F.max(key_col).alias("mk")).first()
    return int(row["mk"]) if row and row["mk"] is not None else 0
