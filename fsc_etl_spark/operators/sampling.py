"""Systematic probability-proportional-to-size (PPS) sampling.

No reference twin: the reference engine (a single-notebook Databricks
ETL, /root/reference/main.py) has no sampling surface; this extends
SURVEY.md §2.12's training-pipeline operators. PPS is the standard
corpus-curation draw — sample documents proportionally to a size or
quality weight (token count, dedup-cluster mass, source priority) so
the sampled token budget tracks the weighted distribution without an
RNG: the systematic scheme is fully determined by the weights and a
total order, which is what lets a SQL oracle hash-match it.

Scheme: order rows by a deterministic key; let ``cb`` be the exclusive
prefix sum of weights and ``stride = max(total div n_target, 1)``. A
row with weight ``w`` is drawn ``(cb + w) div stride - cb div stride``
times — the number of stride gridpoints falling inside its weight
interval. Every row with ``w >= stride`` is guaranteed selection
(possibly multiple draws); smaller rows are hit proportionally to
``w``. All BIGINT floor arithmetic.

Scale shape: the prefix sum is two-phase (the same decomposition as
keys.surrogate_keys(mode="distributed") and the skyline sweep) — range
partition on the order key, per-partition running sum, plus a
broadcast per-partition offset — so no single task ever sees the full
table and the result is invariant to the sampled range boundaries
(the prefix depends only on the global order). The total/stride ride
along as a broadcast one-row frame: no driver-side action.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pps_systematic(
    df: DataFrame,
    weight_col: str,
    order_by: Sequence[str],
    n_target: int,
    hits_col: str = "n_hits",
) -> DataFrame:
    """Systematic PPS draw of ~``n_target`` rows (with multiplicity)
    proportional to BIGINT ``weight_col`` > 0, ordered by ``order_by``
    (must be a deterministic total order, e.g. a unique key).

    Returns the selected rows — ``df``'s columns plus ``hits_col``
    (BIGINT >= 1, the number of times the row is drawn). The draw
    count across all rows is exactly ``total div stride`` (+1 when
    stride divides total), i.e. ~``n_target``.
    """
    if n_target < 1:
        raise ValueError(f"n_target must be >= 1, got {n_target}")
    w = F.col(weight_col).cast("long")
    tot = df.agg(
        F.greatest(
            F.expr(f"sum(cast({weight_col} as bigint)) div {n_target}"), F.lit(1)
        )
        .cast("long")
        .alias("__stride")
    )
    # Materialize the ranged layout ONCE before fanning out: the
    # per-partition sums and the row-side join below both key on
    # __pid = spark_partition_id(), which is only consistent if both
    # branches read the SAME physical range exchange. Exchange reuse
    # usually guarantees that, but range-boundary sampling is
    # plan-instance-dependent, so a defeated reuse would silently
    # mis-sample; the eager localCheckpoint pins one set of partitions
    # (and truncates the lineage) so __pid is a fact, not a plan
    # artifact.
    ranged = (
        df.repartitionByRange(*[F.col(c) for c in order_by])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    psums = ranged.groupBy("__pid").agg(F.sum(w).alias("__psum"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    # tiny frame: one row per shuffle partition
    offsets = psums.withColumn(
        "__offset", F.coalesce(F.sum("__psum").over(w_off), F.lit(0))
    ).select("__pid", "__offset")
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(*[F.col(c) for c in order_by])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cb = (F.coalesce(F.sum(w).over(w_in), F.lit(0)) + F.col("__offset")).cast("long")
    hits = F.expr(f"(__cb + cast({weight_col} as bigint)) div __stride - __cb div __stride")
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .crossJoin(F.broadcast(tot))
        .withColumn("__cb", cb)
        .withColumn(hits_col, hits.cast("long"))
        .filter(F.col(hits_col) >= 1)
        .drop("__pid", "__offset", "__cb", "__stride")
    )
