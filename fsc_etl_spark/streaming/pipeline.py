"""Streaming transformations and runners.

Windowed aggregations stay entirely in Catalyst's streaming state
store (incremental hash aggregation keyed by (window, group)); the
watermark bounds state size — without one, complete-mode state grows
with key cardinality, which is fine for bounded key spaces
(event_type × hour over a retention window) and wrong for unbounded
ones. At 100 TB/day the pattern is: watermark + append mode +
partitioned sink, with ``spark.sql.shuffle.partitions`` sized to the
stateful-operator parallelism (state is partitioned by the shuffle).

Runners execute a stream to completion with ``Trigger.AvailableNow``
— the deterministic "process everything currently available then
stop" mode that makes streaming plans testable against batch oracles
while exercising the real streaming engine (state store, micro-batch
planner, checkpoints).
"""

from __future__ import annotations

import tempfile
import uuid
from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fsc_etl_spark.operators.merge import ParquetMergeTarget


def tumbling_aggregate(
    events: DataFrame,
    aggs: Sequence[Column],
    ts_col: str = "ts",
    duration: str = "1 hour",
    slide: str | None = None,
    group_cols: Sequence[str] = ("event_type",),
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding) event-time window agg.

    Streaming twin of the batch ``time_bucket_agg`` — same output
    column names so the two share one oracle.
    """
    df = events.withWatermark(ts_col, watermark) if watermark else events
    window = F.window(ts_col, duration, slide) if slide else F.window(ts_col, duration)
    out = df.groupBy(window.alias("w"), *group_cols).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        *group_cols,
        *[c for c in out.columns if c not in ("w", *group_cols)],
    )


def session_aggregate(
    events: DataFrame,
    aggs: Sequence[Column],
    ts_col: str = "ts",
    gap: str = "30 minutes",
    user_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session windows via the native ``session_window``.

    The streaming engine merges overlapping per-event windows in the
    state store; the batch shape of the same semantics is the
    lag+cumsum sessionize in ``operators/windows.py``. Session end =
    last event + gap (half-open, an event exactly ``gap`` after the
    previous one starts a new session).
    """
    df = events.withWatermark(ts_col, watermark) if watermark else events
    out = df.groupBy(F.session_window(ts_col, gap).alias("w"), user_col).agg(*aggs)
    return out.select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        user_col,
        *[c for c in out.columns if c not in ("w", user_col)],
    )


def run_to_memory(
    stream_df: DataFrame,
    output_mode: str = "complete",
    query_name: str | None = None,
    batch_counts: list[int] | None = None,
) -> DataFrame:
    """Run an AvailableNow pass into a memory sink; return the result.

    Test/gate runner — production streams write to durable sinks via
    :func:`run_foreach_batch` / ``writeStream.format("parquet")``.
    ``batch_counts``, if given, receives the per-micro-batch input row
    counts so callers can assert the run actually crossed batch
    boundaries.
    """
    name = query_name or f"mem_{uuid.uuid4().hex[:8]}"
    # Deterministic per-(tag, pid, query-name) checkpoint, CLEARED each
    # call: a streaming checkpoint must be fresh per run (a stale
    # offset log would mark the staged files already-processed), and
    # mkdtemp per call accumulated one abandoned checkpoint per sweep
    # invocation. The query name is part of the tag so concurrent
    # run_to_memory calls in one process (threads) never rmtree or
    # share an ACTIVE query's offset log — the per-pid reaping
    # behavior is unchanged.
    import re
    import shutil

    from fsc_etl_spark.scratch import scratch_path

    # Sanitize the caller-supplied name before it becomes a path
    # component (ADVICE r5): a separator or shell-odd character must
    # not escape or fragment the scratch dir. The memory-sink
    # queryName keeps the original. A short hash of the ORIGINAL name
    # keeps distinct names collision-free after sanitization (ADVICE
    # r6: 'a/b' and 'a b' both mapped to 'a_b', so one run's
    # unconditional rmtree could clobber a concurrent sibling's ACTIVE
    # checkpoint dir — the pre-sanitization scheme relied on name
    # uniqueness that the mapping destroyed).
    import hashlib

    safe = re.sub(r"[^A-Za-z0-9_.-]", "_", name)
    tag = hashlib.md5(name.encode()).hexdigest()[:8]
    ckpt = scratch_path(f"stream_ckpt_{safe}_{tag}")
    shutil.rmtree(ckpt, ignore_errors=True)
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if batch_counts is not None:
            batch_counts.extend(p["numInputRows"] for p in q.recentProgress)
    finally:
        # An AvailableNow run is complete once it terminates; its
        # offset log has no further reader, so reap it here instead of
        # leaking one checkpoint per uuid-named invocation.
        shutil.rmtree(ckpt, ignore_errors=True)
    return stream_df.sparkSession.table(name)


def run_foreach_batch(
    stream_df: DataFrame,
    batch_fn: Callable[[DataFrame, int], None],
    output_mode: str = "update",
    checkpoint_dir: str | None = None,
) -> None:
    """Run an AvailableNow pass through a ``foreachBatch`` sink.

    ``foreachBatch`` is the streaming-to-anything escape hatch the
    reference's MERGE-based incrementality maps onto (SURVEY.md §2.11
    option (b)): each micro-batch is a normal DataFrame the callback
    can merge/upsert with full batch semantics, exactly once per
    epoch given an idempotent sink.
    """
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="fsc_ckpt_")
    q = (
        stream_df.writeStream.foreachBatch(batch_fn)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_merge_to_target(
    stream_df: DataFrame,
    target: ParquetMergeTarget,
    on: Sequence[str],
    order_cols: Sequence[str],
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Streaming upsert: keep the latest row per key in a mutable
    table — the streaming expression of the reference's daily MERGE
    loop (J4/J5).

    Each micro-batch is first reduced to one row per key (greatest
    ``order_cols`` wins — Delta MERGE's unique-source contract), then
    merged last-writer-wins on ``order_cols[0]`` as the delta column.
    Cross-batch ordering is handled by the merge's ``>=`` guard, so
    replays/out-of-order batches converge to the same final state.
    """
    w_cols = [F.col(c).desc() for c in order_cols]

    def _merge_batch(batch: DataFrame, _epoch: int) -> None:
        from pyspark.sql.window import Window

        ranked = batch.withColumn(
            "__rn", F.row_number().over(Window.partitionBy(*on).orderBy(*w_cols))
        )
        latest = ranked.filter(F.col("__rn") == 1).drop("__rn")
        target.merge(latest, on=on, delta_col=order_cols[0])

    run_foreach_batch(stream_df, _merge_batch, checkpoint_dir=checkpoint_dir)
    return target.read()
