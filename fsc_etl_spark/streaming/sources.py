"""Streaming scans.

File-source ``readStream`` with an explicit schema — the streaming
twin of ``sources/readers.py``. The file source scales horizontally:
each micro-batch lists new files and splits them across executors, so
the same code drives a 1000-executor cluster tailing an object-store
prefix. ``maxFilesPerTrigger`` bounds per-batch work (backpressure);
at scale pair it with ``maxBytesPerTrigger``-style sizing via file
compaction upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fsc_etl_spark import schemas


def stream_parquet_dir(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
    glob_filter: str | None = None,
) -> DataFrame:
    """Schema-first parquet file stream over a directory.

    The file source requires a directory ``basePath``; ``glob_filter``
    selects a file subset within it (e.g. one table out of a shared
    fixture dir) without changing the base path.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if glob_filter is not None:
        reader = reader.option("pathGlobFilter", glob_filter)
    return reader.parquet(path)


def stream_events(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The driver's ``events`` table as a stream.

    The fixture's ``ts`` encoding varies by generation (TIMESTAMP(NANOS)
    vs TIMESTAMP(MICROS)); a footer-only batch probe picks the scan
    schema, mirroring the batch reader (``sources/readers.py``). The
    nanos form converts with exact integer division, never double math.
    """
    from fsc_etl_spark.sources.readers import events_ts_is_long

    if events_ts_is_long(spark, f"{sf_dir}/events.parquet"):
        df = stream_parquet_dir(
            spark,
            sf_dir,
            schemas.EVENTS,
            max_files_per_trigger,
            glob_filter="events.parquet",
        )
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream_parquet_dir(
        spark,
        sf_dir,
        schemas.EVENTS_TS,
        max_files_per_trigger,
        glob_filter="events.parquet",
    )


EVENTS_STAGED = schemas.EVENTS_TS


def stage_events_as_files(
    spark: SparkSession, sf_dir: str, n_files: int = 4, out_dir: str | None = None
) -> str:
    """Split the events fixture into ``n_files`` time-ordered parquet
    files so a ``maxFilesPerTrigger=1`` stream replays them as
    ``n_files`` separate micro-batches — the multi-batch harness that
    makes watermark advance and state carry-over observable (a
    single-file fixture is always one batch).

    The split is on equal event-time intervals, written as sequential
    single-file appends so listing order == modification order ==
    event-time order (how a tailed object-store prefix arrives). The
    ``ts`` column is written as a real timestamp (normalized by the
    batch reader whatever the fixture encoding), so readers use
    EVENTS_STAGED.

    The default output is the deterministic per-(tag, pid) scratch
    path — cleared and restaged on each invocation, because staging
    APPENDS ``n_files`` sequential files and a stale copy would
    double the batch count (a fresh ``mkdtemp`` per call leaked a
    fixture copy per sweep/bench invocation — the same accumulation
    the layout-rewrite queries had).
    """
    import shutil

    from fsc_etl_spark.scratch import scratch_path
    from fsc_etl_spark.sources.readers import read_parquet_table

    out = out_dir or scratch_path(f"events_staged_{n_files}")
    if out_dir is None:
        shutil.rmtree(out, ignore_errors=True)
    ev = read_parquet_table(spark, sf_dir, "events")
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    span_us = max(1, int((hi - lo).total_seconds() * 1_000_000) + 1)
    step = span_us // n_files + 1
    bucket = (F.unix_micros(F.col("ts")) - F.unix_micros(F.lit(lo))) / F.lit(step)
    with_bucket = ev.withColumn("__b", F.floor(bucket).cast("int"))
    for i in range(n_files):
        # One file per time slice: repartition(1) is deliberate here —
        # this stages a micro-batch fixture, not a production sink.
        (
            with_bucket.filter(F.col("__b") == i)
            .drop("__b")
            .repartition(1)
            .write.mode("append")
            .parquet(out)
        )
    return out


def stream_staged_events(
    spark: SparkSession, staged_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File stream over a ``stage_events_as_files`` directory: one
    micro-batch per staged file."""
    return stream_parquet_dir(
        spark,
        staged_dir,
        EVENTS_STAGED,
        max_files_per_trigger=max_files_per_trigger,
        glob_filter="*.parquet",
    )


def stage_documents_as_files(
    spark: SparkSession, sf_dir: str, n_files: int = 4, out_dir: str | None = None
) -> str:
    """Split the documents fixture into ``n_files`` doc_id-ordered
    parquet files (sequential single-file appends, so listing order ==
    modification order == id order) — the corpus-drop-prefix replay
    harness for multi-batch ingest tests. Arrival order matching
    doc_id order is what lets keep-first-by-arrival dedup reproduce
    the batch keep-first-by-doc_id oracle exactly.

    Defaults to the cleared per-(tag, pid) scratch path — see
    stage_events_as_files for why (append staging + stale copies
    would double batch counts; mkdtemp leaked a copy per call)."""
    import shutil

    from fsc_etl_spark.scratch import scratch_path
    from fsc_etl_spark.sources.readers import read_parquet_table

    out = out_dir or scratch_path(f"docs_staged_{n_files}")
    if out_dir is None:
        shutil.rmtree(out, ignore_errors=True)
    docs = read_parquet_table(spark, sf_dir, "documents")
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    step = (hi - lo) // n_files + 1
    for i in range(n_files):
        (
            docs.filter(
                (F.col("doc_id") >= lo + i * step) & (F.col("doc_id") < lo + (i + 1) * step)
            )
            .repartition(1)
            .write.mode("append")
            .parquet(out)
        )
    return out


def stream_documents(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The driver's ``documents`` table as a stream — the shape of a
    training-data ingest tailing a corpus drop prefix."""
    return stream_parquet_dir(
        spark,
        sf_dir,
        schemas.DOCUMENTS,
        max_files_per_trigger,
        glob_filter="documents.parquet",
    )
