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

    Same nanosecond-long → microsecond-timestamp conversion as the
    batch reader (see ``sources/readers.py``): exact integer division,
    never double math.
    """
    df = stream_parquet_dir(
        spark,
        sf_dir,
        schemas.EVENTS,
        max_files_per_trigger,
        glob_filter="events.parquet",
    )
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
