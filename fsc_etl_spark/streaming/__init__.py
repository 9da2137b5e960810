"""Structured Streaming surface (SURVEY.md §2.11).

The reference has no streaming — incrementality is batch-emulated
(daily snapshot diff + MERGE, ``/root/reference/main.py:89-199``).
This package provides the streaming expression of the same semantics,
plus the event-stream operators the driver's ``events`` fixture
exercises: watermarked tumbling/sliding windows, session windows,
foreachBatch merge sinks, and a custom stateful operator via
``applyInPandasWithState``.
"""

from fsc_etl_spark.streaming.sources import (
    stage_events_as_files,
    stream_documents,
    stream_events,
    stream_parquet_dir,
    stream_staged_events,
)
from fsc_etl_spark.streaming.pipeline import (
    run_to_memory,
    run_foreach_batch,
    session_aggregate,
    streaming_merge_to_target,
    tumbling_aggregate,
)
from fsc_etl_spark.streaming.stateful import user_running_stats

__all__ = [
    "stage_events_as_files",
    "stream_documents",
    "stream_events",
    "stream_parquet_dir",
    "stream_staged_events",
    "run_to_memory",
    "run_foreach_batch",
    "session_aggregate",
    "streaming_merge_to_target",
    "tumbling_aggregate",
    "user_running_stats",
]
