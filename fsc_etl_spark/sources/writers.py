"""Sinks (SURVEY.md §2.1 S8-S10).

The reference writes the curated fact table with
``coalesce(1).write.partitionBy("Year","Month")`` (``main.py:235``) —
forcing every write through ONE task. That is the single biggest
scale anti-pattern in the reference (BASELINE.md §a): at 100 TB a
one-task write never finishes. Here:

- no ``coalesce(1)`` ever: AQE coalesces shuffle partitions to sane
  file sizes (``spark.sql.adaptive.coalescePartitions.enabled``);
- partitioned writes keep the reference's Hive-style ``Year/Month``
  layout so readers get partition pruning;
- an optional ``target_file_rows`` repartition lets callers bound file
  counts deterministically when AQE isn't in play (e.g. plain appends).

Delta is not on the classpath in this environment (TESTDATA.md env);
``operators/merge.py`` supplies merge/upsert semantics over plain
parquet directories with an atomic swap.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    mode: str = "append",
    fmt: str = "parquet",
    partitions_per_write: int | None = None,
) -> None:
    """Partitioned columnar sink (S8/S10 without the coalesce(1)).

    When ``partition_by`` is set we repartition by the partition columns
    first so each output directory is written by the tasks that own its
    keys — avoiding the many-small-files explosion of every task
    touching every partition value.
    """
    out = df
    if partition_by:
        if partitions_per_write:
            out = out.repartition(partitions_per_write, *partition_by)
        else:
            out = out.repartition(*partition_by)
    writer = out.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
