"""Table maintenance: compaction and clustering (SURVEY.md §2.10).

The reference forces one output file per write with ``coalesce(1)``
(``/root/reference/main.py:235``) — merging the write with compaction
at the cost of a single-task write. At scale those are separate jobs:
writes stay wide, and a periodic maintenance pass fixes layout:

- :func:`compact` — rewrite a parquet directory to ~``target_file_mb``
  files (the OPTIMIZE/bin-packing half of Delta's story, on plain
  parquet with the same atomic-swap commit the merge target uses);
- :func:`cluster_by` — additionally sort within partitions by chosen
  columns before writing (the poor man's Z-ORDER: range-partition +
  in-file ordering gives readers min/max-stat file skipping on the
  clustered columns).
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _atomic_swap(df: DataFrame, path: str) -> None:
    staged = f"{path.rstrip('/')}_staged_{uuid.uuid4().hex}"
    df.write.mode("overwrite").parquet(staged)
    old = f"{path.rstrip('/')}_old_{uuid.uuid4().hex}"
    os.rename(path, old)
    os.rename(staged, path)
    shutil.rmtree(old, ignore_errors=True)


def compact(spark: SparkSession, path: str, target_file_mb: int = 128) -> int:
    """Rewrite ``path`` into ceil(bytes / target) files; returns the
    new file count. Local-FS commit is an atomic directory swap; on a
    real lake this is Delta/Iceberg ``OPTIMIZE``'s job."""
    n_files = max(1, -(-_dir_bytes(path) // (target_file_mb << 20)))
    df = spark.read.parquet(path).repartition(n_files)
    _atomic_swap(df, path)
    return n_files


def cluster_by(
    spark: SparkSession,
    path: str,
    cols: Sequence[str],
    target_file_mb: int = 128,
) -> int:
    """Compact AND range-cluster by ``cols``: rows are range-partitioned
    then sorted within each file, so parquet min/max stats on ``cols``
    become selective — scans with predicates on the clustered columns
    skip whole files (the practical effect of Z-ORDER for
    single-dimension-dominant predicates)."""
    n_files = max(1, -(-_dir_bytes(path) // (target_file_mb << 20)))
    df = (
        spark.read.parquet(path)
        .repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
    )
    _atomic_swap(df, path)
    return n_files
