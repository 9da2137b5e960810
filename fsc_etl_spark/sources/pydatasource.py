"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic-corpus generator.

Why a generator source: scale/perf work constantly needs corpora
bigger than any fixture, and shipping files is the slow way — a
partitioned generator source materializes N documents directly on the
executors (each partition generates its own id range; no input I/O,
no driver data). Content is pure md5 of the doc id, so any other
engine can reproduce the exact rows — the DuckDB oracle rebuilds the
same corpus from ``range()`` + ``md5()`` and the driver's value-hash
check passes on full text equality.

Python-per-row cost is confined to the SOURCE boundary (the same
policy as the multimodal decode surface): generation IS the I/O here.
Downstream operators stay in codegen.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class SynthDocsDataSource(DataSource):
    """``spark.read.format("fsc_synth_docs").option("n", ...)``.

    Options:
      n           total documents (default 1000)
      partitions  generation parallelism (default 8)
      words       words per document (default 8, each 4 hex chars)
    """

    @classmethod
    def name(cls) -> str:
        return "fsc_synth_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, source string"

    def reader(self, schema) -> "SynthDocsReader":
        return SynthDocsReader(self.options)


class SynthDocsReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.words = int(options.get("words", 8))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition):
        import hashlib

        lo = partition.value * self.n // self.n_parts
        hi = (partition.value + 1) * self.n // self.n_parts
        for i in range(lo, hi):
            h = hashlib.md5(f"doc:{i}".encode()).hexdigest()
            # words cycle through the 32 hex chars in 4-char strides
            text = " ".join(
                h[(j * 4) % 32 : (j * 4) % 32 + 4] for j in range(self.words)
            )
            yield (i, text, f"src{i % 5}")


def register(spark) -> None:
    """Idempotent registration of the format with a session."""
    spark.dataSource.register(SynthDocsDataSource)


class SynthDocsStreamReader:
    """Simple streaming reader for the same synthetic corpus: each
    micro-batch emits the next ``rows_per_batch`` documents until
    ``n`` total — the custom-queue-ingest shape (offset = next doc id,
    checkpointable dict, deterministic replay via readBetweenOffsets).

    Generation is identical to the batch reader (md5 of the doc id),
    so a streamed corpus equals the batch corpus row-for-row — tested
    in tests/test_pydatasource_stream.py.
    """

    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.rows_per_batch = int(options.get("rows_per_batch", 250))
        self.words = int(options.get("words", 8))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def _rows(self, lo: int, hi: int):
        import hashlib

        for i in range(lo, hi):
            h = hashlib.md5(f"doc:{i}".encode()).hexdigest()
            text = " ".join(
                h[(j * 4) % 32 : (j * 4) % 32 + 4] for j in range(self.words)
            )
            yield (i, text, f"src{i % 5}")

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.rows_per_batch, self.n)
        # A list_iterator, not a generator (generators don't
        # copy.copy() for Spark's prefetch cache) and not a bare list:
        # when the stream catches up (lo == hi) the wrapper calls
        # next() on the returned value for the end==start case, which
        # raises TypeError on a plain list.
        return iter(list(self._rows(lo, hi))), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["next"]), int(end["next"]))

    def commit(self, end: dict) -> None:
        pass


def _simple_stream_reader(self, schema):
    return SynthDocsStreamReader(self.options)


# Attach the streaming capability to the existing DataSource class —
# the same format string serves spark.read and spark.readStream.
SynthDocsDataSource.simpleStreamReader = _simple_stream_reader
