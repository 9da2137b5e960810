"""Streaming Python DataSource: the synthetic corpus as a stream.

Proves the custom-source streaming path end-to-end: offsets advance
per micro-batch, the run covers multiple batches, and the streamed
corpus equals the batch source row-for-row (same deterministic
generator)."""

from __future__ import annotations

import tempfile
import time


def test_stream_equals_batch_corpus(spark):
    from fsc_etl_spark.sources.pydatasource import register

    register(spark)
    n = 600
    batch = spark.read.format("fsc_synth_docs").option("n", str(n)).load()
    stream = (
        spark.readStream.format("fsc_synth_docs")
        .option("n", str(n))
        .option("rows_per_batch", "100")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("select count(*) n from synth_stream").first()["n"] >= n:
                break
            time.sleep(0.5)
        # Keep the query running past catch-up: the wrapper's
        # end==start cache path calls next() on the reader's return
        # value, so a source that returns a non-iterator on an empty
        # batch fails HERE, after exhaustion — not during the fill.
        time.sleep(3.0)
        assert q.exception() is None, q.exception()
        assert q.isActive
    finally:
        q.stop()
    got = {tuple(r) for r in spark.sql("select * from synth_stream").collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(got) == n
    # multiple micro-batches actually ran (600 rows / 100 per batch)
    assert len(q.recentProgress) >= 2
