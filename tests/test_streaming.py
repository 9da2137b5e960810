"""Structured Streaming semantics that the single-batch oracle gate
can't see: watermark late-data drop, state carry-over across
checkpointed restarts, and session-window merging across batches.

Inputs are staged as parquet files appended to a temp dir between
AvailableNow passes — each pass resumes from the same checkpoint, so
the engine's state store and watermark persistence are genuinely
exercised.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fsc_etl_spark.streaming.pipeline import tumbling_aggregate
from fsc_etl_spark.streaming.sources import stream_parquet_dir
from fsc_etl_spark.streaming.stateful import user_running_stats

EVENTS_MINI = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)

T0 = dt.datetime(2024, 5, 1, 0, 0, 0)


def _write_batch(spark, input_dir: str, rows: list[tuple], name: str) -> None:
    """Stage one input file the way a producer would: write, then move
    a single finished parquet file into the watched directory (the file
    source lists top-level files only)."""
    df = spark.createDataFrame(
        [Row(user_id=u, ts=ts, value=v) for u, ts, v in rows], EVENTS_MINI
    )
    staging = os.path.join(input_dir, os.pardir, f"stage_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    part = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    os.replace(os.path.join(staging, part), os.path.join(input_dir, f"{name}.parquet"))


def _dirs() -> tuple[str, str, str]:
    base = tempfile.mkdtemp(prefix="fsc_stream_test_")
    in_dir, ckpt, out = (os.path.join(base, d) for d in ("in", "ckpt", "out"))
    os.makedirs(in_dir)
    return in_dir, ckpt, out


def _run_windowed_pass(spark, in_dir: str, ckpt: str, out: str) -> None:
    stream = stream_parquet_dir(spark, in_dir, EVENTS_MINI)
    agg = tumbling_aggregate(
        stream,
        aggs=[F.count(F.lit(1)).alias("n")],
        duration="1 hour",
        group_cols=("user_id",),
        watermark="10 minutes",
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@pytest.mark.slow
def test_watermark_drops_late_data(spark):
    in_dir, ckpt, out = _dirs()

    # Pass 1: events in hours 0 and 1, plus one at hour 3 that pushes
    # the watermark to 02:50 — hours 0-1 finalize and emit.
    _write_batch(
        spark,
        in_dir,
        [
            (1, T0 + dt.timedelta(minutes=5), 1.0),
            (1, T0 + dt.timedelta(minutes=40), 1.0),
            (1, T0 + dt.timedelta(hours=1, minutes=10), 1.0),
            (1, T0 + dt.timedelta(hours=3), 1.0),
        ],
        "b1",
    )
    _run_windowed_pass(spark, in_dir, ckpt, out)
    res1 = {
        (r["window_start"], r["user_id"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    assert res1[(T0, 1)] == 2
    assert res1[(T0 + dt.timedelta(hours=1), 1)] == 1
    assert (T0 + dt.timedelta(hours=3), 1) not in res1  # not yet finalized

    # Pass 2: one LATE event in hour 0 (behind the persisted watermark
    # -> dropped) and one at hour 5 (advances watermark, finalizes h3).
    _write_batch(
        spark,
        in_dir,
        [
            (1, T0 + dt.timedelta(minutes=30), 99.0),  # late, must be dropped
            (1, T0 + dt.timedelta(hours=5), 1.0),
        ],
        "b2",
    )
    _run_windowed_pass(spark, in_dir, ckpt, out)
    res2 = {
        (r["window_start"], r["user_id"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    # hour-0 window was emitted once with n=2 and never re-emitted:
    assert res2[(T0, 1)] == 2
    assert res2[(T0 + dt.timedelta(hours=3), 1)] == 1


@pytest.mark.slow
def test_stateful_operator_survives_restart(spark):
    in_dir, ckpt, _ = _dirs()
    sink: list[tuple] = []

    def _run_pass():
        stream = stream_parquet_dir(spark, in_dir, EVENTS_MINI)
        stats = user_running_stats(stream)

        def _collect(batch_df, _epoch):
            sink.extend(
                (r["user_id"], r["n_events"], r["max_value"])
                for r in batch_df.collect()
            )

        q = (
            stats.writeStream.foreachBatch(_collect)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write_batch(
        spark,
        in_dir,
        [(7, T0, 1.5), (7, T0 + dt.timedelta(minutes=1), 3.5), (8, T0, 2.0)],
        "b1",
    )
    _run_pass()
    assert (7, 2, 3.5) in sink and (8, 1, 2.0) in sink

    # Restart from the same checkpoint with two more events for user 7:
    # counts continue from the persisted state (2 -> 4), max updates.
    _write_batch(
        spark,
        in_dir,
        [(7, T0 + dt.timedelta(minutes=2), 9.0), (7, T0 + dt.timedelta(minutes=3), 0.5)],
        "b2",
    )
    _run_pass()
    assert (7, 4, 9.0) in sink
    # user 8 had no new events -> not re-emitted in the second pass
    assert sink.count((8, 1, 2.0)) == 1


@pytest.mark.slow
def test_session_windows_merge_across_batches(spark):
    """Two events 10 min apart arriving in DIFFERENT micro-batches must
    merge into one session in the state store."""
    from fsc_etl_spark.streaming.pipeline import run_to_memory, session_aggregate

    in_dir, ckpt, _ = _dirs()
    _write_batch(spark, in_dir, [(1, T0, 1.0)], "b1")
    _write_batch(spark, in_dir, [(1, T0 + dt.timedelta(minutes=10), 1.0)], "b2")

    stream = stream_parquet_dir(spark, in_dir, EVENTS_MINI, max_files_per_trigger=1)
    agg = session_aggregate(stream, aggs=[F.count(F.lit(1)).alias("n")], gap="30 minutes")
    res = run_to_memory(agg, output_mode="complete").collect()
    assert len(res) == 1
    row = res[0]
    assert row["n"] == 2
    assert row["session_start"] == T0
    assert row["session_end"] == T0 + dt.timedelta(minutes=40)


@pytest.mark.slow
def test_multibatch_sessionize_crosses_batches(spark, sf_smoke):
    """The queries() entry itself raises unless >=2 non-empty
    micro-batches ran; here also check the staging preserved every
    event and the result matches the single-batch sessionize."""
    from fsc_etl_spark.plans.streaming_queries import (
        streaming_multibatch_sessionize,
        streaming_sessionize,
    )
    from fsc_etl_spark.sources.readers import read_parquet_table
    from fsc_etl_spark.streaming import stage_events_as_files

    staged = stage_events_as_files(spark, sf_smoke, n_files=4)
    n_staged = spark.read.parquet(staged).count()
    assert n_staged == read_parquet_table(spark, sf_smoke, "events").count()

    multi = {
        tuple(r) for r in streaming_multibatch_sessionize(spark, sf_smoke).collect()
    }
    single = {tuple(r) for r in streaming_sessionize(spark, sf_smoke).collect()}
    assert multi == single


def test_tws_twin_matches_apply_in_pandas_with_state(spark, sf_smoke):
    """The transformWithStateInPandas twin must produce the same final
    per-user stats as the applyInPandasWithState operator. Skipped
    where protobuf (the TWS state-server protocol dependency) is
    absent — the operator itself is still importable and its plan
    constructible."""
    import pytest

    from fsc_etl_spark.streaming.stateful import tws_available, user_running_stats_tws

    if not tws_available():
        # Env-gated: still assert the operator builds a streaming plan.
        from fsc_etl_spark.streaming.sources import stream_events

        ev = stream_events(spark, sf_smoke).select("user_id", "ts", "value")
        df = user_running_stats_tws(ev)
        assert df.isStreaming
        pytest.skip("google.protobuf absent — TWS runtime env-gated")

    import tempfile

    from fsc_etl_spark.streaming.sources import stream_events

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        ev = stream_events(spark, sf_smoke).select("user_id", "ts", "value")
        q = (
            user_running_stats_tws(ev)
            .writeStream.format("memory")
            .queryName("tws_parity")
            .outputMode("update")
            .option("checkpointLocation", tempfile.mkdtemp())
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["user_id"], r["n_events"], r["max_value"])
            for r in spark.sql(
                "select * from tws_parity qualify row_number() over "
                "(partition by user_id order by n_events desc) = 1"
            ).collect()
        }
        from fsc_etl_spark.sources.readers import read_parquet_table

        import pyspark.sql.functions as F

        want = {
            tuple(r)
            for r in read_parquet_table(spark, sf_smoke, "events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
            .collect()
        }
        assert got == want
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


@pytest.mark.slow
def test_incremental_segment_dedup_resumes_from_checkpoint(spark, sf_smoke, tmp_path):
    """The foreachBatch seen-hash state pattern must survive a stream
    STOP + RESUME: run the first half of the corpus, tear the query
    down, append the second half to the source prefix, re-run with the
    SAME checkpoint and state dirs — the converged result must equal
    the batch keep-first oracle over the whole corpus (no reprocessed
    batch, no lost state)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from fsc_etl_spark import schemas
    from fsc_etl_spark.plans.training_data import segment_hashes
    from fsc_etl_spark.sources.readers import read_parquet_table
    from fsc_etl_spark.streaming.pipeline import run_foreach_batch
    from fsc_etl_spark.streaming.sources import stream_parquet_dir

    docs = read_parquet_table(spark, sf_smoke, "documents").select("doc_id", "text")
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).first()[0]
    src = str(tmp_path / "src")
    state = str(tmp_path / "seen")
    results = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([], "seg_hash string").write.parquet(state)

    def handle(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        w = Window.partitionBy("seg_hash").orderBy("doc_id", "seg_idx")
        seen = spark.read.schema("seg_hash string").parquet(state)
        segs = (
            segment_hashes(batch_df)
            .withColumn("first_in_batch", F.row_number().over(w) == 1)
            .join(seen.withColumn("in_hist", F.lit(True)), "seg_hash", "left")
            .withColumn("keep", F.col("first_in_batch") & F.col("in_hist").isNull())
            .localCheckpoint()
        )
        segs.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
        ).write.mode("append").parquet(results)
        segs.filter("keep").select("seg_hash").distinct().write.mode("append").parquet(state)

    # phase 1: first half only, then the query terminates (AvailableNow)
    docs.filter(F.col("doc_id") <= mid).repartition(1).write.mode("append").parquet(src)
    stream1 = stream_parquet_dir(spark, src, schemas.DOCUMENTS, max_files_per_trigger=1)
    run_foreach_batch(
        stream1.select("doc_id", "text"), handle, checkpoint_dir=ckpt
    )
    n_phase1 = spark.read.parquet(results).count()
    assert 0 < n_phase1 < docs.count()

    # phase 2: append the rest, RESUME with the same checkpoint
    docs.filter(F.col("doc_id") > mid).repartition(1).write.mode("append").parquet(src)
    stream2 = stream_parquet_dir(spark, src, schemas.DOCUMENTS, max_files_per_trigger=1)
    run_foreach_batch(
        stream2.select("doc_id", "text"), handle, checkpoint_dir=ckpt
    )

    got = {
        tuple(r)
        for r in spark.read.schema(
            "doc_id bigint, n_segments bigint, n_kept bigint"
        ).parquet(results).collect()
    }
    w = Window.partitionBy("seg_hash").orderBy("doc_id", "seg_idx")
    want = {
        tuple(r)
        for r in segment_hashes(docs)
        .withColumn("keep", F.row_number().over(w) == 1)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
        )
        .collect()
    }
    assert got == want  # each doc exactly once => resume skipped nothing, repeated nothing


def test_streaming_dsir_gate_matches_batch(spark, sf_smoke):
    """The stream-static DSIR gate's converged output must equal the
    batch dsir_importance_weights rows exactly — same frozen reference
    scores, same exact-integer accumulation, micro-batching must not
    move anything."""
    from fsc_etl_spark.plans.streaming_queries import streaming_dsir_gate
    from fsc_etl_spark.plans.training_data import dsir_importance_weights

    got = {tuple(r) for r in streaming_dsir_gate(spark, sf_smoke).collect()}
    want = {tuple(r) for r in dsir_importance_weights(spark, sf_smoke).collect()}
    assert got == want


@pytest.mark.slow
def test_segment_dedup_crash_recovery(spark, sf_smoke):
    """Exactly-once evidence (VERDICT r8 #10): kill the stream TWICE —
    once between micro-batches (before any side effect of epoch 1) and
    once inside the at-least-once window (after epoch 2's state/result
    writes, before its checkpoint commit) — restart from the same
    checkpoint each time, and require the converged state to equal an
    uninterrupted run exactly. The second crash is the one a plain
    append-based handler fails: the replayed epoch would double-append
    results and see its own hashes as history."""
    import tempfile

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from fsc_etl_spark import schemas
    from fsc_etl_spark.plans.streaming_queries import (
        init_segment_dedup_dirs,
        read_segment_dedup_results,
        segment_dedup_batch_handler,
        streaming_segment_dedup,
    )
    from fsc_etl_spark.streaming.pipeline import run_foreach_batch
    from fsc_etl_spark.streaming.sources import (
        stage_documents_as_files,
        stream_parquet_dir,
    )

    staged = stage_documents_as_files(
        spark, sf_smoke, n_files=4, out_dir=tempfile.mkdtemp(prefix="fsc_crash_docs_")
    )

    def docs():
        return stream_parquet_dir(
            spark, staged, schemas.DOCUMENTS, max_files_per_trigger=1
        ).select("doc_id", "text")

    state_dir, results_dir = init_segment_dedup_dirs(spark)
    ckpt = tempfile.mkdtemp(prefix="fsc_crash_ckpt_")
    sizes: list[int] = []
    crashed = {"pre": False, "post": False}

    def crash_once(batch_id: int, phase: str) -> None:
        if batch_id == 1 and phase == "pre" and not crashed["pre"]:
            crashed["pre"] = True
            raise RuntimeError("injected crash between micro-batches")
        if batch_id == 2 and phase == "post" and not crashed["post"]:
            crashed["post"] = True
            raise RuntimeError("injected crash after side effects, before commit")

    handler = segment_dedup_batch_handler(
        spark, state_dir, results_dir, sizes, crash_hook=crash_once
    )
    attempts = 0
    while True:
        attempts += 1
        assert attempts <= 4, "stream kept failing past the injected crashes"
        try:
            run_foreach_batch(
                docs(), handler, output_mode="append", checkpoint_dir=ckpt
            )
            break
        except StreamingQueryException:
            continue  # simulated crash — restart from the same checkpoint
    assert crashed["pre"] and crashed["post"], "both crash sites must have fired"
    assert attempts == 3  # clean run only after both injected failures

    got = sorted(
        (r.doc_id, r.n_segments, r.n_kept)
        for r in read_segment_dedup_results(spark, results_dir).collect()
    )
    clean = sorted(
        (r.doc_id, r.n_segments, r.n_kept)
        for r in streaming_segment_dedup(spark, sf_smoke).collect()
    )
    assert got == clean and len(got) > 0


@pytest.mark.slow
def test_mg_fold_crash_recovery(spark, sf_smoke):
    """Exactly-once evidence for the Misra–Gries fold
    (mg_batch_handler): same two kill sites as the segment-dedup
    proof — between micro-batches and inside the at-least-once window
    (after epoch 2's summary overwrite, before its checkpoint commit)
    — restart from the same checkpoint, require the converged summary
    to equal an uninterrupted run exactly. The post-write replay is
    the one a plain append-based state layout fails: the replayed
    epoch would merge with ITS OWN partial summary (epoch <= batch_id
    would double the fold); the batch_id-keyed overwrite + latest
    epoch < batch_id read makes it idempotent."""
    import tempfile

    from pyspark.errors.exceptions.captured import StreamingQueryException
    from pyspark.sql import functions as F

    from fsc_etl_spark import schemas
    from fsc_etl_spark.plans.corpus_stats import MG_K
    from fsc_etl_spark.plans.streaming_queries import (
        init_mg_state_dir,
        mg_batch_handler,
        streaming_mg_heavy_tokens,
    )
    from fsc_etl_spark.streaming.pipeline import run_foreach_batch
    from fsc_etl_spark.streaming.sources import (
        stage_documents_as_files,
        stream_parquet_dir,
    )

    staged = stage_documents_as_files(
        spark, sf_smoke, n_files=4, out_dir=tempfile.mkdtemp(prefix="fsc_mgcrash_")
    )

    def docs():
        return stream_parquet_dir(
            spark, staged, schemas.DOCUMENTS, max_files_per_trigger=1
        ).select("doc_id", "text")

    state_dir = init_mg_state_dir(spark)
    ckpt = tempfile.mkdtemp(prefix="fsc_mgcrash_ckpt_")
    sizes: list[int] = []
    crashed = {"pre": False, "post": False}

    def crash_once(batch_id: int, phase: str) -> None:
        if batch_id == 1 and phase == "pre" and not crashed["pre"]:
            crashed["pre"] = True
            raise RuntimeError("injected crash between micro-batches")
        if batch_id == 2 and phase == "post" and not crashed["post"]:
            crashed["post"] = True
            raise RuntimeError("injected crash after state write, before commit")

    handler = mg_batch_handler(
        spark, state_dir, sizes, MG_K, crash_hook=crash_once
    )
    attempts = 0
    while True:
        attempts += 1
        assert attempts <= 4, "stream kept failing past the injected crashes"
        try:
            run_foreach_batch(
                docs(), handler, output_mode="append", checkpoint_dir=ckpt
            )
            break
        except StreamingQueryException:
            continue  # simulated crash — restart from the same checkpoint
    assert crashed["pre"] and crashed["post"], "both crash sites must have fired"
    assert attempts == 3

    state = spark.read.schema("tok string, cnt long, epoch long").parquet(
        f"{state_dir}/*"
    )
    last = state.agg(F.max("epoch").alias("e")).first()["e"]
    got = sorted(
        (r.tok, r.cnt)
        for r in state.filter(F.col("epoch") == last).collect()
    )
    clean = sorted(
        (r.tok, r.mg_est)
        for r in streaming_mg_heavy_tokens(spark, sf_smoke).collect()
    )
    assert got == clean and 0 < len(got) <= MG_K
