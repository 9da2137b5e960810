"""Streaming queries for the driver gate (SURVEY.md §2.11).

Each callable runs a REAL Structured Streaming query (file source →
state store → sink) to completion with ``Trigger.AvailableNow`` and
returns the final result as a DataFrame, so the driver's DuckDB
oracle can verify streaming semantics against batch SQL. The
streaming engine is genuinely exercised — micro-batch planner,
streaming aggregation state store, session-window merge, pandas
stateful operator, foreachBatch merge sink — while the bounded input
makes results deterministic.

Determinism notes: the sf fixture is a single parquet file, so each
pass is one micro-batch; multi-batch behavior (watermarks, state
carry-over across checkpoint restarts) is covered by
tests/test_streaming.py with staged inputs rather than here.
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fsc_etl_spark import schemas

from fsc_etl_spark.operators.merge import ParquetMergeTarget
from fsc_etl_spark.streaming import (
    run_to_memory,
    session_aggregate,
    stream_events,
    streaming_merge_to_target,
    tumbling_aggregate,
    user_running_stats,
)


def streaming_hourly_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming twin of the batch ``hourly_event_rollup`` — same
    output schema, same oracle shape."""
    ev = stream_events(spark, sf).withColumn(
        "value_dec", F.col("value").cast("decimal(18,6)")
    )
    agg = tumbling_aggregate(
        ev,
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum("value_dec").cast("double").alias("sum_value"),
        ],
        duration="1 hour",
        group_cols=("event_type",),
    )
    return run_to_memory(agg, output_mode="complete").select(
        "window_start", "event_type", "n", "sum_value"
    )


def streaming_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Native ``session_window`` sessions (30-minute gap) per user."""
    ev = stream_events(spark, sf)
    agg = session_aggregate(
        ev, aggs=[F.count(F.lit(1)).alias("n")], gap="30 minutes"
    )
    return run_to_memory(agg, output_mode="complete").select(
        "session_start", "session_end", "user_id", "n"
    )


def streaming_user_state(spark: SparkSession, sf: str) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-user
    cumulative count + max. The emissions are monotone, so the final
    per-user state is the group-wise max over all emissions —
    batch-equivalent regardless of micro-batch split."""
    ev = stream_events(spark, sf).select("user_id", "ts", "value")
    emitted = run_to_memory(user_running_stats(ev), output_mode="update")
    return emitted.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max("max_value").alias("max_value")
    )


def streaming_upsert_latest(spark: SparkSession, sf: str) -> DataFrame:
    """foreachBatch MERGE sink: latest event per user, last-writer-wins
    on (ts, event_id) — the streaming form of the reference's daily
    MERGE incrementality (/root/reference/main.py:191-199)."""
    ev = stream_events(spark, sf).select("user_id", "event_id", "ts", "value")
    target = ParquetMergeTarget(spark, tempfile.mkdtemp(prefix="fsc_stream_tgt_"))
    final = streaming_merge_to_target(
        ev, target, on=["user_id"], order_cols=["ts", "event_id"]
    )
    return final.select("user_id", "event_id", "ts", "value")


def streaming_click_purchase_join(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked STREAM-STREAM inner join: each click joins the same
    user's purchases within the next 30 minutes. Both sides carry
    watermarks plus the event-time range condition, so the state store
    can evict rows once the other side's watermark passes — the
    bounded-state form of stream-stream joins. Append mode (inner join
    emits exactly once per match)."""
    ev = stream_events(spark, sf)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    )
    out = run_to_memory(joined, output_mode="append")
    return out.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts")).alias("delay_us"),
    )


def streaming_dedup_events(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``dropDuplicatesWithinWatermark`` on event_id. The input is
    doubled first (explode over a 2-element array) so the operator
    provably removes something; the watermark lets the state store
    evict ids once event time passes, which is what makes streaming
    dedup feasible forever — state is a sliding set, not an unbounded
    one. Duplicate pairs are identical rows, so whichever copy wins,
    the output is deterministic."""
    ev = stream_events(spark, sf).select("event_id", "user_id", "ts", "value")
    doubled = ev.withColumn("copy", F.explode(F.array(F.lit(0), F.lit(1)))).drop("copy")
    deduped = doubled.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    out = run_to_memory(deduped, output_mode="append")
    return out.select("event_id", "user_id", "value")


def streaming_enrich_dim(spark: SparkSession, sf: str) -> DataFrame:
    """STREAM-STATIC join: the event stream enriched against the
    batch customer dimension (user_id = c_custkey), then rolled up by
    market segment. The static side broadcasts — each micro-batch is a
    map-side hash join with no streaming state at all, the canonical
    shape for dimension enrichment at any scale."""
    from fsc_etl_spark.sources.readers import read_parquet_table

    ev = stream_events(spark, sf).select("event_id", "user_id", "value")
    cust = read_parquet_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = ev.join(F.broadcast(cust), "user_id", "inner")
    out = run_to_memory(joined, output_mode="append")
    return out.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


def streaming_multibatch_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Session windows computed across MULTIPLE micro-batches: the
    events fixture is staged into 4 time-ordered files and replayed
    with ``maxFilesPerTrigger=1``, so the state store must carry
    per-user open sessions between batches and merge sessions that
    span a file boundary. The function raises unless the run actually
    executed >= 2 non-empty micro-batches — a single-batch pass cannot
    produce a green row, which is what makes this the driver-checkable
    multi-batch proof (vs the single-file queries above, which admit
    one batch). Complete output mode: the final emission is the full
    converged session table, identical to the batch oracle."""
    from fsc_etl_spark.streaming import stage_events_as_files, stream_staged_events

    staged = stage_events_as_files(spark, sf, n_files=4)
    ev = stream_staged_events(spark, staged, max_files_per_trigger=1)
    agg = session_aggregate(ev, aggs=[F.count(F.lit(1)).alias("n")], gap="30 minutes")
    batches: list[int] = []
    out = run_to_memory(agg, output_mode="complete", batch_counts=batches)
    non_empty = [b for b in batches if b > 0]
    if len(non_empty) < 2:
        raise RuntimeError(
            f"expected >=2 non-empty micro-batches, saw {batches!r} — "
            "multi-batch state carry-over was not exercised"
        )
    return out.select("session_start", "session_end", "user_id", "n")


def streaming_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Heavy hitters over a LIVE stream: per-user counts maintained
    incrementally by the streaming aggregation state store across 4
    replayed micro-batches (guarded — raises unless >= 2 non-empty
    batches ran), then the exact φ-threshold (6/(5·U), integer
    rational) applied as a batch query over the final state snapshot —
    the read-side-of-a-live-counts-table shape. End state provably
    equals the batch answer: same oracle as `heavy_hitter_users`.
    """
    from fsc_etl_spark.streaming import stage_events_as_files, stream_staged_events

    staged = stage_events_as_files(spark, sf, n_files=4)
    ev = stream_staged_events(spark, staged, max_files_per_trigger=1)
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    batches: list[int] = []
    snap = run_to_memory(counts, output_mode="complete", batch_counts=batches)
    if len([b for b in batches if b > 0]) < 2:
        raise RuntimeError(
            f"expected >=2 non-empty micro-batches, saw {batches!r}"
        )
    share = snap.agg(
        F.lit(6).cast("long").alias("num"),
        (F.lit(5) * F.count(F.lit(1))).cast("long").alias("den"),
    )
    total = snap.agg(F.sum("cnt").alias("__n"))
    return (
        snap.join(F.broadcast(share))
        .join(F.broadcast(total))
        .filter(F.col("den") * F.col("cnt") >= F.col("num") * F.col("__n"))
        .select("user_id", "cnt")
    )


def streaming_cms_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min sketch maintained by the STREAMING aggregation state
    store: the d·w counter cells update incrementally across 4
    replayed micro-batches (guarded — raises unless >= 2 non-empty
    batches ran), and the final complete-mode snapshot provably
    equals the one-pass batch sketch (count-min is additive, so
    per-batch increments commute) — the live-sketch-table shape a
    100 TB event firehose feeds, with bounded state (256 cells) no
    matter the input rate. Same oracle as the batch merge twin.
    """
    from fsc_etl_spark.operators.sketches import cms_build
    from fsc_etl_spark.streaming import stage_events_as_files, stream_staged_events

    staged = stage_events_as_files(spark, sf, n_files=4)
    ev = stream_staged_events(spark, staged, max_files_per_trigger=1)
    counters = cms_build(ev.select("user_id"), "user_id")
    batches: list[int] = []
    snap = run_to_memory(counters, output_mode="complete", batch_counts=batches)
    if len([b for b in batches if b > 0]) < 2:
        raise RuntimeError(
            f"expected >=2 non-empty micro-batches, saw {batches!r}"
        )
    return snap.select("j", "b", "total")


def streaming_hll_registers(spark: SparkSession, sf: str) -> DataFrame:
    """HyperLogLog register file maintained by the streaming state
    store: per-bucket MAX rank updates incrementally across >= 2
    replayed micro-batches (guarded), final complete-mode snapshot ==
    the one-pass batch sketch — max is idempotent/commutative, so
    batch boundaries cannot change the registers. With
    streaming_cms_counts this covers both sketch merge monoids (sum
    and max) under streaming state; state is bounded at 64 cells.
    """
    from fsc_etl_spark.operators.sketches import hll_registers
    from fsc_etl_spark.streaming import stage_events_as_files, stream_staged_events

    staged = stage_events_as_files(spark, sf, n_files=4)
    ev = stream_staged_events(spark, staged, max_files_per_trigger=1)
    regs = hll_registers(ev.select("user_id"), "user_id")
    batches: list[int] = []
    snap = run_to_memory(regs, output_mode="complete", batch_counts=batches)
    if len([b for b in batches if b > 0]) < 2:
        raise RuntimeError(
            f"expected >=2 non-empty micro-batches, saw {batches!r}"
        )
    return snap.select("bucket", "register")


def streaming_blocklist_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """STREAM-STATIC ANTI JOIN: incoming documents are dropped when
    their content fingerprint matches a static blocklist (the
    benchmark/eval fingerprints, ``doc_id % 97 == 0`` standing in) —
    the decontamination-at-ingest shape every training pipeline runs
    before documents ever land. The static side broadcasts; each
    micro-batch is a map-side anti join with zero streaming state.
    Survivor counts roll up per source."""
    from fsc_etl_spark.functions.text import fingerprint_md5
    from fsc_etl_spark.sources.readers import read_parquet_table
    from fsc_etl_spark.streaming import stream_documents

    blocklist = (
        read_parquet_table(spark, sf, "documents")
        .filter(F.col("doc_id") % 97 == 0)
        .select(fingerprint_md5(F.col("text")).alias("fp"))
        .distinct()
    )
    docs = stream_documents(spark, sf).withColumn(
        "fp", fingerprint_md5(F.col("text"))
    )
    fresh = docs.join(F.broadcast(blocklist), "fp", "left_anti")
    out = run_to_memory(fresh, output_mode="append")
    return out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


def streaming_dsir_gate(spark: SparkSession, sf: str) -> DataFrame:
    """STREAM-STATIC data selection at ingest: every incoming document
    scores its DSIR importance weight against FROZEN reference
    distributions — the 64-bucket target/raw n-gram counts of the
    existing corpus, quantized once to micro-nat scores and BROADCAST
    (the production shape: the reference distribution is built
    offline, the gate runs on the ingest stream). Gram hashing is
    stateless map-side work per micro-batch; the only streaming state
    is the doc-keyed running (count, sum) aggregation. Converged
    output == the batch dsir_importance_weights row shape exactly, so
    the batch hash oracle applies verbatim."""
    from fsc_etl_spark.plans.training_data import (
        dsir_bucket_scores,
        dsir_gram_buckets,
        dsir_per_doc_scores,
    )
    from fsc_etl_spark.sources.readers import read_parquet_table
    from fsc_etl_spark.streaming import stream_documents

    static_docs = read_parquet_table(spark, sf, "documents").select(
        "doc_id", "lang", "text"
    )
    scores = dsir_bucket_scores(static_docs)
    stream = stream_documents(spark, sf).select("doc_id", "lang", "text")
    per_doc = dsir_per_doc_scores(dsir_gram_buckets(stream), scores)
    converged = run_to_memory(per_doc, output_mode="complete")
    return (
        static_docs.select("doc_id", "lang")
        .join(converged, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint").alias("n_grams"),
            F.coalesce(F.col("dsir_score_e6"), F.lit(0))
            .cast("bigint")
            .alias("dsir_score_e6"),
            (F.coalesce(F.col("dsir_score_e6"), F.lit(0)) >= 0).alias("kept"),
        )
    )


def streaming_quality_gate(spark: SparkSession, sf: str) -> DataFrame:
    """STREAM-STATIC corpus-health gate at ingest: every incoming
    document evaluates the Gopher rule set (stateless, map-side —
    gopher_rule_columns is pure per-row expressions) and the stream
    maintains ONE bounded aggregate: per-source document/pass counts —
    the live dashboard row an ingest pipeline watches to catch a
    poisoned or degraded source before it pollutes the corpus.
    Streaming state is |sources| rows; converged complete-mode output
    == the batch per-source rollup, so the oracle is the batch SQL.
    Integer-exact (counts + ppm div), no float anywhere."""
    from fsc_etl_spark.plans.retrieval_quality import gopher_rule_columns
    from fsc_etl_spark.streaming import stream_documents

    _, flags = gopher_rule_columns()
    pass_all = None
    for c in flags.values():
        pass_all = c if pass_all is None else (pass_all & c)
    stream = stream_documents(spark, sf).select(
        "source", pass_all.cast("int").alias("p")
    )
    agg = stream.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("p").cast("bigint").alias("n_pass"),
    )
    converged = run_to_memory(agg, output_mode="complete")
    return converged.select(
        "source",
        "n_docs",
        "n_pass",
        F.expr("(1000000 * n_pass) div n_docs").alias("pass_ppm"),
    )


def streaming_ppl_gate(spark: SparkSession, sf: str) -> DataFrame:
    """STREAM-STATIC LM quality gate at ingest: every incoming
    document scores its bigram-LM negative log-likelihood against a
    FROZEN model — the add-one bigram scores trained offline on the
    existing corpus's en slice (the production CCNet shape: the LM is
    trained once, the perplexity gate runs on the ingest stream).
    Gram explode is stateless map-side work per micro-batch; the
    model frames are static join sides; the only streaming state is
    the doc-keyed running (count, sum). Converged output == the batch
    bigram_lm_perplexity rows exactly, so the batch hash oracle
    applies verbatim."""
    from fsc_etl_spark.plans.corpus_stats import (
        lm_final_shape,
        lm_grams,
        lm_model_frames,
        lm_per_doc,
    )
    from fsc_etl_spark.sources.readers import read_parquet_table
    from fsc_etl_spark.streaming import stream_documents

    static_docs = read_parquet_table(spark, sf, "documents").select(
        "doc_id", "lang", "text"
    )
    mscore, hscore, s0 = lm_model_frames(static_docs)
    stream = stream_documents(spark, sf).select("doc_id", "text")
    per_doc = lm_per_doc(lm_grams(stream), mscore, hscore, s0)
    converged = run_to_memory(per_doc, output_mode="complete")
    return lm_final_shape(static_docs, converged)


def segment_dedup_batch_handler(
    spark: SparkSession,
    state_dir: str,
    results_dir: str,
    batch_sizes: list[int],
    crash_hook=None,
):
    """foreachBatch handler for incremental segment dedup with
    EXACTLY-ONCE per-epoch semantics (VERDICT r8 #10): every write is
    keyed by ``batch_id`` and mode=overwrite, and the seen-hash read
    filters to ``epoch < batch_id`` — so a replay of an epoch after a
    crash that landed BETWEEN the side-effect writes and the
    checkpoint commit (the classic at-least-once window) overwrites
    its own partial output and never sees its own hashes as history.
    A plain ``mode("append")`` state/result write would double-count
    on exactly that replay. ``crash_hook(batch_id, phase)`` (phases
    "pre"/"post") lets the recovery test inject a crash on either
    side of the side effects."""
    from fsc_etl_spark.plans.training_data import segment_hashes

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()
        batch_sizes.append(n)
        if n == 0:
            return
        if crash_hook is not None:
            crash_hook(batch_id, "pre")
        w = Window.partitionBy("seg_hash").orderBy("doc_id", "seg_idx")
        seen = (
            spark.read.schema("seg_hash string, epoch long")
            .parquet(f"{state_dir}/*")
            .filter(F.col("epoch") < batch_id)
            .select("seg_hash")
        )
        segs = (
            segment_hashes(batch_df)
            .withColumn("first_in_batch", F.row_number().over(w) == 1)
            .join(seen.withColumn("in_hist", F.lit(True)), "seg_hash", "left")
            .withColumn(
                "keep", F.col("first_in_batch") & F.col("in_hist").isNull()
            )
            .localCheckpoint()  # writes must not re-read `seen` after the state dir grows
        )
        (
            segs.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_segments"),
                F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
            )
            .write.mode("overwrite")
            .parquet(f"{results_dir}/b{batch_id}")
        )
        (
            segs.filter("keep")
            .select("seg_hash")
            .distinct()
            .withColumn("epoch", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .parquet(f"{state_dir}/b{batch_id}")
        )
        if crash_hook is not None:
            crash_hook(batch_id, "post")

    return handle


def init_segment_dedup_dirs(spark: SparkSession) -> tuple[str, str]:
    """Create the (state, results) layout for the per-epoch handler:
    one empty epoch=-1 seed so the state glob always matches."""
    import tempfile

    base = tempfile.mkdtemp(prefix="fsc_segdedup_")
    state_dir, results_dir = f"{base}/seen", f"{base}/out"
    spark.createDataFrame([], "seg_hash string, epoch long").write.parquet(
        f"{state_dir}/init"
    )
    return state_dir, results_dir


def read_segment_dedup_results(spark: SparkSession, results_dir: str) -> DataFrame:
    return spark.read.schema(
        "doc_id bigint, n_segments bigint, n_kept bigint"
    ).parquet(f"{results_dir}/*")


def streaming_segment_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """INCREMENTAL sub-document dedup against historical state — the
    production shape for continuous corpus ingestion: documents arrive
    over 4 doc_id-ordered micro-batches; each batch's segments dedup
    (a) within the batch by keep-first (doc_id, seg_idx) and (b)
    against the accumulated seen-hash table from all prior batches,
    via foreachBatch with a parquet state dir. Exactly-once per epoch
    is REAL, not assumed: all writes are batch_id-keyed overwrites and
    history reads filter epoch < batch_id (see
    segment_dedup_batch_handler), proven by the checkpoint-restart
    test tests/test_streaming.py::test_segment_dedup_crash_recovery.
    Because arrival order == doc_id order, the converged per-doc keep
    counts equal the batch `segment_dedup_mask` oracle exactly.
    Raises unless >= 2 non-empty micro-batches actually ran."""
    from fsc_etl_spark.streaming.pipeline import run_foreach_batch
    from fsc_etl_spark.streaming.sources import (
        stage_documents_as_files,
        stream_parquet_dir,
    )

    staged = stage_documents_as_files(spark, sf, n_files=4)
    docs = stream_parquet_dir(
        spark, staged, schemas.DOCUMENTS, max_files_per_trigger=1
    ).select("doc_id", "text")

    state_dir, results_dir = init_segment_dedup_dirs(spark)
    batch_sizes: list[int] = []
    handle = segment_dedup_batch_handler(spark, state_dir, results_dir, batch_sizes)

    run_foreach_batch(docs, handle, output_mode="append")
    if len([b for b in batch_sizes if b > 0]) < 2:
        raise RuntimeError(
            f"expected >=2 non-empty micro-batches, saw {batch_sizes!r}"
        )
    return read_segment_dedup_results(spark, results_dir)


def streaming_media_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """STREAMING multimodal ingest: real P6 image files on disk tailed
    by the ``binaryFile`` stream source (one row per newly listed
    file), replayed as multiple micro-batches via maxFilesPerTrigger —
    the watch-a-media-drop-prefix shape. Each file's identity is
    verified byte-exactly downstream (id from filename, length, md5),
    sharing binary_file_ingest's oracle. Raises unless >= 2 non-empty
    micro-batches ran."""
    import os
    import tempfile

    from fsc_etl_spark.operators.multimodal import documents_as_ppm_media
    from fsc_etl_spark.plans.training_data import t
    from fsc_etl_spark.streaming.pipeline import run_to_memory

    media = documents_as_ppm_media(
        t(spark, sf, "documents").filter(F.col("doc_id") < 200), width=12, height=8
    )
    d = tempfile.mkdtemp(prefix="fsc_stream_media_")
    for r in media.select("media_id", "content").collect():
        with open(os.path.join(d, f"doc_{r['media_id']}.ppm"), "wb") as f:
            f.write(bytes(r["content"]))
    stream = (
        spark.readStream.format("binaryFile")
        # streaming sources are schema-first; binaryFile's is fixed
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("pathGlobFilter", "*.ppm")
        .option("maxFilesPerTrigger", "64")
        .load(d)
    )
    rows = stream.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.ppm$", 1)
        .cast("bigint")
        .alias("media_id"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )
    batches: list[int] = []
    out = run_to_memory(rows, output_mode="append", batch_counts=batches)
    if len([b for b in batches if b > 0]) < 2:
        raise RuntimeError(f"expected >=2 non-empty micro-batches, saw {batches!r}")
    return out


def mg_batch_handler(
    spark: SparkSession,
    state_dir: str,
    batch_sizes: list[int],
    k: int,
    crash_hook=None,
):
    """foreachBatch handler maintaining a Misra–Gries frequent-tokens
    summary incrementally: per epoch, the batch's own two-level shard
    summary (operators/sketches.mg_frequent — so the batch-vocab
    prune is shard-partitioned, never a corpus-vocab global window)
    sum-merges with the <= k-row prior summary and prunes once more
    (mergeable-summaries fold; cumulative undercount stays <=
    n/(k+1) for any merge tree). EXACTLY-ONCE per epoch, the
    segment_dedup_batch_handler mechanics: the full new summary is
    written batch_id-keyed with mode=overwrite and the prior read
    filters epoch < batch_id, then takes the LATEST epoch — an epoch
    replay after a crash in the at-least-once window overwrites its
    own partial summary and re-reads the same predecessor.
    ``crash_hook(batch_id, phase)`` mirrors the dedup handler's
    injection points."""
    from fsc_etl_spark.functions.text import tokens
    from fsc_etl_spark.operators.sketches import mg_frequent, mg_prune

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()
        batch_sizes.append(n)
        if n == 0:
            return
        if crash_hook is not None:
            crash_hook(batch_id, "pre")
        prior = (
            spark.read.schema("tok string, cnt long, epoch long")
            .parquet(f"{state_dir}/*")
            .filter(F.col("epoch") < batch_id)
            .localCheckpoint()  # writes must not re-list the state dir
        )
        latest = prior.agg(F.max("epoch").alias("e")).first()["e"]
        prior_summ = (
            prior.filter(F.col("epoch") == latest).select("tok", "cnt")
            if latest is not None
            else spark.createDataFrame([], "tok string, cnt long")
        )
        batch_summ = mg_frequent(
            batch_df.select(
                "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
            ),
            "tok",
            k,
            shard_col="doc_id",
        ).select("tok", F.col("mg_est").alias("cnt"))
        merged = (
            prior_summ.unionByName(batch_summ)
            .groupBy("tok")
            .agg(F.sum("cnt").alias("cnt"))
        )
        (
            mg_prune(merged, k, key_col="tok")
            .withColumn("epoch", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .parquet(f"{state_dir}/b{batch_id}")
        )
        if crash_hook is not None:
            crash_hook(batch_id, "post")

    return handle


def init_mg_state_dir(spark: SparkSession) -> str:
    """Empty epoch=-1 seed so the state glob always matches."""
    state_dir = f"{tempfile.mkdtemp(prefix='fsc_mgstream_')}/summ"
    spark.createDataFrame([], "tok string, cnt long, epoch long").write.parquet(
        f"{state_dir}/init"
    )
    return state_dir


def streaming_mg_heavy_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Misra–Gries frequent tokens over a LIVE corpus stream: the
    <= k-row summary folds forward across 4 doc_id-ordered
    micro-batches (mg_batch_handler — per-epoch merge+prune with
    exactly-once batch_id-keyed state), the bounded-state streaming
    heavy-hitters a 100 TB token firehose actually supports (the
    exact streaming_heavy_hitters keeps per-key state; this keeps k
    counters, period). The left-fold merge tree differs from the
    batch query's one-shot shard merge, so the estimates differ —
    but both satisfy the same n/(k+1) undercount bound, and because
    batch composition (doc_id ranges) and every prune are
    deterministic, the fold REPLAYS exactly in SQL: the oracle
    unrolls batch-summary → merge → prune per epoch. Final summary
    joins corpus-exact counts with the bound booleans, the
    mg_frequent_tokens schema. Raises unless >= 2 non-empty batches
    ran."""
    from fsc_etl_spark.functions.text import tokens
    from fsc_etl_spark.plans.corpus_stats import MG_K
    from fsc_etl_spark.sources.readers import read_parquet_table
    from fsc_etl_spark.streaming.pipeline import run_foreach_batch
    from fsc_etl_spark.streaming.sources import (
        stage_documents_as_files,
        stream_parquet_dir,
    )

    staged = stage_documents_as_files(spark, sf, n_files=4)
    docs = stream_parquet_dir(
        spark, staged, schemas.DOCUMENTS, max_files_per_trigger=1
    ).select("doc_id", "text")
    state_dir = init_mg_state_dir(spark)
    batch_sizes: list[int] = []
    run_foreach_batch(
        docs, mg_batch_handler(spark, state_dir, batch_sizes, MG_K),
        output_mode="append",
    )
    if len([b for b in batch_sizes if b > 0]) < 2:
        raise RuntimeError(
            f"expected >=2 non-empty micro-batches, saw {batch_sizes!r}"
        )
    state = spark.read.schema("tok string, cnt long, epoch long").parquet(
        f"{state_dir}/*"
    )
    last = state.agg(F.max("epoch").alias("e")).first()["e"]
    summ = state.filter(F.col("epoch") == last).select(
        "tok", F.col("cnt").alias("mg_est")
    )
    tok = read_parquet_table(spark, sf, "documents").select(
        F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    )
    exact = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_cnt"))
    n = tok.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        summ.join(exact, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "tok",
            F.col("mg_est").cast("bigint").alias("mg_est"),
            F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
            (F.col("exact_cnt") - F.col("mg_est"))
            .cast("bigint")
            .alias("undercount"),
            (
                (F.col("exact_cnt") - F.col("mg_est")) * (MG_K + 1)
                <= F.col("n_total")
            ).alias("within_bound"),
        )
    )


def streaming_priority_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Priority sampling over a LIVE corpus stream (round 13 — the
    streaming fold of weighted_priority_sample): top-k-by-priority is
    a MERGE MONOID — top_k(A ∪ B) = top_k(top_k(A) ∪ top_k(B)) — so
    the stream keeps exactly k rows of state per epoch: each
    micro-batch computes its own top-50 (the shared priority_scores
    projection), merges with the ≤ 50-row prior summary, re-takes the
    top-50 by the same (priority DESC, doc_id) total order, and
    writes batch_id-keyed with mode=overwrite (the mg_batch_handler
    exactly-once mechanics: an epoch replay overwrites its own
    partial state and re-reads the same predecessor). Because the
    fold is order-insensitive — unlike Misra–Gries, whose estimates
    depend on the merge tree — the converged sample is IDENTICAL to
    the batch draw, and the batch hash oracle applies verbatim.

    Scale shape: per epoch one map-side projection + a 50-row
    TakeOrdered on the batch + a 100-row driver-side re-rank; state
    is k rows, period — the bounded-state sampling a 100 TB ingest
    firehose actually supports. Raises unless >= 2 non-empty
    micro-batches ran (the mg discipline: a single batch would not
    exercise the fold).
    """
    from fsc_etl_spark.plans.training_data import _PRIORITY_K, priority_scores
    from fsc_etl_spark.streaming.pipeline import run_foreach_batch
    from fsc_etl_spark.streaming.sources import (
        stage_documents_as_files,
        stream_parquet_dir,
    )

    staged = stage_documents_as_files(spark, sf, n_files=4)
    docs = stream_parquet_dir(
        spark, staged, schemas.DOCUMENTS, max_files_per_trigger=1
    ).select("doc_id", "text")
    state_schema = "doc_id long, n_tokens long, priority long, epoch long"
    state_dir = f"{tempfile.mkdtemp(prefix='fsc_priostream_')}/summ"
    spark.createDataFrame([], state_schema).write.parquet(f"{state_dir}/init")
    batch_sizes: list[int] = []

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()
        batch_sizes.append(n)
        if n == 0:
            return
        prior = (
            spark.read.schema(state_schema)
            .parquet(f"{state_dir}/*")
            .filter(F.col("epoch") < batch_id)
            .localCheckpoint()  # writes must not re-list the state dir
        )
        latest = prior.agg(F.max("epoch").alias("e")).first()["e"]
        prior_summ = (
            prior.filter(F.col("epoch") == latest).drop("epoch")
            if latest is not None
            else spark.createDataFrame(
                [], "doc_id long, n_tokens long, priority long"
            )
        )
        batch_summ = (
            priority_scores(batch_df)
            .orderBy(F.col("priority").desc(), F.col("doc_id").asc())
            .limit(_PRIORITY_K)
        )
        (
            prior_summ.unionByName(batch_summ)
            .orderBy(F.col("priority").desc(), F.col("doc_id").asc())
            .limit(_PRIORITY_K)
            .withColumn("epoch", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .parquet(f"{state_dir}/b{batch_id}")
        )

    run_foreach_batch(docs, handle, output_mode="append")
    if len([b for b in batch_sizes if b > 0]) < 2:
        raise RuntimeError(
            f"expected >=2 non-empty micro-batches, saw {batch_sizes!r}"
        )
    state = spark.read.schema(state_schema).parquet(f"{state_dir}/*")
    last = state.agg(F.max("epoch").alias("e")).first()["e"]
    return (
        state.filter(F.col("epoch") == last)
        .select("doc_id", "n_tokens", "priority")
        .orderBy(F.col("priority").desc(), F.col("doc_id").asc())
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "streaming_multibatch_sessionize": streaming_multibatch_sessionize,
    "streaming_priority_sample": streaming_priority_sample,
    "streaming_mg_heavy_tokens": streaming_mg_heavy_tokens,
    "streaming_hourly_rollup": streaming_hourly_rollup,
    "streaming_click_purchase_join": streaming_click_purchase_join,
    "streaming_sessionize": streaming_sessionize,
    "streaming_user_state": streaming_user_state,
    "streaming_upsert_latest": streaming_upsert_latest,
    "streaming_dedup_events": streaming_dedup_events,
    "streaming_enrich_dim": streaming_enrich_dim,
    "streaming_blocklist_dedup": streaming_blocklist_dedup,
    "streaming_heavy_hitters": streaming_heavy_hitters,
    "streaming_segment_dedup": streaming_segment_dedup,
    "streaming_media_ingest": streaming_media_ingest,
    "streaming_cms_counts": streaming_cms_counts,
    "streaming_hll_registers": streaming_hll_registers,
    "streaming_dsir_gate": streaming_dsir_gate,
    "streaming_quality_gate": streaming_quality_gate,
    "streaming_ppl_gate": streaming_ppl_gate,
}


STREAMING_ORACLES: dict[str, str] = {}

STREAMING_ORACLES["streaming_hourly_rollup"] = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""

# Session boundary semantics: Spark's session_window is half-open
# [start, last+gap), so an event exactly `gap` after its predecessor
# opens a NEW session — hence `>=` in the gap test below.
STREAMING_ORACLES["streaming_sessionize"] = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS newflag
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
  SELECT user_id, ts,
         SUM(newflag) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM g
)
SELECT CAST(MIN(ts) AS TIMESTAMP) AS session_start,
       CAST(MAX(ts) + INTERVAL 30 MINUTE AS TIMESTAMP) AS session_end,
       user_id, COUNT(*) AS n
FROM s GROUP BY user_id, sid
"""

# Same oracle as streaming_sessionize — the multi-batch replay must
# converge to the identical session table.
STREAMING_ORACLES["streaming_multibatch_sessionize"] = STREAMING_ORACLES[
    "streaming_sessionize"
]

STREAMING_ORACLES["streaming_click_purchase_join"] = """
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 30 MINUTE
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
"""

STREAMING_ORACLES["streaming_user_state"] = """
SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value
FROM events GROUP BY user_id
"""

STREAMING_ORACLES["streaming_upsert_latest"] = """
SELECT user_id, event_id, ts, value FROM (
  SELECT user_id, event_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""

STREAMING_ORACLES["streaming_dedup_events"] = """
SELECT event_id, user_id, value
FROM events
"""

STREAMING_ORACLES["streaming_enrich_dim"] = """
SELECT c_mktsegment,
       COUNT(*) AS n,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1
"""

STREAMING_ORACLES["streaming_blocklist_dedup"] = """
WITH bfp AS (
  SELECT DISTINCT md5(lower(trim(text))) AS fp FROM documents WHERE doc_id % 97 = 0
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents d
WHERE md5(lower(trim(d.text))) NOT IN (SELECT fp FROM bfp)
GROUP BY source
"""

# End state of the streaming counts == batch counts, so the streaming
# heavy-hitter snapshot shares the batch query's oracle exactly.
STREAMING_ORACLES["streaming_heavy_hitters"] = """
WITH s AS (
  SELECT CAST(6 AS BIGINT) AS num,
         CAST(5 * COUNT(DISTINCT user_id) AS BIGINT) AS den
  FROM events
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events),
c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id
)
SELECT c.user_id, c.cnt
FROM c, s, tot
WHERE s.den * c.cnt >= s.num * tot.n
"""

# Converged incremental dedup state == the batch keep-first answer
# (arrival order is doc_id order by construction of the staged files).
STREAMING_ORACLES["streaming_segment_dedup"] = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS tk
  FROM documents
),
segs AS (
  SELECT doc_id, seg_idx,
         md5(array_to_string(list_slice(tk, seg_idx * 16 + 1, seg_idx * 16 + 16), ' '))
           AS seg_hash
  FROM (SELECT doc_id, tk,
               unnest(range(CAST(ceil(len(tk) / 16.0) AS BIGINT))) AS seg_idx
        FROM toks)
),
kept AS (
  SELECT doc_id, seg_idx,
         (ROW_NUMBER() OVER (PARTITION BY seg_hash ORDER BY doc_id, seg_idx) = 1) AS keep
  FROM segs
)
SELECT doc_id,
       COUNT(*) AS n_segments,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM kept GROUP BY doc_id
"""

# Same byte-exact identity oracle as the batch binary_file_ingest.
STREAMING_ORACLES["streaming_media_ingest"] = """
SELECT doc_id AS media_id,
       CAST(300 AS BIGINT) AS n_bytes,
       md5('P6' || chr(10) || '12 8' || chr(10) || '255' || chr(10) ||
           substring(repeat(text, CAST(ceil(288.0 / GREATEST(length(text), 1)) AS BIGINT)),
                     1, 288)) AS content_md5
FROM documents WHERE doc_id < 200
"""

# Same single-pass counter oracle as the batch cms_merge_halves twin
# (count-min additivity: per-batch streaming increments == one pass).
from fsc_etl_spark.operators.sketches import CMS_DEPTH as _CMS_D
from fsc_etl_spark.operators.sketches import CMS_WIDTH as _CMS_W

STREAMING_ORACLES["streaming_cms_counts"] = f"""
WITH c AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY user_id
),
probe AS (
  SELECT c.cnt, j.j,
         ('0x' || substr(md5(
            'cms' || CAST(j.j AS VARCHAR) || ':' || CAST(c.user_id AS VARCHAR)
          ), 1, 15))::BIGINT % {_CMS_W} AS b
  FROM c CROSS JOIN (SELECT unnest(range({_CMS_D})) AS j) j
)
SELECT j, b, CAST(SUM(cnt) AS BIGINT) AS total FROM probe GROUP BY j, b
"""

# Same single-pass register oracle as the batch hll_register_build
# (max-merge idempotence: per-batch streaming maxes == one pass).
from fsc_etl_spark.operators.sketches import HLL_BUCKETS as _HLL_B
from fsc_etl_spark.operators.sketches import HLL_RANK_BITS as _HLL_R

STREAMING_ORACLES["streaming_hll_registers"] = f"""
WITH h AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hh
  FROM events
),
f AS (SELECT hh % {_HLL_B} AS bucket, hh // {_HLL_B} AS v FROM h)
SELECT bucket,
       CAST(MAX(CASE WHEN v = 0 THEN {_HLL_R + 1}
                     ELSE {_HLL_R} - length(bin(v)) + 1 END) AS BIGINT)
         AS register
FROM f GROUP BY bucket
"""

# Converged stream-static DSIR gate == the batch DSIR row shape
# exactly (single micro-batch at this fixture; the scores side is the
# SAME frozen reference both paths), so the batch oracle is reused
# verbatim.
from fsc_etl_spark.plans.oracles_training import TRAINING_ORACLES as _T

STREAMING_ORACLES["streaming_dsir_gate"] = _T["dsir_importance_weights"]

# Top-k-by-priority is a merge monoid, so the converged streaming fold
# equals the batch draw EXACTLY — the batch oracle applies verbatim.
STREAMING_ORACLES["streaming_priority_sample"] = _T["weighted_priority_sample"]

# Converged stream-static Gopher gate == the batch per-source rollup
# (complete-mode groupBy over the full fixture = one logical pass).
# Rules recomposed here from Rae et al. 2021 §A1.1 (independent of
# the per-doc gopher_quality_flags oracle text).
STREAMING_ORACLES["streaming_quality_gate"] = """
WITH base AS (
  SELECT source,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS tk
  FROM documents
),
m AS (
  SELECT source,
         CAST(len(tk) AS BIGINT) AS w,
         CAST(COALESCE(list_sum(list_transform(tk, x -> length(x))), 0) AS BIGINT) AS c,
         CAST(len(list_filter(tk, x -> contains(x, '#')
                                     OR contains(x, '...'))) AS BIGINT) AS sym,
         CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS alpha,
         CAST(len(list_intersect(tk, ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stp
  FROM base
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN w >= 50 AND w <= 100000
                      AND 3 * w <= c AND c <= 10 * w
                      AND 10 * sym <= w
                      AND 5 * alpha >= 4 * w
                      AND stp >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST((1000000 * SUM(CASE WHEN w >= 50 AND w <= 100000
                      AND 3 * w <= c AND c <= 10 * w
                      AND 10 * sym <= w
                      AND 5 * alpha >= 4 * w
                      AND stp >= 2 THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT) AS pass_ppm
FROM m GROUP BY source
"""

# Stream-static LM gate: converged state == the batch rows, so the
# batch oracle applies verbatim (the streaming_dsir_gate pattern).
from fsc_etl_spark.plans.corpus_stats import CORPUS_ORACLES as _C  # noqa: E402

STREAMING_ORACLES["streaming_ppl_gate"] = _C["bigram_lm_perplexity"]


def _streaming_mg_oracle(n_batches: int = 4) -> str:
    """Unrolled left-fold replay of mg_batch_handler: per epoch the
    batch's two-level shard summary (the mg_frequent_tokens oracle
    block over that doc_id range), sum-merged with the prior epoch's
    summary and pruned once more. Batch membership replays the
    staging rule exactly: (doc_id - lo) // step with
    step = (hi - lo) // n + 1. Every prune is the value-based
    subtract-(k+1)th under (cnt DESC, tok ASC) — deterministic, so
    the fold is a pure function of the fixture."""
    from fsc_etl_spark.plans.corpus_stats import _LT, MG_K

    kp1 = MG_K + 1
    chain = [
        """bounds AS (
  SELECT MIN(doc_id) AS lo,
         (MAX(doc_id) - MIN(doc_id)) // %d + 1 AS step
  FROM documents
)"""
        % n_batches,
        f"""alltok AS MATERIALIZED (
  SELECT d.doc_id, (d.doc_id - b.lo) // b.step AS batch, unnest({_LT}) AS tok
  FROM documents d, bounds b
)""",
    ]
    prev = None
    for i in range(n_batches):
        chain.append(
            f"""pc{i} AS (
  SELECT CAST(('0x' || substr(md5('mg:' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 16 AS shard,
         tok, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM alltok WHERE batch = {i} GROUP BY shard, tok
)"""
        )
        chain.append(
            f"""pt{i} AS (
  SELECT shard, cnt AS t FROM (
    SELECT shard, cnt,
           ROW_NUMBER() OVER (PARTITION BY shard
                              ORDER BY cnt DESC, tok ASC) AS rn
    FROM pc{i}
  ) WHERE rn = {kp1}
)"""
        )
        chain.append(
            f"""bs{i} AS (
  SELECT tok, CAST(SUM(est) AS BIGINT) AS cnt FROM (
    SELECT pc{i}.tok, pc{i}.cnt - COALESCE(pt{i}.t, 0) AS est
    FROM pc{i} LEFT JOIN pt{i} USING (shard)
    WHERE pc{i}.cnt - COALESCE(pt{i}.t, 0) > 0
  ) GROUP BY tok
)"""
        )
        chain.append(
            f"""bgt{i} AS (
  SELECT cnt AS t FROM (
    SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) AS rn
    FROM bs{i}
  ) WHERE rn = {kp1}
)"""
        )
        chain.append(
            f"""bsum{i} AS (
  SELECT tok, cnt - COALESCE((SELECT t FROM bgt{i}), 0) AS cnt
  FROM bs{i}
  WHERE cnt - COALESCE((SELECT t FROM bgt{i}), 0) > 0
)"""
        )
        if prev is None:
            chain.append(f"s{i} AS (SELECT tok, cnt FROM bsum{i})")
        else:
            chain.append(
                f"""mg{i} AS (
  SELECT tok, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
    SELECT tok, cnt FROM {prev} UNION ALL SELECT tok, cnt FROM bsum{i}
  ) GROUP BY tok
)"""
            )
            chain.append(
                f"""gt{i} AS (
  SELECT cnt AS t FROM (
    SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) AS rn
    FROM mg{i}
  ) WHERE rn = {kp1}
)"""
            )
            chain.append(
                f"""s{i} AS (
  SELECT tok, cnt - COALESCE((SELECT t FROM gt{i}), 0) AS cnt
  FROM mg{i}
  WHERE cnt - COALESCE((SELECT t FROM gt{i}), 0) > 0
)"""
            )
        prev = f"s{i}"
    chain.append(
        "exact AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_cnt"
        " FROM alltok GROUP BY tok)"
    )
    chain.append(
        "ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM alltok)"
    )
    return (
        "WITH "
        + ",\n".join(chain)
        + f"""
SELECT s.tok,
       CAST(s.cnt AS BIGINT) AS mg_est,
       e.exact_cnt,
       CAST(e.exact_cnt - s.cnt AS BIGINT) AS undercount,
       ((e.exact_cnt - s.cnt) * {kp1} <= ntot.n_total) AS within_bound
FROM {prev} s JOIN exact e USING (tok) CROSS JOIN ntot"""
    )


STREAMING_ORACLES["streaming_mg_heavy_tokens"] = _streaming_mg_oracle()
