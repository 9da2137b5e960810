"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship scan-agg (TPC-H Q1 shape) at
sf0.001. ``queries()`` exposes every implemented operator from
SURVEY.md §2 / §2.12 as (spark, sf_dir) -> DataFrame callables;
``oracle_sql()`` gives each one's DuckDB-runnable ANSI-SQL twin with
identical column names and final types (see plans/oracles.py for the
determinism rules: exact-decimal accumulation, explicit casts,
tie-broken orderings).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fsc_etl_spark.plans import (
    analytics,
    analytics_ext,
    analytics_more,
    graph_ops,
    incremental,
    scale_ops,
    spark4_ops,
    streaming_queries,
    tpch_more,
    tpch_partsupp,
    training_data,
)
from fsc_etl_spark.plans.analytics_ext import EXT_ORACLES
from fsc_etl_spark.plans.analytics_more import MORE_ORACLES
from fsc_etl_spark.plans.oracles import ORACLES
from fsc_etl_spark.plans.oracles_training import TRAINING_ORACLES
from fsc_etl_spark.plans.streaming_queries import STREAMING_ORACLES
from fsc_etl_spark.plans.tpch_more import TPCH_ORACLES
from fsc_etl_spark.plans.tpch_partsupp import PARTSUPP_ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return analytics.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.12.

    Ordered so a prefix sample covers the whole surface: the driver
    checks roughly the first 50 entries. ROUND-3 ROTATION (VERDICT r2
    item 1): the prefix is exactly the 46 queries that had no driver
    CORRECTNESS row after rounds 1+2 (r1 ∪ r2 sample = 97 of 143),
    plus this round's 3 new queries and the re-predicated
    q9_product_profit — 50 slots. The other queries changed this round
    (q22_idle_customers, surrogate_key_assign, heavy_hitter_users,
    array_funcs_breadth) sit at 51-54 in case the driver samples
    deeper; all are green in the local sf0.001/sf0.01 mirror either
    way. After r3's CORRECTNESS lands every query in the repo will
    have at least one driver-green row (except the 3 rows-only-by-
    design ANN/sketch entries, which the driver records as weaker
    rows-only checks). Keep tests/test_entry_contract.py's prefix-pin
    test in sync with this list.

    ROUND-4 ROTATION NOTE: after round 3's CORRECTNESS lands, put the
    10 round-3 additions that had no prefix slot at the head of the
    window — segment_dedup_mask, bigram_lm_quality, audio_clip_stats,
    audio_downsample_stats, streaming_segment_dedup,
    vocab_coverage_stats, udtf_ngram_topk, orc_roundtrip_stats,
    binary_file_ingest, streaming_media_ingest, kmeans_cluster_stats,
    pagerank_copurchase, triangle_count_coparts, bfs_hops_copurchase,
    recursive_ancestor_depth, skyline_orders, value_anomaly_events,
    dpp_pruned_rollup, variant_props_stats,
    sql_scripting_trimmed_mean, lateral_topk_orders,
    xml_roundtrip_stats, session_window_stats, ewma_user_value,
    file_provenance_stats, table_checksum_buckets,
    incremental_join_maintenance, pit_feature_join,
    partition_backfill_rewrite, merge_schema_read,
    k_anonymity_audit, mixture_temperature_sample,
    shuffle_hash_join_stats, pagerank_weighted_copurchase,
    json_roundtrip_stats, nested_roundtrip_stats,
    holt_user_forecast, embed_dim_median_stats,
    value_drift_buckets, inverted_index_stats, pmi_top_bigrams —
    plus anything r3's
    sample left non-green, then backfill with long-green queries. The
    prefix-pin test derives the never-sampled set from the
    CORRECTNESS_r0*.json files automatically; update its
    in_window/next_rotation sets when rotating.
    """
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    merged.update(analytics.QUERIES)
    merged.update(analytics_ext.QUERIES)
    merged.update(analytics_more.QUERIES)
    merged.update(tpch_more.QUERIES)
    merged.update(tpch_partsupp.QUERIES)
    merged.update(training_data.QUERIES)
    merged.update(streaming_queries.QUERIES)
    merged.update(scale_ops.QUERIES)
    merged.update(graph_ops.QUERIES)
    merged.update(spark4_ops.QUERIES)
    merged.update(incremental.QUERIES)

    priority = [
        # --- the 46 never-driver-sampled queries (rounds 1+2) ---
        "multimodal_frame_sample",
        "multimodal_resize",
        "corpus_curation",
        "hash_stratified_sample",
        "token_vocab_topk",
        "mixture_resample_to_min",
        "pack_chunks_by_source",
        "minhash_jaccard_estimate",
        "hash_split_counts",
        "bigram_topk",
        "source_doc_stats",
        "embed_norm_stats",
        "embed_truncate_norms",
        "user_funnel",
        "contamination_overlap",
        "doc_repetition_stats",
        "pii_redact_stats",
        "domain_mix_weights",
        "length_quantile_filter",
        "cluster_canonical_doc",  # star-CC rebase this round
        "tfidf_top_terms",
        "containment_pairs",
        "synth_docs_source",
        "embed_quantize_stats",
        "salted_source_stats",
        "window_frames_breadth",
        "scd2_user_value_history",
        "regex_null_funcs_breadth",
        "sql_direct_q6",
        "stats_moments_breadth",
        "timeseries_gapfill",
        "timeseries_locf",
        "histogram_price_buckets",
        "full_outer_reconcile",
        "event_transition_matrix",
        "event_burst_islands",
        "event_pattern_match",
        "cohort_retention",
        "dq_orders_report",
        "rollup_incremental_merge",
        "hll_daily_users",  # rows-only by design (HLL sketch)
        "user_trend_slope_pandas",
        "embed_lsh_topk",  # rows-only by design (ANN)
        "embed_ivf_topk",  # rows-only by design (ANN)
        "fuzzy_name_match",
        "zorder_key_demo",
        # --- new this round ---
        "decile_bucket_scalable",
        "multimodal_resize_codec",
        "multimodal_frame_decode",
        # --- changed this round: was 0-rows (0=0 oracle), now productive ---
        "q9_product_profit",
        # --- 51+: also changed this round, re-verified locally ---
        "q22_idle_customers",
        "surrogate_key_assign",
        "heavy_hitter_users",
        "array_funcs_breadth",
    ]
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in priority:
        out[name] = merged[name]
    for name, fn in merged.items():
        out.setdefault(name, fn)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry (keys without an
    oracle get the driver's weaker rows-only check)."""
    return {
        **ORACLES,
        **EXT_ORACLES,
        **MORE_ORACLES,
        **TPCH_ORACLES,
        **PARTSUPP_ORACLES,
        **TRAINING_ORACLES,
        **STREAMING_ORACLES,
        **scale_ops.SCALE_ORACLES,
        **graph_ops.GRAPH_ORACLES,
        **spark4_ops.SPARK4_ORACLES,
        **incremental.INCREMENTAL_ORACLES,
    }
