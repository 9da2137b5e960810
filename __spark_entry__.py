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
    corpus_stats,
    graph_ops,
    incremental,
    retrieval_quality,
    scale_ops,
    spark4_ops,
    streaming_queries,
    tpch_more,
    tpch_partsupp,
    training_data,
)
from fsc_etl_spark.plans.corpus_stats import CORPUS_ORACLES
from fsc_etl_spark.plans.retrieval_quality import RETRIEVAL_ORACLES
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
    checks roughly the first 50 entries. ROUND-12 ROTATION (VERDICT
    r11 #1): the window leads with the three queries whose plan or
    checking contract changed this round — `ktruss_coparts` (unroll
    10 -> 16 + oracle convergence-error guard), `basket_pair_support`
    and `graph_adamic_adar` (eager-checkpoint-then-unpersist cache
    lifecycle, ADVICE r11; results unchanged) — then the staleness
    backlog: the 5 r2-vintage rows displaced by the r11 debuts
    (streaming_user_state, text_bpe_tokens, text_quality,
    text_token_stats, user_trend_slope) and 41 of the 47 r3-vintage
    rows in alphabetical order, after the round-12 debut
    (cluster_leakage_split). The alphabetical tail (timeseries_locf,
    token_vocab_topk, user_funnel, user_trend_slope_pandas,
    window_frames_breadth, zorder_key_demo) leads the r13 window —
    after r12 the oldest driver row anywhere is r3-vintage for
    exactly those 6 queries. Keep tests/test_entry_contract.py's
    prefix-pin test in sync: it derives the never-sampled set from
    committed CORRECTNESS_r*.json automatically.
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
    merged.update(retrieval_quality.QUERIES)
    merged.update(corpus_stats.QUERIES)

    priority = [
        # --- plan/oracle changed this round (r12): ktruss unroll
        # 10 -> 16 + oracle convergence-error guard (VERDICT r11 #2 /
        # ADVICE r11); basket + adamic-adar gained the eager-checkpoint-
        # then-unpersist lifecycle (ADVICE r11) — results unchanged,
        # re-verified here anyway ---
        "ktruss_coparts",
        "basket_pair_support",
        "graph_adamic_adar",
        # --- round-12 debut (no driver row yet): leakage-safe
        # cluster-aware train/val/test split with moved/torn audits ---
        "cluster_leakage_split",
        # --- staleness rotation (VERDICT r11 #1): the 5 r2-vintage rows
        # displaced by the r11 debuts ---
        "streaming_user_state",
        "text_bpe_tokens",
        "text_quality",
        "text_token_stats",
        "user_trend_slope",
        # --- staleness rotation: the r3-vintage generation, alphabetical;
        # 41 of 47 fit — the alphabetical tail (timeseries_locf,
        # token_vocab_topk, user_funnel, user_trend_slope_pandas,
        # window_frames_breadth, zorder_key_demo) leads the r13
        # window ---
        "bigram_topk",
        "cluster_canonical_doc",
        "cohort_retention",
        "containment_pairs",
        "contamination_overlap",
        "corpus_curation",
        "decile_bucket_scalable",
        "doc_repetition_stats",
        "domain_mix_weights",
        "dq_orders_report",
        "embed_norm_stats",
        "embed_quantize_stats",
        "embed_truncate_norms",
        "event_burst_islands",
        "event_pattern_match",
        "event_transition_matrix",
        "full_outer_reconcile",
        "fuzzy_name_match",
        "hash_split_counts",
        "hash_stratified_sample",
        "histogram_price_buckets",
        "length_quantile_filter",
        "minhash_jaccard_estimate",
        "mixture_resample_to_min",
        "multimodal_frame_decode",
        "multimodal_frame_sample",
        "multimodal_resize",
        "multimodal_resize_codec",
        "pack_chunks_by_source",
        "pii_redact_stats",
        "q9_product_profit",
        "regex_null_funcs_breadth",
        "rollup_incremental_merge",
        "salted_source_stats",
        "scd2_user_value_history",
        "source_doc_stats",
        "sql_direct_q6",
        "stats_moments_breadth",
        "synth_docs_source",
        "tfidf_top_terms",
        "timeseries_gapfill",
    ]
    # (timeseries_locf, token_vocab_topk, user_funnel,
    # user_trend_slope_pandas, window_frames_breadth and
    # zorder_key_demo — the r3-vintage alphabetical tail that didn't
    # fit — lead the r13 rotation; every other query then has a
    # driver row from r4 or later.)
    if len(priority) != 50:  # contract check — not an assert: survives python -O
        raise ValueError(f"driver window must be exactly 50, got {len(priority)}")
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in priority:
        out[name] = merged[name]
    for name, fn in merged.items():
        out.setdefault(name, fn)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry (keys without an
    oracle get the driver's weaker rows-only check)."""
    # Fixture-trained oracles (Lloyd replications) are generated
    # lazily here, not at module import (ADVICE r7).
    from fsc_etl_spark.plans.oracles_training import ensure_trained_oracles

    ensure_trained_oracles()
    return {
        **ORACLES,
        **EXT_ORACLES,
        **MORE_ORACLES,
        **TPCH_ORACLES,
        **PARTSUPP_ORACLES,
        **TRAINING_ORACLES,
        **STREAMING_ORACLES,
        **scale_ops.SCALE_ORACLES,
        **RETRIEVAL_ORACLES,
        **graph_ops.GRAPH_ORACLES,
        **spark4_ops.SPARK4_ORACLES,
        **incremental.INCREMENTAL_ORACLES,
        **CORPUS_ORACLES,
    }
