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
    checks roughly the first 50 entries. ROUND-6 ROTATION (VERDICT r5
    item 3 — the rotation r5 failed to do): the prefix leads with the
    14 round-4 late additions that have never had a driver
    CORRECTNESS row (byte-identical r4/r5 samples missed them), then
    the queries whose behavior or checking contract changed this
    round (pps_token_sample — data-derived bucket prefix sum;
    embed_lsh_topk — upgraded from rows-only to a full hash oracle;
    embed_mmr_select / embed_ivf_topk — r5 guard/probe fixes, never
    re-verified), then the four round-6 additions (the audited
    pinned-codebook ANN tiers and the two curation gates), then
    long-green sentinels spanning every family to fill the window. Keep
    tests/test_entry_contract.py's prefix-pin test in sync: it
    derives the never-sampled set from CORRECTNESS_r0{1..5}.json
    automatically, so after r6's CORRECTNESS lands every query in
    the repo has a driver row.
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
        # --- the 14 never-driver-sampled queries (round-4 late
        # additions, deferred through two full windows) ---
        "ppr_copurchase_seeds",  # personalized PageRank, seed cohort
        "embed_mmr_select",  # MMR diverse top-k (r5 guards — re-verify)
        "pps_token_sample",  # PPS draw (r6 bucket rework — re-verify)
        "assoc_rules_parts",  # co-occurrence association rules
        "bucketed_join_rollup",  # zero-exchange bucketed join
        "csv_corrupt_quarantine",  # PERMISSIVE corrupt-record triage
        "hll_register_build",  # HLL register construction
        "hll_estimate_users",  # HLL cardinality estimate
        "hll_merge_halves",  # HLL merge monoid
        "cms_merge_halves",  # count-min merge monoid
        "token_budget_schedule",  # integer token-budget split
        "token_simpson_quality",  # Simpson diversity quality flags
        "streaming_cms_counts",  # streaming CMS maintenance
        "streaming_hll_registers",  # streaming HLL maintenance
        # --- checking contract or behavior changed this round ---
        "embed_lsh_topk",  # rows-only -> FULL hash oracle (r6)
        "embed_ivf_topk",  # r5 probe-ranking fix; rows-only check
        # --- round-6 additions: audited ANN tiers with pinned
        # codebooks and FULL hash oracles; benchmark decontamination ---
        "embed_ivf_pinned_topk",
        "embed_pq_pinned_topk",
        "eval_contamination_flags",
        "repetition_ngram_quality",
        "training_mix_manifest",
        "cluster_soft_dedup_sample",
        "embed_semdedup_prune",
        "dsir_importance_weights",
        "embed_knn_label_audit",
        "source_overlap_matrix",
        "streaming_dsir_gate",
        "dup_span_stats",
        "winnow_fingerprints",
        # --- long-green sentinels to fill the ~50-slot window,
        # spanning every family (TPC-H, star, dedup, sketch, graph,
        # streaming, multimodal, format, incremental) ---
        "q1_pricing_summary",
        "star_assembly",
        "dedup_cluster_assign_star",
        "minhash_signature",
        "lsh_near_dup_candidates",
        "simhash_signature",
        "rollup_returnflag",
        "multimodal_features",
        "ntile_customer_deciles",
        "pagerank_copurchase",
        "kcore_copurchase",
        "triangle_count_coparts",
        "cms_topk_users",
        "kmeans_cluster_stats",
        "vocab_coverage_stats",
        "segment_dedup_mask",
        "streaming_segment_dedup",
        "orc_roundtrip_stats",
        "pit_feature_join",
        "incremental_join_maintenance",
        "dpp_pruned_rollup",
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
