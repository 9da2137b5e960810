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
    checks roughly the first 50 entries. ROUND-9 ROTATION: the window
    leads with the seven round-9 additions (ANN recall matrix,
    MinHash estimator audit, novelty curve, stratified sampling, LPA
    communities, lag autocorrelation, IVF cell balance — no driver
    row yet), then the nine queries whose checking contract, plan, or
    behavior was touched this round (the retired rows-only pair, the
    ADVICE r8 fixes, the broadcast guard, the PPR/streaming-dedup
    reworks), then the round-8/7 batches for continuity, and
    long-green sentinels spanning the remaining families to fill the
    50-slot window. Keep tests/test_entry_contract.py's prefix-pin
    test in sync: it derives the never-sampled set from committed
    CORRECTNESS_r0*.json automatically.
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
        # --- round-9 NEW queries (no driver row yet) ---
        "embed_ann_recall_matrix",  # ANN tier recall@5 vs exact, ppm
        "minhash_jaccard_accuracy",  # MinHash estimator error audit
        "ngram_novelty_curve",  # per-decile 3-gram novelty ppm
        "stratified_sample_exact",  # largest-remainder stratified draw
        "graph_label_propagation",  # deterministic LPA communities
        "daily_value_autocorr",  # integer lag autocorrelation
        "ivf_cell_balance",  # trained-quantizer balance audit
        # --- round-9: contract changed (rows-only tier retired /
        # behavior or plan touched) ---
        "approx_user_stats",  # error-bounded contract, FULL oracle now
        "hll_daily_users",  # error-bounded contract, FULL oracle now
        "heaps_law_vocab_growth",  # checkpoint clamped (ADVICE r8)
        "incremental_lsh_dedup",  # size-guarded pair broadcast
        "gopher_quality_flags",  # oracle empty-list COALESCE
        "streaming_quality_gate",  # oracle empty-list COALESCE
        "embed_covariance_topk",  # runtime int64-headroom guard in plan
        "ppr_copurchase_seeds",  # broadcast seed flag per round
        "streaming_segment_dedup",  # per-epoch idempotent state writes
        # --- round-8 NEW queries (second driver look) ---
        "bm25_topk_docs",  # Okapi BM25 lexical retrieval
        "rrf_fused_topk",  # reciprocal-rank fusion (hybrid retrieval)
        "quality_calibration_bins",  # reliability table, scalable deciles
        "exact_quantiles_scalable",  # nearest-rank quantiles, no global sort
        "embed_matryoshka_recall",  # truncated-dim recall@10
        "bm25_prf_expansion",  # pseudo-relevance-feedback terms
        "embed_power_iteration",  # integer power-iteration top PC
        "bigram_lm_perplexity",  # CCNet-style LM quality filter
        "retrieval_ndcg_mrr",  # nDCG@10 / MRR ranking eval
        "zipf_rank_frequency",  # rank-frequency slope fit
        "source_length_drift",  # per-source histogram drift
        "ccnet_ppl_buckets",  # head/middle/tail percentile split
        "tokenizer_fertility_stats",  # per-lang tokenizer fertility
        "streaming_ppl_gate",  # stream-static LM gate
        # --- round-8 ADVICE-touched (third look) ---
        "embed_int8_quant_stats",  # s=0 divisor guard (both engines)
        "embed_semdedup_trained",  # oracle now lazily generated
        "embed_knn_audit_trained",  # oracle now lazily generated
        # --- round-7: behavior or checking contract changed ---
        "winnow_fingerprints",  # frame-mixing FIX + independent oracle
        "embed_ivf_topk",  # rows-only -> FULL hash (replicated Lloyd)
        "embed_pq_topk",  # rows-only -> FULL hash (replicated Lloyd)
        "pps_token_sample",  # driver-pinned one-row control (ADVICE r6)
        "embed_lsh_topk",  # id-type-agnostic signature schema
        "embed_semdedup_prune",  # assign_strategy plumbing (expr default)
        "embed_knn_label_audit",  # assign_strategy plumbing (expr default)
        "embed_pq_pinned_topk",  # pinned-codebook shape validation
        # --- round-7 NEW queries (third driver look) ---
        "embed_hard_negatives",  # contrastive hard-negative mining
        "bpe_pair_counts",  # BPE merge-rule statistics
        "lang_pred_quality",  # lang-ID confusion stats, exact ppm
        "dup_span_trim_stats",  # substring-dedup trim accounting
        # --- long-green sentinels spanning remaining families (TPC-H,
        # star, dedup/curation, graph, multimodal, streaming-state) ---
        "eval_contamination_flags",
        "training_mix_manifest",
        "q1_pricing_summary",
        "multimodal_features",
        "streaming_dsir_gate",
    ]
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
