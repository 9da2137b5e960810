"""Partitioning-invariance gate: results must not depend on how the
scan splits the input files.

Each sampled query runs twice — once at the default
``spark.sql.files.maxPartitionBytes`` and once at 64 KB (forcing many
splits, hence different partial-aggregation order and partition
layout) — and the normalized result sets must be identical. This is
the class of bug exact-decimal/integer accumulation exists to prevent
(float partial sums reassociate under different split orders); a
failure here would pass the DuckDB oracle on one layout and fail on
another cluster's.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from fsc_etl_spark.testing import _norm_rows

# Representative accumulation-heavy queries: decimal/int sums,
# rationals at thresholds, windows, iterative clustering, top-k ties.
INVARIANT_QUERIES = [
    "q1_pricing_summary",
    "stats_moments_breadth",
    "user_trend_slope",
    "median_price_by_status",
    "heavy_hitter_users",
    "decile_bucket_scalable",
    "bigram_lm_quality",
    "tfidf_top_terms",
    "segment_dedup_mask",
    "vocab_coverage_stats",
    "dedup_cluster_assign",
    "embed_norm_stats",
    "token_vocab_topk",
    "q11_important_stock",
    # round-3 late batch: sequential fold, digest sums, exact-threshold
    # flags, two-phase sweeps, iterative integer graph state
    "ewma_user_value",
    "table_checksum_buckets",
    "value_anomaly_events",
    "skyline_orders",
    "pagerank_copurchase",
    "session_window_stats",
    "pit_feature_join",
    # round-4 batch: fixed-point rational ranking at the support floor,
    # division-free drift flags, class-size privacy gate, packed
    # two-state fold, dangling-mass redistribution rounds
    "pmi_top_bigrams",
    "value_drift_buckets",
    "k_anonymity_audit",
    "holt_user_forecast",
    "pagerank_dangling_redistribute",
    "padding_waste_stats",
    "table_profile_stats",
    "kcore_copurchase",
    "ppr_copurchase_seeds",
    "cms_topk_users",
    "hll_register_build",
    "pps_token_sample",
    # round-6 batch: multi-table LSH (Arrow-matmul signatures +
    # distinct candidate union must not depend on batch boundaries)
    "embed_lsh_topk",
    "embed_pq_topk",
    # audited pinned-codebook tiers: literal-quantizer assignment +
    # ADC ranking must not depend on Arrow batch/split boundaries
    "embed_ivf_pinned_topk",
    "embed_pq_pinned_topk",
    # composed curation manifest: five gates + dedup keep-first +
    # per-lang integer aggregate, all layout-independent by design
    "training_mix_manifest",
    # semantic dedup: cell-blocked pair join + rounded-cosine loser
    # rule; soft dedup: star-CC cluster ids + hash-bucket keep rule —
    # neither may depend on scan splits
    "embed_semdedup_prune",
    "cluster_soft_dedup_sample",
    # DSIR: corpus-level bucket counts feed a quantized score used by
    # every doc — partial-agg order across splits must not move it
    "dsir_importance_weights",
    # kNN label audit: rank windows over the cell pair join; majority
    # vote must not depend on candidate arrival order
    "embed_knn_label_audit",
    # source overlap: distinct + gram-keyed self-join + ppm divisions
    "source_overlap_matrix",
    # duplicated spans: corpus hash counts + islands run-merge
    "dup_span_stats",
    # winnowing: sliding-frame min + rightmost-tie argmax + distinct
    "winnow_fingerprints",
    # leakage-safe split: star-CC cluster ids + md5 routing + audit
    # rollups — counts must not depend on scan splits or agg order
    "cluster_leakage_split",
    # modularity: LPA struct-argmax rounds over the co-parts pair
    # expansion + decimal Q reduce — label decisions and the signed
    # truncating division must not depend on partial-agg order
    "community_modularity",
    # priority sample: top-k draw with md5-derived priorities — the
    # drawn SET must not depend on scan splits (heap merge order)
    "weighted_priority_sample",
]


def _normalized(spark, name: str, sf: str):
    df = entrymod.queries()[name](spark, sf)
    return _norm_rows(list(df.columns), [tuple(r) for r in df.collect()])


@pytest.mark.parametrize("name", INVARIANT_QUERIES)
def test_result_invariant_under_scan_splitting(spark, sf_smoke, name):
    key = "spark.sql.files.maxPartitionBytes"
    default = spark.conf.get(key)
    base = _normalized(spark, name, sf_smoke)
    try:
        spark.conf.set(key, str(64 * 1024))
        split = _normalized(spark, name, sf_smoke)
    finally:
        spark.conf.set(key, default)
    assert base == split, f"{name}: result depends on scan partitioning"
