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
    checks roughly the first 50 entries. ROUND-11 ROTATION: the window
    leads with `graph_assortativity` — r10's single red row (hash
    mismatch on bit-identical values; root-caused to the DECIMAL(38,0)
    final schema, now BIGINT on both engines, VERDICT r10 #1) — then
    `psi_value_drift` (plan changed: ADVICE r10 2^53 exactness guard +
    bounded-counts checkpoint), then the five round-11 debuts
    (Adamic–Adar link prediction, market-basket 2-itemset mining,
    exact rolling-distinct lowering, 4-truss support peel, integer
    CUSUM changepoint — no driver row yet), then the
    staleness rotation (VERDICT r10 #3): the 8 remaining r1-vintage
    rows (proj_alias + the 7 rotated out in r10), then the r2-vintage
    generation (35 of 40 fit; the displaced 5 lead r12). Keep
    tests/test_entry_contract.py's prefix-pin test in sync: it
    derives the never-sampled set from committed CORRECTNESS_r*.json
    automatically.
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
        # --- r10 red-row fix: DECIMAL(38,0) final schema -> BIGINT
        # (VERDICT r10 #1); pinned first ---
        "graph_assortativity",
        # --- plan changed this round (ADVICE r10 exactness guard) ---
        "psi_value_drift",
        # --- round-11 NEW queries (no driver row yet) ---
        "graph_adamic_adar",  # pinned-weight AA link prediction
        "basket_pair_support",  # A-Priori 2-itemset support + lift
        "rolling_distinct_users",  # exact trailing-7d distinct lowering
        "ktruss_coparts",  # 4-truss support-peel histogram
        "cusum_changepoint",  # integer CUSUM drift walk per type
        # --- staleness rotation (VERDICT r10 #3): the last 8 r1-vintage
        # rows ---
        "proj_alias",
        "sessionize_events",
        "sliding_window_rollup",
        "string_funcs_breadth",
        "unpivot_lineitem_metrics",
        "window_lag_delta",
        "window_running_sum",
        "window_topk_per_group",
        # --- staleness rotation: the r2-vintage generation (35 of the
        # 40 rows whose latest green driver row is round 2) ---
        "array_agg_cust_years",
        "array_funcs_breadth",
        "bloom_pruned_join",
        "dedup_cluster_assign",
        "dedup_exact_groups",
        "doc_fingerprint",
        "embed_cosine_topk",
        "embed_cosine_topk_pandas",
        "heavy_hitter_users",
        "lang_id_heuristic",
        "map_funcs_breadth",
        "q11_important_stock",
        "q12_priority_by_status",
        "q13_customer_distribution",
        "q16_supplier_count",
        "q17_small_quantity_revenue",
        "q18_large_volume_customer",
        "q19_disjunctive_predicates",
        "q20_excess_stock_suppliers",
        "q21_waiting_supplier",
        "q22_idle_customers",
        "q2_min_cost_supplier",
        "q7_volume_shipping",
        "q8_market_share",
        "reservoir_sample_per_source",
        "simhash_neardup_pairs",
        "streaming_blocklist_dedup",
        "streaming_click_purchase_join",
        "streaming_dedup_events",
        "streaming_enrich_dim",
        "streaming_heavy_hitters",
        "streaming_hourly_rollup",
        "streaming_multibatch_sessionize",
        "streaming_sessionize",
        "streaming_upsert_latest",
    ]
    # (streaming_user_state, text_bpe_tokens, text_quality,
    # text_token_stats and user_trend_slope — displaced from the r2
    # generation by the five round-11 debuts — plus the r3 generation
    # (47 rows) lead the r12 staleness rotation.)
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
