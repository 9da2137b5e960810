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
    checks roughly the first 50 entries. ROUND-10 ROTATION: the window
    leads with the ten round-10 additions (HITS, assortativity,
    k-center coreset, batch + streaming Misra–Gries, seed ball sizes,
    PSI drift, nprobe recall curve, common-neighbor link prediction,
    char-trigram diversity — no driver row yet), then the five
    queries whose checking contract
    or plan changed this round (the VERDICT r9 #1 cell re-blocks, the
    #3 mask guard, the two ADVICE r9 bound/broadcast fixes), then the
    staleness rotation: the r1-vintage rows whose latest green driver
    row is oldest (VERDICT r9 #7). Keep
    tests/test_entry_contract.py's prefix-pin test in sync: it
    derives the never-sampled set from committed CORRECTNESS_r0*.json
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
        # --- round-10 NEW queries (no driver row yet) ---
        "hits_copurchase",  # integer HITS hubs/authorities
        "graph_assortativity",  # exact-ppm degree assortativity
        "embed_kcenter_coreset",  # greedy k-center selection curve
        "mg_frequent_tokens",  # Misra–Gries mergeable summary
        "streaming_mg_heavy_tokens",  # MG summary folded over a stream
        "graph_seed_ball_sizes",  # exact per-seed neighborhood curve
        "psi_value_drift",  # micro-nat PSI drift score
        "ivf_nprobe_recall_curve",  # recall@5 vs nprobe tuning curve
        "graph_common_neighbors",  # capped common-neighbor link pred
        "char_trigram_diversity",  # per-source char type-token ppm
        # --- round-10: contract or plan changed (VERDICT r9 #1/#3 +
        # ADVICE r9) ---
        "dedup_embed_neardup",  # re-blocked on trained IVF cells
        "embed_nn_within_label",  # re-blocked on (cell, label)
        "ngram_jaccard_pairs",  # distinct-mask m² guard in auto path
        "minhash_jaccard_accuracy",  # size-guarded pair broadcast
        "hll_daily_users",  # total bound gains greatest(40,·) floor
        # --- staleness rotation (VERDICT r9 #7): the r1-vintage tail —
        # every remaining slot goes to the queries whose latest green
        # driver row is oldest (42 of the 43 r1 rows; proj_alias, the
        # trivial projection also pinned by pytest + the covid path,
        # waits for r11) ---
        "agg_minmax",
        "anti_join_orphans",
        "asof_click_purchase",
        "cast_manifest_roundtrip",
        "cdc_snapshot_diff",
        "correlated_above_avg",
        "cube_order_stats",
        "date_funcs_breadth",
        "dim_join_broadcast",
        "distinct_dim",
        "except_all_priorities",
        "explode_doc_tokens",
        "filter_date_split",
        "filter_status",
        "global_topk_orders",
        "grouping_sets_priority",
        "hourly_event_rollup",
        "intersect_customers",
        "json_event_props",
        "median_price_by_status",
        "merge_upsert_state",
        "multi_distinct_by_flag",
        "pivot_event_types",
        "q10_returned_items",
        "q14_promo_revenue",
        "q15_top_supplier",
        "q3_shipping_priority",
        "q4_priority_exists",
        "q5_region_volume",
        "q6_revenue_forecast",
        "range_join_recent_views",
        "scalar_subquery_bigspenders",
        "semi_join_membership",
        "surrogate_key_assign",
        "union_insert_update",
    ]
    # (7 r1-vintage rows — sessionize_events, sliding_window_rollup,
    # string_funcs_breadth, unpivot_lineitem_metrics, window_lag_delta,
    # window_running_sum, window_topk_per_group — rotated out to make
    # room for the round-10 batch-2 additions; they lead the r11
    # staleness rotation together with proj_alias.)
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
