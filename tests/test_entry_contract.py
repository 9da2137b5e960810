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
    Round 1 left the training/streaming/TPC-H groups unsampled; the
    ordering contract keeps them — and the round-1 harness-shape
    fixes — inside the sample window."""
    names = list(entrymod.queries())
    prefix = set(names[:50])
    for must_have in (
        "q12_priority_by_status",
        "approx_user_stats",
        "array_agg_cust_years",
        "streaming_multibatch_sessionize",
        "streaming_hourly_rollup",
        "q8_market_share",
        "q2_min_cost_supplier",
        "minhash_signature",
        "lsh_near_dup_candidates",
        "simhash_neardup_pairs",
        "dedup_cluster_assign",
        "multimodal_features",
        # round-2 scale patterns — new code verifies before long-greens
        "bloom_pruned_join",
        "heavy_hitter_users",
        "reservoir_sample_per_source",
    ):
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
