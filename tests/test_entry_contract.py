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


def test_no_hugeint_oracle_columns():
    """Static gate for the r4 failure class (VERDICT r4 "What's wrong"
    #1/#2): an uncast integer aggregate makes DuckDB type the column
    HUGEINT, pandas materializes it float64, and the driver's value
    hash then sees "1234.0" vs Spark's "1234". DESCRIBE every oracle
    (no execution) and reject HUGEINT/UHUGEINT result columns."""
    from fsc_etl_spark.testing import duckdb_connection

    con = duckdb_connection("/root/testdata/sf0.001")
    try:
        bad: list[str] = []
        for name, sql in sorted(entrymod.oracle_sql().items()):
            for col, typ in zip(
                con.execute(f"DESCRIBE {sql}").df()["column_name"],
                con.execute(f"DESCRIBE {sql}").df()["column_type"],
            ):
                if "HUGEINT" in str(typ).upper():
                    bad.append(f"{name}.{col}: {typ}")
        assert not bad, f"uncast integer aggregates (wrap in CAST(... AS BIGINT)): {bad}"
    finally:
        con.close()


def test_driver_sample_prefix_covers_priority_groups():
    """The driver oracle-checks roughly the first 50 queries() entries.
    Round-4 rotation: the window is exactly the 41 queries with no
    driver CORRECTNESS row after rounds 1-3, plus this round's
    changed queries — so after r4 every query has a driver-green
    row."""
    import json
    from pathlib import Path

    names = list(entrymod.queries())
    prefix = set(names[:50])
    root = Path(__file__).resolve().parent.parent
    sampled: set[str] = set()
    for rec in (
        "CORRECTNESS_r01.json",
        "CORRECTNESS_r02.json",
        "CORRECTNESS_r03.json",
    ):
        p = root / rec
        if p.exists():
            sampled |= set(json.loads(p.read_text()))
    never = [n for n in names if n not in sampled]
    # Late round-4 additions that no longer fit the full 50-slot
    # window: explicitly deferred to the round-5 stragglers-first
    # rotation (see the ROUND-5 ROTATION NOTE in __spark_entry__).
    deferred_to_r5 = {
        "hll_register_build",
        "pps_token_sample",
        "bucketed_join_rollup",
        "hll_estimate_users",
        "hll_merge_halves",
        "csv_corrupt_quarantine",
        "embed_mmr_select",
        "cms_merge_halves",
        "token_budget_schedule",
        "token_simpson_quality",
        "streaming_cms_counts",
        "assoc_rules_parts",
        "streaming_hll_registers",
        "ppr_copurchase_seeds",
    }
    missing = [n for n in never if n not in prefix and n not in deferred_to_r5]
    assert not missing, f"never-sampled queries fell out of the driver window: {missing}"
    # Queries whose results/plans changed in round 4 must sit in the
    # sample window so the driver re-verifies them.
    changed_this_round = {"multimodal_features", "ntile_customer_deciles"}
    for must_have in changed_this_round:
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
