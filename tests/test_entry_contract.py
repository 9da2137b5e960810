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


def test_no_hugeint_oracle_columns(sf_smoke):
    """Static gate for the r4 failure class (VERDICT r4 "What's wrong"
    #1/#2): an uncast integer aggregate makes DuckDB type the column
    HUGEINT, which surfaces through the driver's arrow fetch as
    Decimal -> "1234.0" against Spark's "1234". DESCRIBE every oracle
    (no execution) and reject HUGEINT/UHUGEINT result columns."""
    from fsc_etl_spark.testing import duckdb_connection

    con = duckdb_connection(sf_smoke)
    try:
        bad: list[str] = []
        for name, sql in sorted(entrymod.oracle_sql().items()):
            desc = con.execute(f"DESCRIBE {sql}").df()
            for col, typ in zip(desc["column_name"], desc["column_type"]):
                if "HUGEINT" in str(typ).upper():
                    bad.append(f"{name}.{col}: {typ}")
        assert not bad, f"uncast integer aggregates (wrap in CAST(... AS BIGINT)): {bad}"
    finally:
        con.close()


def test_driver_sample_prefix_covers_priority_groups():
    """The driver oracle-checks roughly the first 50 queries() entries.
    Round-6 rotation (VERDICT r5 item 3): every query with no driver
    CORRECTNESS row across rounds 1-5 must sit in the 50-slot window
    — so after r6 every query in the repo has a driver row. The
    never-sampled set is derived from the committed CORRECTNESS
    artifacts, so adding a new query without windowing it fails here
    until the window (or a future round's rotation) covers it."""
    import json
    from pathlib import Path

    names = list(entrymod.queries())
    prefix = set(names[:50])
    root = Path(__file__).resolve().parent.parent
    sampled: set[str] = set()
    for p in sorted(root.glob("CORRECTNESS_r0*.json")):
        sampled |= set(json.loads(p.read_text()))
    never = [n for n in names if n not in sampled]
    missing = [n for n in never if n not in prefix]
    assert not missing, f"never-sampled queries fell out of the driver window: {missing}"
    # Queries whose behavior or checking contract changed recently
    # must sit in the sample window so the driver re-verifies them:
    # round 10 — the three new queries, the two cell-re-blocked
    # queries (VERDICT r9 #1), the mask-guarded jaccard auto path
    # (VERDICT r9 #3), and the two ADVICE r9 contract touches.
    changed_this_round = {
        "ivf_nprobe_recall_curve",
        "graph_common_neighbors",
        "char_trigram_diversity",
        "dedup_embed_neardup",
        "embed_nn_within_label",
        "ngram_jaccard_pairs",
        "minhash_jaccard_accuracy",
        "hll_daily_users",
    }
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
