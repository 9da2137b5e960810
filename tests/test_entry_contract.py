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
