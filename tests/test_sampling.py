"""Unit tests for operators/sampling.pps_systematic: pure-Python
reference equivalence, the draw-count identity, multiplicity for
oversized weights, and invariance to the input partitioning (the
two-phase prefix sum must not depend on range boundaries).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fsc_etl_spark.operators.sampling import pps_systematic

PROP_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

weight_lists = st.lists(st.integers(0, 40), min_size=1, max_size=30)


def _py_pps(weights, n_target):
    total = sum(weights)
    stride = max(total // n_target, 1)
    out, cb = {}, 0
    for i, w in enumerate(weights):
        hits = (cb + w) // stride - cb // stride
        if hits >= 1:
            out[i] = hits
        cb += w
    return out


@pytest.mark.slow
@given(weights=weight_lists, n_target=st.integers(1, 10))
@settings(**PROP_SETTINGS)
def test_pps_matches_reference(spark, weights, n_target):
    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = {
        r["id"]: r["n_hits"]
        for r in pps_systematic(df, "w", ["id"], n_target).collect()
    }
    assert got == _py_pps(weights, n_target)


def test_pps_total_draws_identity(spark):
    # sum of hits == total // stride (+1 iff stride divides total and
    # the last gridpoint lands exactly on the total boundary — which
    # it never does for an exclusive interval; pin the simple case)
    rows = [(i, 10) for i in range(10)]  # total 100, n_target 4 -> stride 25
    df = spark.createDataFrame(rows, "id long, w long")
    picked = pps_systematic(df, "w", ["id"], 4).collect()
    assert sum(r["n_hits"] for r in picked) == 100 // 25


def test_pps_huge_weight_multiplicity(spark):
    rows = [(0, 100), (1, 1), (2, 1)]  # stride = 102 div 3 = 34
    df = spark.createDataFrame(rows, "id long, w long")
    got = {r["id"]: r["n_hits"] for r in pps_systematic(df, "w", ["id"], 3).collect()}
    # row 0 spans [0, 100): gridpoints 34, 68 -> 2 draws (floor(100/34)=2)
    assert got[0] == 2


def test_pps_zero_weight_never_selected(spark):
    rows = [(0, 0), (1, 5), (2, 0), (3, 5)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = {r["id"]: r["n_hits"] for r in pps_systematic(df, "w", ["id"], 2).collect()}
    assert 0 not in got and 2 not in got


@pytest.mark.parametrize("n_parts", [1, 3, 7])
def test_pps_partition_invariant(spark, n_parts):
    rows = [(i, (i * 7) % 13 + 1) for i in range(50)]
    expected = _py_pps([w for _, w in rows], 6)
    df = spark.createDataFrame(rows, "id long, w long").repartition(n_parts)
    got = {
        r["id"]: r["n_hits"] for r in pps_systematic(df, "w", ["id"], 6).collect()
    }
    assert got == expected


def test_pps_invalid_target_raises(spark):
    df = spark.createDataFrame([(1, 1)], "id long, w long")
    with pytest.raises(ValueError, match="n_target"):
        pps_systematic(df, "w", ["id"], 0)


@pytest.mark.parametrize("n_buckets", [1, 2, 5, 64])
def test_pps_bucket_count_invariant(spark, n_buckets):
    """The round-6 data-derived buckets only steer parallelism: the
    selected rows and multiplicities must be identical for ANY bucket
    count, including the degenerate single bucket."""
    rows = [(i, (i * 11) % 17 + 1) for i in range(60)]
    expected = _py_pps([w for _, w in rows], 7)
    df = spark.createDataFrame(rows, "id long, w long")
    got = {
        r["id"]: r["n_hits"]
        for r in pps_systematic(df, "w", ["id"], 7, n_buckets=n_buckets).collect()
    }
    assert got == expected


def test_pps_all_equal_keys_single_bucket_degenerate(spark):
    """All-identical leading keys collapse every boundary to one value
    — every row must bin to one bucket and the draw must still match
    the reference (the within-bucket window refines by the full
    order_by)."""
    rows = [(7, i, i % 5 + 1) for i in range(20)]
    expected = _py_pps([w for _, _, w in rows], 4)
    df = spark.createDataFrame(rows, "k long, id long, w long")
    got = {
        r["id"]: r["n_hits"]
        for r in pps_systematic(df, "w", ["k", "id"], 4).collect()
    }
    assert got == expected
