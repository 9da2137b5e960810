"""Unit tests for operators/sketches.py: count-min and HLL-register
construction pinned against pure-Python md5 references, plus the
count-min overestimate guarantee and additivity (raw rows vs
pre-aggregated weights build identical counters).

The plans-layer twins (cms_topk_users, hll_register_build) are
oracle-checked by tests/test_entry_contract.py like every queries()
entry; these tests pin the operator semantics on inputs small enough
to verify by hand.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fsc_etl_spark.operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_BUCKETS,
    HLL_RANK_BITS,
    cms_build,
    cms_estimate,
    hll_estimate,
    hll_merge,
    hll_registers,
)

PROP_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

key_lists = st.lists(st.integers(0, 30).map(str), min_size=1, max_size=40)


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_cms(keys):
    counters = Counter()
    for k in keys:
        for j in range(CMS_DEPTH):
            counters[(j, _h60(f"cms{j}:{k}") % CMS_WIDTH)] += 1
    return counters


def _py_cms_estimate(key, counters):
    return min(
        counters.get((j, _h60(f"cms{j}:{key}") % CMS_WIDTH), 0)
        for j in range(CMS_DEPTH)
    )


def _py_hll(keys):
    regs = {}
    for k in keys:
        h = _h60(str(k))
        bucket, v = h % HLL_BUCKETS, h // HLL_BUCKETS
        rank = HLL_RANK_BITS + 1 if v == 0 else HLL_RANK_BITS - v.bit_length() + 1
        regs[bucket] = max(regs.get(bucket, 0), rank)
    return regs


@given(keys=key_lists)
@settings(**PROP_SETTINGS)
def test_cms_build_matches_reference(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {(r["j"], r["b"]): r["total"] for r in cms_build(df, "k").collect()}
    assert got == dict(_py_cms(keys))


@given(keys=key_lists)
@settings(**PROP_SETTINGS)
def test_cms_estimate_matches_reference_and_overestimates(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    counters = cms_build(df, "k")
    exact = Counter(keys)
    uniq = df.distinct()
    got = {r["k"]: r["est_cnt"] for r in cms_estimate(uniq, counters, "k").collect()}
    py_counters = _py_cms(keys)
    for k, cnt in exact.items():
        assert got[k] == _py_cms_estimate(k, py_counters)
        assert got[k] >= cnt  # the count-min upper-bound guarantee


def test_cms_additivity_weighted_equals_raw(spark):
    keys = ["a", "b", "a", "c", "a", "b"]
    raw = spark.createDataFrame([(k,) for k in keys], "k string")
    pre = spark.createDataFrame(
        list(Counter(keys).items()), "k string, cnt long"
    )
    from_raw = {(r["j"], r["b"]): r["total"] for r in cms_build(raw, "k").collect()}
    from_pre = {
        (r["j"], r["b"]): r["total"]
        for r in cms_build(pre, "k", weight_col="cnt").collect()
    }
    assert from_raw == from_pre


@given(keys=key_lists)
@settings(**PROP_SETTINGS)
def test_hll_registers_match_reference(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {r["bucket"]: r["register"] for r in hll_registers(df, "k").collect()}
    assert got == _py_hll(keys)


def test_hll_registers_duplicate_insensitive(spark):
    once = spark.createDataFrame([("x",), ("y",)], "k string")
    thrice = spark.createDataFrame([("x",)] * 3 + [("y",)] * 2, "k string")
    a = {r["bucket"]: r["register"] for r in hll_registers(once, "k").collect()}
    b = {r["bucket"]: r["register"] for r in hll_registers(thrice, "k").collect()}
    assert a == b


@pytest.mark.slow
@given(keys=key_lists, split=st.integers(1, 5))
@settings(**PROP_SETTINGS)
def test_hll_merge_equals_single_pass(spark, keys, split):
    """Mergeability: per-bucket max of partial sketches == the sketch
    of the unioned input, for ANY partition of the keys."""
    whole = spark.createDataFrame([(k,) for k in keys], "k string")
    parts = [
        spark.createDataFrame(
            [(k,) for i, k in enumerate(keys) if i % split == j], "k string"
        )
        for j in range(split)
    ]
    merged = hll_merge(*[hll_registers(p, "k") for p in parts])
    direct = hll_registers(whole, "k")
    a = {r["bucket"]: r["register"] for r in merged.collect()}
    b = {r["bucket"]: r["register"] for r in direct.collect()}
    assert a == b


def test_hll_estimate_matches_reference(spark):
    keys = [str(i) for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    row = hll_estimate(hll_registers(df, "k")).first()
    regs = _py_hll(keys)
    s = sum(2.0 ** -r for _, r in sorted(regs.items())) + (HLL_BUCKETS - len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / HLL_BUCKETS)
    est = alpha * HLL_BUCKETS * HLL_BUCKETS / s
    assert row["n_used_buckets"] == len(regs)
    assert row["harmonic_sum"] == s
    # raw estimate lands within the expected ~13% relative error band
    # for m=64 (1.04/sqrt(64)) with a generous margin
    assert abs(row["hll_estimate"] - 200) / 200 < 0.4
    assert row["hll_estimate"] == est


def test_hll_merge_requires_input():
    import pytest

    with pytest.raises(ValueError, match="at least one"):
        hll_merge()


def test_cms_plan_is_partial_aggregate(spark):
    """The sketch build must collapse map-side: the aggregate on
    (j, b) has a partial_count/partial-sum phase before the exchange
    (bounded per-task state — the 100 TB contract)."""
    df = spark.range(100).select(F.col("id").cast("string").alias("k"))
    plan = cms_build(df, "k")._jdf.queryExecution().executedPlan().toString()
    first_agg = plan.index("HashAggregate")
    assert "Exchange" in plan[first_agg:], plan


@pytest.mark.slow
@given(keys=key_lists, split=st.integers(1, 4))
@settings(**PROP_SETTINGS)
def test_cms_merge_equals_single_pass(spark, keys, split):
    """Mergeability: per-cell sum of partial sketches == the sketch
    of the unioned input, for ANY partition of the keys."""
    from fsc_etl_spark.operators.sketches import cms_merge

    whole = spark.createDataFrame([(k,) for k in keys], "k string")
    parts = [
        spark.createDataFrame(
            [(k,) for i, k in enumerate(keys) if i % split == j], "k string"
        )
        for j in range(split)
    ]
    merged = cms_merge(*[cms_build(p, "k") for p in parts])
    direct = cms_build(whole, "k")
    a = {(r["j"], r["b"]): r["total"] for r in merged.collect()}
    b = {(r["j"], r["b"]): r["total"] for r in direct.collect()}
    assert a == b


def test_cms_merge_requires_input():
    import pytest

    from fsc_etl_spark.operators.sketches import cms_merge

    with pytest.raises(ValueError, match="at least one"):
        cms_merge()


def test_mg_prune_fewer_than_k_keys_is_exact(spark):
    """With <= k distinct keys the threshold frame is EMPTY and the
    prune must be the identity (the left-join-on-constant guard: a
    cross join against the empty threshold would drop every row)."""
    from fsc_etl_spark.operators.sketches import mg_prune

    counts = spark.createDataFrame(
        [("a", 5), ("b", 3)], "key string, cnt long"
    )
    got = sorted((r.key, r.cnt) for r in mg_prune(counts, k=32).collect())
    assert got == [("a", 5), ("b", 3)]


def test_mg_prune_subtracts_k_plus_first_value(spark):
    """k=2 over counts 5,4,3,1: t = 3 (3rd largest), survivors are
    5-3=2 and 4-3=1; the 3 and 1 die."""
    from fsc_etl_spark.operators.sketches import mg_prune

    counts = spark.createDataFrame(
        [("a", 5), ("b", 4), ("c", 3), ("d", 1)], "key string, cnt long"
    )
    got = sorted((r.key, r.cnt) for r in mg_prune(counts, k=2).collect())
    assert got == [("a", 2), ("b", 1)]


def test_mg_frequent_bound_and_determinism(spark):
    """The merged summary undercounts every key by at most n/(k+1),
    keeps every key above that threshold, and is a pure function of
    the multiset (same result under a different partitioning)."""
    from fsc_etl_spark.operators.sketches import mg_frequent

    rows = [(i, "hot") for i in range(60)] + [
        (100 + i, f"cold{i % 17}") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, tok string")
    k = 4
    got = {
        r.tok: r.mg_est
        for r in mg_frequent(df, "tok", k, shard_col="doc_id").collect()
    }
    n = len(rows)
    assert "hot" in got  # 60 > 100/5
    assert 0 < got["hot"] <= 60
    assert 60 - got["hot"] <= n // (k + 1)
    got2 = {
        r.tok: r.mg_est
        for r in mg_frequent(
            df.repartition(7), "tok", k, shard_col="doc_id"
        ).collect()
    }
    assert got == got2
