"""Round-1 tail additions: SimHash near-dup pairs (banded blocking +
exact Hamming verify), per-user time-series gap-fill, and fixed-width
histogram. Oracle parity is covered by the driver sweep; these tests
assert the operator-level invariants the hash compare can't express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from fsc_etl_spark.testing import check_query

QUERIES = entrymod.queries()


def test_simhash_pairs_invariants(spark, sf_smoke):
    out = QUERIES["simhash_neardup_pairs"](spark, sf_smoke).collect()
    for r in out:
        assert r.id_a < r.id_b, "pairs must be canonically ordered"
        assert 0 <= r.hamming <= 3, "verify stage must enforce the Hamming bound"
    # Exact duplicates (identical text -> identical signature) must be found.
    docs = QUERIES["dedup_exact_groups"](spark, sf_smoke)
    if docs.filter(F.col("dup_count") > 1).limit(1).count() > 0:
        assert any(r.hamming == 0 for r in out), "exact dups should surface at hamming 0"


def test_simhash_pairs_blocking_recall(spark, sf_smoke):
    """Banding must find EVERY pair within the Hamming bound (pigeonhole
    guarantee), so compare against the brute-force cross join."""
    from fsc_etl_spark.operators.dedup import simhash_sig
    from fsc_etl_spark.sources.readers import read_parquet_table

    sigs = simhash_sig(read_parquet_table(spark, sf_smoke, "documents")).collect()
    brute = {
        (a.doc_id, b.doc_id)
        for a in sigs
        for b in sigs
        if a.doc_id < b.doc_id and bin(a.simhash ^ b.simhash).count("1") <= 3
    }
    banded = {
        (r.id_a, r.id_b) for r in QUERIES["simhash_neardup_pairs"](spark, sf_smoke).collect()
    }
    assert banded == brute


def test_gapfill_dense_and_zero_filled(spark, sf_smoke):
    out = QUERIES["timeseries_gapfill"](spark, sf_smoke)
    spans = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.datediff(F.max("day"), F.min("day")) + 1).alias("span_days"),
    )
    assert spans.filter(F.col("n_days") != F.col("span_days")).count() == 0, (
        "every user's timeline must be gap-free between min and max day"
    )
    assert out.filter(F.col("n_events") < 0).count() == 0
    # Zero-filled rows exist only if the raw daily series has gaps; both
    # sides of that implication are covered by the span check above.


def test_histogram_buckets_partition_rows(spark, sf_smoke):
    from fsc_etl_spark.sources.readers import read_parquet_table

    li = read_parquet_table(spark, sf_smoke, "lineitem")
    hist = QUERIES["histogram_price_buckets"](spark, sf_smoke)
    rows = hist.agg(F.sum("n")).first()[0]
    assert rows == li.count(), "buckets must partition the input exactly"
    bad = hist.filter(
        (F.col("lo") != F.col("bucket") * 10000.0) | (F.col("hi") != F.col("lo") + 10000.0)
    )
    assert bad.count() == 0


def test_cluster_assign_invariants(spark, sf_smoke):
    """Connected-components output: edges never straddle clusters, and
    every cluster's root is its minimum member id."""
    labels = {r.doc_id: r.cluster_root for r in QUERIES["dedup_cluster_assign"](spark, sf_smoke).collect()}
    pairs = QUERIES["lsh_near_dup_candidates"](spark, sf_smoke).collect()
    for p in pairs:
        assert labels[p.id_a] == labels[p.id_b], "linked docs must share a cluster"
    by_root: dict[int, list[int]] = {}
    for doc, root in labels.items():
        by_root.setdefault(root, []).append(doc)
    for root, members in by_root.items():
        assert root == min(members), "cluster root must be the min member id"


def test_locf_carries_last_observation(spark, sf_smoke):
    out = QUERIES["timeseries_locf"](spark, sf_smoke)
    # After the first observed day, locf_value is never null.
    w_first = out.groupBy("user_id").agg(
        F.min(F.when(F.col("locf_value").isNotNull(), F.col("day"))).alias("first_day")
    )
    stragglers = (
        out.join(w_first, "user_id")
        .filter((F.col("day") >= F.col("first_day")) & F.col("locf_value").isNull())
        .count()
    )
    assert stragglers == 0


def test_new_queries_oracle_parity_smoke(spark, sf_smoke):
    for name in ("simhash_neardup_pairs", "timeseries_gapfill", "histogram_price_buckets"):
        check_query(spark, sf_smoke, name)
