"""Unit tests for the plan-fingerprint normalizer (fsc_etl_spark/planfp.py)
on synthetic explain trees — the gate in test_plan_fingerprints.py
exercises it end-to-end against live plans; these pin the PARSER
contract (what is kept, what is stripped) so a Spark explain-format
drift shows up as a named parser failure, not as 219 mysterious
fingerprint diffs."""

from __future__ import annotations

from fsc_etl_spark.planfp import _join_token, _node_kind


def test_tree_prefix_and_codegen_marker_stripped():
    assert _node_kind("*(3) HashAggregate(keys=[a#12L], functions=[sum(b#3)])") == "HashAggregate"
    assert _node_kind("   +- *(1) Project [a#12L]") == "Project"
    assert _node_kind("   :- BroadcastHashJoin [k#1], [k#2], Inner, BuildRight") == "BroadcastHashJoin"
    assert _node_kind("      +- AdaptiveSparkPlan isFinalPlan=false") == "AdaptiveSparkPlan"


def test_exchange_scheme_kept_keys_dropped():
    assert (
        _node_kind("+- Exchange hashpartitioning(a#12L, 32), ENSURE_REQUIREMENTS, [plan_id=42]")
        == "Exchange:hashpartitioning"
    )
    assert (
        _node_kind("+- Exchange rangepartitioning(a#12L ASC NULLS FIRST, 32), ...")
        == "Exchange:rangepartitioning"
    )
    assert _node_kind("+- Exchange SinglePartition, ENSURE_REQUIREMENTS") == "Exchange:SinglePartition"


def test_scan_source_kept_path_dropped():
    assert (
        _node_kind("+- *(1) Scan parquet [l_orderkey#0L] Batched: true, Location: ...")
        == "Scan:parquet"
    )
    assert _node_kind("+- Scan ExistingRDD[node#5L,label#6L]") == "Scan:ExistingRDD"
    assert _node_kind("FileScan parquet [a#1] ...") == "Scan:parquet"


def test_join_token_captures_strategy_and_type():
    line = ":- BroadcastHashJoin [k#1], [k#2], LeftSemi, BuildRight, false"
    assert _join_token(line, "BroadcastHashJoin") == "BroadcastHashJoin:LeftSemi"
    line2 = "+- SortMergeJoin [a#1], [b#2], FullOuter"
    assert _join_token(line2, "SortMergeJoin") == "SortMergeJoin:FullOuter"
    # no recognizable type -> bare strategy, never a crash
    assert _join_token("+- CartesianProduct", "CartesianProduct") == "CartesianProduct"


def test_blank_and_decoration_lines_ignored():
    assert _node_kind("") is None
    assert _node_kind("   ") is None
    # AQE's "== Final Plan ==" marker line carries no node kind
    assert _node_kind("+- == Final Plan ==") is None
