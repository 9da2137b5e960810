"""Does 3-round LPA converge early on the co-purchase graph?
(VERDICT r10 #7 / r11 #3 — converged-frontier early exit for LPA.)

An LPA early exit is oracle-safe only at a FIXPOINT: deterministic
synchronous LPA maps equal label frames to equal label frames, so
labels_{r+1} == labels_r implies every later round is a no-op and the
3-round unrolled-CTE oracle still hash-matches. This probe measures
whether that fixpoint ever arrives inside the 3-round contract at
sf0.1 — the number of nodes whose label CHANGES in each round. A
nonzero count in round 3 means an early exit can never fire (and its
per-round changed-count check — a join + count materializing each
round's labels, the same barrier the r11 checkpoint experiment
measured SLOWER by 0.8 s — would be pure overhead).

Run (idle host): python scripts/lpa_convergence_probe.py
Prints per-round changed counts; record the conclusion in
plans/graph_ops.py / BASELINE.md.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from pyspark.sql import functions as F  # noqa: E402

from fsc_etl_spark.session import get_spark  # noqa: E402
from fsc_etl_spark.sources.readers import read_parquet_table  # noqa: E402

SF = "/root/testdata/sf0.1"
ROUNDS = 6  # past the 3-round contract, to see where the fixpoint IS


def main() -> None:
    spark = get_spark(app_name="lpa_convergence_probe")
    o = read_parquet_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = read_parquet_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    cp = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("cnode"),
            (F.col("l_partkey") * 2 + 1).alias("pnode"),
        )
        .distinct()
    )
    edges = (
        cp.select(F.col("cnode").alias("src"), F.col("pnode").alias("dst"))
        .union(cp.select(F.col("pnode").alias("src"), F.col("cnode").alias("dst")))
        .distinct()
        .repartition(F.col("src"))
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("label"))
        .localCheckpoint(eager=True)
    )
    for r in range(1, ROUNDS + 1):
        lab = labels.select(F.col("node").alias("__n"), F.col("label").alias("__l"))
        nxt = (
            edges.join(lab, edges["src"] == lab["__n"])
            .groupBy(F.col("dst").alias("node"), F.col("__l").alias("lab"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy("node")
            .agg(F.max(F.struct(F.col("cnt"), F.col("lab"))).alias("m"))
            .select("node", F.col("m.lab").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            nxt.alias("n")
            .join(labels.alias("p"), "node")
            .filter(F.col("n.label") != F.col("p.label"))
            .count()
        )
        print(f"round {r}: changed={changed}")
        labels = nxt
        if changed == 0:
            print(f"fixpoint at round {r}")
            break


if __name__ == "__main__":
    main()
