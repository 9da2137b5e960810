"""Second-decade scale probe for ktruss_coparts (VERDICT r11 #2).

The r11 flag: 7.49× wall at 10× data — the surface's worst
first-decade ratio — with a cost model of rounds × O(m^1.5) triangle
enumeration where the ROUND COUNT itself grows with the real fixture
(3 at sf0.01 → 8 at sf0.1). This probe separates the two axes the
way the common_neighbors r11 probe did
(docs/scale_probe_r11_common_neighbors.json):

- **per-round work vs data** — key-offset replication of the sf0.01
  lineitem (100 disjoint copies; offsetting both l_orderkey and
  l_partkey keeps every copy's co-parts graph identical, so the peel
  converges in the SAME number of rounds and the wall ratio isolates
  the per-round exponent);
- **round growth vs data** — recorded, not extrapolated: executed
  rounds at sf0.01 / sf0.1 / x100 via the ktruss_support ``stats``
  hook, against the _KTRUSS_ROUNDS=16 bound (headroom math in
  plans/graph_ops.py).

Run on an IDLE host (the r11 probe's first x100 run was 70% inflated
by a concurrent sweep): python scripts/ktruss_probe.py
Writes docs/scale_probe_r12_ktruss.json.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from pyspark.sql import functions as F  # noqa: E402

from fsc_etl_spark.operators.graph import ktruss_support  # noqa: E402
from fsc_etl_spark.plans.graph_ops import _KTRUSS_K, _KTRUSS_ROUNDS  # noqa: E402
from fsc_etl_spark.session import get_spark  # noqa: E402
from fsc_etl_spark.sources.readers import read_parquet_table  # noqa: E402

SCRATCH = REPO_ROOT / ".ktruss_probe"
COPIES = 100
STRIDE = 10_000_000  # far above any sf0.01/sf0.1 key


def run_once(spark, sf_dir: str) -> tuple[float, int, int]:
    """Time the full ktruss_coparts pipeline (pair build -> peel ->
    histogram -> noop sink) and report (wall, executed_rounds,
    n_hist_rows)."""
    li = read_parquet_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    li2 = li.select(
        F.col("l_orderkey").alias("r_orderkey"),
        F.col("l_partkey").alias("r_partkey"),
    )
    t0 = time.perf_counter()
    pairs = (
        li.join(
            li2,
            (li["l_orderkey"] == li2["r_orderkey"])
            & (li["l_partkey"] < li2["r_partkey"]),
        )
        .select(F.col("l_partkey").alias("src"), F.col("r_partkey").alias("dst"))
        .distinct()
    )
    stats: dict = {}
    truss = ktruss_support(pairs, k=_KTRUSS_K, rounds=_KTRUSS_ROUNDS, stats=stats)
    hist = truss.groupBy("sup").agg(F.count(F.lit(1)).alias("n_edges"))
    n = hist.count()
    return time.perf_counter() - t0, stats["rounds"], n


def build_x100(spark, base: str) -> str:
    out = SCRATCH / "x100"
    if out.exists():
        shutil.rmtree(out)
    li = read_parquet_table(spark, base, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    copies = [
        li.select(
            (F.col("l_orderkey") + F.lit(i * STRIDE)).alias("l_orderkey"),
            (F.col("l_partkey") + F.lit(i * STRIDE)).alias("l_partkey"),
        )
        for i in range(COPIES)
    ]
    df = copies[0]
    for c in copies[1:]:
        df = df.unionAll(c)
    df.repartition(32).write.parquet(str(out / "lineitem.parquet"))
    return str(out)


def main() -> None:
    spark = get_spark(app_name="ktruss_probe")
    rec: dict = {"config": "local[32], shuffle.partitions=32, probe defaults"}

    wall1, rounds1, rows1 = run_once(spark, "/root/testdata/sf0.01")
    rec["x1_sf0.01"] = {"wall_s": round(wall1, 2), "rounds": rounds1, "hist_rows": rows1}
    print("x1", rec["x1_sf0.01"])

    wall10, rounds10, rows10 = run_once(spark, "/root/testdata/sf0.1")
    rec["x10_sf0.1"] = {
        "wall_s": round(wall10, 2),
        "rounds": rounds10,
        "hist_rows": rows10,
    }
    print("x10", rec["x10_sf0.1"])

    x100_dir = build_x100(spark, "/root/testdata/sf0.01")
    wall100, rounds100, rows100 = run_once(spark, x100_dir)
    rec["x100_offset_sf0.01"] = {
        "wall_s": round(wall100, 2),
        "rounds": rounds100,
        "hist_rows": rows100,
    }
    print("x100", rec["x100_offset_sf0.01"])

    import math

    rec["per_round_exponent_x100"] = round(
        math.log((wall100 / rounds100) / (wall1 / rounds1)) / math.log(COPIES), 3
    )
    rec["wall_exponent_x100"] = round(
        math.log(wall100 / wall1) / math.log(COPIES), 3
    )
    rec["bound"] = {"_KTRUSS_ROUNDS": _KTRUSS_ROUNDS}
    out = REPO_ROOT / "docs" / "scale_probe_r12_ktruss.json"
    out.write_text(json.dumps(rec, indent=1) + "\n")
    print("wrote", out)
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
