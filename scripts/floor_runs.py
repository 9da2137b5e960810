"""Isolated min-of-3 floor table for the bench's top-10 queries
(VERDICT r11 #4).

The driver's single bench pass rides whatever the host is doing —
BENCH_r11 started at load1 6.0 and the whole graph family moved ±2 s
with zero plan changes. This script records the reproducible number:
each of the top-10 most expensive benched queries run 3× on an
otherwise-idle host (fresh cache per run, same session), reporting
the per-query MIN — the noise-floor convention BASELINE.md §c9+
already uses for like-for-like deltas. Paste the table into the
round's BASELINE.md §c{N} so per-query verdicts never ride one loaded
run.

Run (idle host): python scripts/floor_runs.py [name ...]
Defaults to the top-10 of the latest bench_full.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

RUNS = 3


def main() -> None:
    import __spark_entry__ as entrymod
    from fsc_etl_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    if not names:
        full = json.loads((REPO_ROOT / "bench_full.json").read_text())
        names = [
            k
            for k, _ in sorted(full["queries"].items(), key=lambda kv: -kv[1])[:10]
        ]
    spark = get_spark(app_name="floor_runs")
    queries = entrymod.queries()
    # warmup amortizes JVM/codegen startup (the bench convention)
    queries["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    rows: dict[str, dict] = {}
    for name in names:
        walls = []
        for _ in range(RUNS):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.perf_counter() - t0, 2))
        rows[name] = {"runs": walls, "floor": min(walls)}
        print(f"{name}: runs={walls} floor={min(walls)}")
    out = {
        "sf_dir": sf_dir,
        "load1_end": round(os.getloadavg()[0], 1),
        "floors": rows,
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
