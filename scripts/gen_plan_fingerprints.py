"""Regenerate docs/plan_fingerprints.json (VERDICT r11 #7).

One fingerprint per BENCHED query (bench.BENCH_QUERIES), taken at the
pinned sf0.001 gate fixture on the engine's own session defaults —
see fsc_etl_spark/planfp.py for what the fingerprint contains and
what it deliberately ignores. tests/test_plan_fingerprints.py fails
on any drift from this snapshot; when a plan change is INTENTIONAL,
re-run this script and let the JSON diff document the change in
review.

Run: python scripts/gen_plan_fingerprints.py   (~2-4 min)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

SF_DIR = "/root/testdata/sf0.001"
OUT = REPO_ROOT / "docs" / "plan_fingerprints.json"


def main() -> None:
    import __spark_entry__ as entrymod
    from bench import BENCH_QUERIES
    from fsc_etl_spark.planfp import plan_fingerprint
    from fsc_etl_spark.session import get_spark

    spark = get_spark(app_name="plan_fingerprints")
    queries = entrymod.queries()
    fps: dict[str, dict] = {}
    t0 = time.time()
    for i, name in enumerate(sorted(BENCH_QUERIES), 1):
        spark.catalog.clearCache()
        fps[name] = plan_fingerprint(queries[name](spark, SF_DIR))
        if i % 25 == 0:
            print(f"[planfp] {i}/{len(BENCH_QUERIES)} ({time.time() - t0:.0f}s)")
    OUT.write_text(json.dumps(fps, indent=1, sort_keys=True) + "\n")
    print(f"wrote {OUT} ({len(fps)} fingerprints, {time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
