"""Plan audit: scan every batch query's physical plan for scale
anti-patterns and print one line per finding.

Checks (same invariants tests/test_plan_quality.py pins for the
parametrized set, here over the WHOLE surface in one pass):
- CartesianProduct        — unkeyed shuffle cross join (always a bug);
- BatchEvalPython         — row-at-a-time Python in a plan;
- BroadcastNestedLoopJoin — reported for review; legitimate only when
  the broadcast side is a scalar/contract-small frame (avg subqueries,
  share fractions, bloom/total scalars);
- Coalesce 1              — the reference's forced single-task write.

Run: python scripts/plan_audit.py   (~60-90 s, sf0.001 plans only)
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fsc_etl_spark.session import get_spark

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
HARD = ("CartesianProduct", "BatchEvalPython", "Coalesce 1")
REVIEW = ("BroadcastNestedLoopJoin",)


def main() -> int:
    spark = get_spark(app_name="plan_audit")
    bad = 0
    for name, fn in entrymod.queries().items():
        if name.startswith("streaming"):
            continue  # streaming plans materialize through run_to_memory
        try:
            df = fn(spark, SF)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as ex:  # noqa: BLE001
            print(f"ERR    {name}: {str(ex)[:120]}")
            bad += 1
            continue
        for marker in HARD:
            if marker in plan:
                print(f"FAIL   {name}: {marker}")
                bad += 1
        for marker in REVIEW:
            if marker in plan:
                print(f"review {name}: {marker} (OK iff scalar broadcast)")
    print(f"audit complete: {bad} hard failures")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
