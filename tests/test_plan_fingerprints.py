"""Plan-regression fingerprint gate (VERDICT r11 #7).

Every benched query's physical-plan fingerprint (operator kinds +
exchange count + join strategies, normalized — see
fsc_etl_spark/planfp.py) must match the committed snapshot in
docs/plan_fingerprints.json. Catches the drift class the wall-clock
band hides: an accidental broadcast→shuffle flip, a lost
ReusedExchange, an extra exchange from a refactor.

When a plan change is INTENTIONAL: regenerate the snapshot with
``python scripts/gen_plan_fingerprints.py`` and let the JSON diff
document the change in review.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
SNAPSHOT = REPO_ROOT / "docs" / "plan_fingerprints.json"
SF_DIR = "/root/testdata/sf0.001"


def _bench_names() -> list[str]:
    import sys

    sys.path.insert(0, str(REPO_ROOT))
    from bench import BENCH_QUERIES

    return list(BENCH_QUERIES)


def test_snapshot_covers_exactly_the_benched_surface():
    """A query added to (or dropped from) BENCH_QUERIES without a
    snapshot regeneration fails here — the fingerprint file and the
    bench list move together."""
    snap = json.loads(SNAPSHOT.read_text())
    bench = set(_bench_names())
    assert set(snap) == bench, (
        f"snapshot/bench mismatch — regenerate: "
        f"missing={sorted(bench - set(snap))} "
        f"extra={sorted(set(snap) - bench)}"
    )


def test_plan_fingerprints_match_snapshot(spark):
    """Rebuild every benched query's plan at the pinned sf0.001 gate
    fixture and compare its normalized fingerprint to the committed
    snapshot. One shared session; plans are built (not executed)
    except for the documented eager builders."""
    import sys

    sys.path.insert(0, str(REPO_ROOT))
    import __spark_entry__ as entrymod
    from fsc_etl_spark.planfp import plan_fingerprint

    snap = json.loads(SNAPSHOT.read_text())
    queries = entrymod.queries()
    drift: list[str] = []
    for name in sorted(snap):
        spark.catalog.clearCache()
        got = plan_fingerprint(queries[name](spark, SF_DIR))
        want = snap[name]
        if got != want:
            diff_ops = {
                k: (want["ops"].get(k, 0), got["ops"].get(k, 0))
                for k in sorted(set(want["ops"]) | set(got["ops"]))
                if want["ops"].get(k, 0) != got["ops"].get(k, 0)
            }
            drift.append(
                f"{name}: ops(want,got)={diff_ops} "
                f"joins {want['joins']} -> {got['joins']}"
            )
    if drift:
        pytest.fail(
            "physical-plan drift vs docs/plan_fingerprints.json "
            "(if intentional, regenerate with "
            "scripts/gen_plan_fingerprints.py):\n" + "\n".join(drift)
        )
