"""Structural preflight invariant (VERDICT r8 Next-round #1).

Round 8 shipped its final 14 queries without a recorded end-of-round
``scripts/preflight.py`` PASS — everything proved green post-hoc, but
the r6 winnowing bug shipped through exactly that gap. This test makes
the gap mechanically visible: ``PREFLIGHT_PASS.json`` must exist, be a
FULL-mode pass, and its content fingerprint must match the current
working-tree functional surface (fsc_etl_spark/, tests/, scripts/,
__spark_entry__.py, bench.py — tracked AND untracked files). Any
functional edit after the recorded pass turns this red until the gate
is re-run.

The test is skipped inside preflight's own pytest invocation (the gate
sets SPARK_GRAFT_PREFLIGHT_RUNNING=1): the record is refreshed only
AFTER both surfaces pass, so requiring freshness mid-gate would be
circular. It collects last (zz) so `-x` development runs surface real
failures first.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT / "scripts"))


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_PREFLIGHT_RUNNING") == "1",
    reason="inside the preflight gate itself — the record is written after it passes",
)
def test_preflight_pass_record_is_fresh():
    from preflight import source_fingerprint

    record_path = REPO_ROOT / "PREFLIGHT_PASS.json"
    assert record_path.exists(), (
        "no PREFLIGHT_PASS.json — run `python scripts/preflight.py` before "
        "blessing a snapshot (VERDICT r8 invariant)"
    )
    record = json.loads(record_path.read_text())
    assert record.get("mode") == "full", (
        "last recorded preflight was --quick; the snapshot gate requires the "
        "full sf0.01 sweep"
    )
    current = source_fingerprint()
    assert record.get("source_md5") == current, (
        "functional surface changed since the recorded preflight PASS "
        f"(recorded @ {record.get('commit_at_pass', '?')[:9]} "
        f"{record.get('timestamp')}) — re-run `python scripts/preflight.py` "
        "before the snapshot commit"
    )
