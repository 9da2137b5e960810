"""Pre-snapshot gate (VERDICT r6 Next-round #2): refuse to bless a
round snapshot unless BOTH verification surfaces are green —

  1. ``pytest tests/`` — the full suite, including every independent
     (non-twin) reference reimplementation test;
  2. the full vanilla sf0.01 oracle sweep — every ``queries()`` entry
     run against its DuckDB oracle on a fresh session, exactly the
     driver's correctness gate.

Context: round 6's ``winnow_fingerprints`` shipped in the end-of-round
snapshot commit with a frame-mixing bug; its twin oracle hash-matched
the bug, and its independent pytest (which fails deterministically)
had never been run. This script makes that class of ship impossible:
run it before the final commit of every round and record its one-line
verdict in BASELINE.md.

Run:  python scripts/preflight.py            (full gate, ~12 min)
      python scripts/preflight.py --quick    (pytest + sf0.001 sweep)

Exit 0 = safe to snapshot; exit 1 = DO NOT COMMIT, failures listed.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

# Anchor everything on the repo root so the gate is launchable from
# any cwd, and let the fixture root be overridden per machine
# (ADVICE r7: '.' + hardcoded /root/testdata made the gate cwd- and
# machine-dependent).
REPO_ROOT = Path(__file__).resolve().parents[1]
TESTDATA_ROOT = Path(
    os.environ.get("SPARK_GRAFT_TESTDATA_ROOT", "/root/testdata")
)
sys.path.insert(0, str(REPO_ROOT))

#: The functional surface covered by the PASS record: a commit that
#: changes any of these after the recorded pass is exactly the
#: "shipped ungated" class (VERDICT r8). Docs/records (BASELINE.md,
#: SURVEY.md, BENCH/CORRECTNESS files) are deliberately outside it —
#: recording the pass line itself must not invalidate the pass.
FUNCTIONAL_PATHS = (
    "fsc_etl_spark",
    "tests",
    "scripts",
    "__spark_entry__.py",
    "bench.py",
)


def source_fingerprint() -> str:
    """Content hash of the WORKING-TREE functional surface — tracked
    AND untracked-unignored files, so a brand-new query module cannot
    dodge the gate by never being git-added."""
    import hashlib

    proc = subprocess.run(
        # -z + NUL split (ADVICE r9): whitespace-splitting stdout would
        # shred a path containing a space into bogus entries and
        # silently corrupt the fingerprint the freshness gate compares.
        ["git", "ls-files", "-z", "--cached", "--others", "--exclude-standard", "--"]
        + list(FUNCTIONAL_PATHS),
        capture_output=True,
        text=True,
        cwd=str(REPO_ROOT),
        check=True,
    )
    h = hashlib.md5()
    for rel in sorted({p for p in proc.stdout.split("\0") if p}):
        p = REPO_ROOT / rel
        if not p.is_file():
            continue  # tracked but deleted in the worktree
        h.update(rel.encode())
        h.update(hashlib.md5(p.read_bytes()).hexdigest().encode())
    return h.hexdigest()


#: Evidence/record files the judge audits: a snapshot commit that
#: leaves any of these dirty makes the audit trail self-inconsistent
#: (VERDICT r9 hygiene: bench_full.json was modified-but-uncommitted
#: at judging time). Globs resolved against the repo root.
EVIDENCE_GLOBS = (
    "BENCH_r*.json",
    "CORRECTNESS_r*.json",
    "bench_full.json",
    "BASELINE.md",
    "PREFLIGHT_PASS.json",
    "docs/*.md",
    "docs/*.json",
)


def dirty_evidence_files() -> list[str]:
    """Tracked evidence files with uncommitted modifications."""
    proc = subprocess.run(
        ["git", "status", "--porcelain", "-z", "--"]
        + [str(g) for g in EVIDENCE_GLOBS],
        capture_output=True,
        text=True,
        cwd=str(REPO_ROOT),
    )
    return sorted(
        entry[3:]
        for entry in proc.stdout.split("\0")
        if entry and not entry.startswith("??")
    )


def write_pass_record(quick: bool, sweep_total: int, sf_dir: str) -> None:
    import json

    commit = subprocess.run(
        ["git", "rev-parse", "HEAD"],
        capture_output=True,
        text=True,
        cwd=str(REPO_ROOT),
    ).stdout.strip()
    dirty = dirty_evidence_files()
    if dirty:
        # Warning, not failure: the round's own bench/record refresh is
        # legitimately uncommitted WHILE the gate runs — the point is
        # that the snapshot committer sees the list and commits them.
        print(
            "[preflight] WARNING dirty evidence files (commit them with "
            f"the snapshot): {dirty}"
        )
    record = {
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
        "commit_at_pass": commit,
        "source_md5": source_fingerprint(),
        "mode": "quick" if quick else "full",
        "sweep_green": sweep_total,
        "sf_dir": sf_dir,
        "dirty_evidence_at_pass": dirty,
    }
    (REPO_ROOT / "PREFLIGHT_PASS.json").write_text(
        json.dumps(record, indent=1) + "\n"
    )
    print(f"[preflight] recorded PREFLIGHT_PASS.json @ {commit[:9]}")


def run_pytest() -> bool:
    t0 = time.time()
    env = dict(os.environ, SPARK_GRAFT_PREFLIGHT_RUNNING="1")
    proc = subprocess.run(
        # -m "": re-include the @pytest.mark.slow set that pytest.ini's
        # default profile deselects (r14) — the preflight gate runs the
        # FULL suite; only the round driver's window-bounded run uses
        # the default profile.
        [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=line", "-m", ""],
        capture_output=True,
        text=True,
        cwd=str(REPO_ROOT),
        env=env,
    )
    tail = "\n".join(proc.stdout.strip().splitlines()[-3:])
    print(f"[preflight] pytest ({time.time() - t0:.0f}s):\n{tail}")
    return proc.returncode == 0


def run_sweep(sf_dir: str) -> list[str]:
    import __spark_entry__ as entrymod

    from fsc_etl_spark.session import get_spark
    from fsc_etl_spark.testing import check_query

    spark = get_spark()
    failures: list[str] = []
    names = list(entrymod.queries())
    t0 = time.time()
    for i, name in enumerate(names, 1):
        try:
            check_query(spark, sf_dir, name)
        except Exception as exc:  # noqa: BLE001 — report every failure class
            failures.append(name)
            print(f"[preflight] FAIL {name}: {str(exc)[:300]}")
        if i % 25 == 0:
            print(
                f"[preflight] sweep {i}/{len(names)} "
                f"({time.time() - t0:.0f}s, {len(failures)} failed)"
            )
    print(
        f"[preflight] sweep done: {len(names) - len(failures)}/{len(names)} "
        f"green in {time.time() - t0:.0f}s at {sf_dir}"
    )
    return failures


def main() -> int:
    quick = "--quick" in sys.argv
    sf_dir = str(TESTDATA_ROOT / ("sf0.001" if quick else "sf0.01"))
    ok = run_pytest()
    sweep_failures = run_sweep(sf_dir)
    if ok and not sweep_failures:
        import __spark_entry__ as entrymod

        write_pass_record(quick, len(entrymod.queries()), sf_dir)
        print("[preflight] PASS — safe to snapshot")
        return 0
    print(
        f"[preflight] FAIL — pytest_green={ok}, "
        f"sweep_failures={sweep_failures} — DO NOT COMMIT THE SNAPSHOT"
    )
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
