"""Regenerate docs/QUERIES.md — the full query-surface index — from
the driver contract (__spark_entry__.queries() / oracle_sql()).

Run after adding or reordering queries: python scripts/gen_query_index.py
"""

from __future__ import annotations

import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import __spark_entry__ as entrymod

HEADER = """# Query surface index

Auto-generated from `__spark_entry__.queries()` / `oracle_sql()`
(`python scripts/gen_query_index.py`). Position = driver sample order
(the driver oracle-checks roughly the first 50 per round). "hash" =
full DuckDB value-hash oracle; "rows-only" = approximate/sketch query
checked for row count and schema only, by design.

| # | query | module | check |
|---|---|---|---|
"""


def main() -> None:
    q = entrymod.queries()
    oracles = entrymod.oracle_sql()
    rows = []
    for i, (name, fn) in enumerate(q.items()):
        mod = fn.__module__.replace("fsc_etl_spark.plans.", "")
        check = "hash" if name in oracles else "rows-only"
        rows.append(f"| {i} | `{name}` | {mod} | {check} |")
    out = ROOT / "docs" / "QUERIES.md"
    out.write_text(HEADER + "\n".join(rows) + "\n")
    print(f"wrote {out} ({len(rows)} queries)")


if __name__ == "__main__":
    main()
