"""Column hygiene helpers (SURVEY.md §2.8 F8-F10).

The reference renames columns one at a time in a loop
(``/root/reference/utils/transform_functions.py:2-6``) and normalizes
header case by rebuilding every column name
(``transform_functions.py:8-24``). Both are metadata-only operations;
here they are single-pass (one ``withColumnsRenamed`` / one ``toDF``)
so the logical plan stays shallow.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame


def rename_columns(df: DataFrame, mapping: Sequence[tuple[str, str]] | dict[str, str]) -> DataFrame:
    """Bulk rename (F9). ``mapping`` is old→new."""
    pairs = dict(mapping if isinstance(mapping, dict) else dict(mapping))
    return df.withColumnsRenamed(pairs)


def uppercase_first_letter_cols(df: DataFrame, columns: Iterable[str] | None = None) -> DataFrame:
    """Leading-uppercase every (or the given) column name (F10)."""
    targets = set(columns) if columns else None
    new = [c[:1].upper() + c[1:] if (targets is None or c in targets) and c else c for c in df.columns]
    return df.toDF(*new)


def lowercase_first_letter_cols(df: DataFrame, columns: Iterable[str] | None = None) -> DataFrame:
    """Leading-lowercase every (or the given) column name (F10)."""
    targets = set(columns) if columns else None
    new = [c[:1].lower() + c[1:] if (targets is None or c in targets) and c else c for c in df.columns]
    return df.toDF(*new)


def fill_zero(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """``na.fill(0)`` (F8): the engine's "missing metric = 0" rule,
    equivalent to the ``coalesce(x, 0)`` ETL rules in the reference's
    Metrics_Fact.xlsx spec (SURVEY.md §1.2)."""
    return df.na.fill(0, subset=list(columns) if columns else None)
