"""One-pass data-quality gates (the Great-Expectations/dbt-test shape
done Spark-natively).

Every rule compiles to a conditional aggregate column, so a report of
N rules over any table costs ONE scan + one partial/final hash
aggregate — no per-rule passes, no driver loop. At 100 TB that is the
only affordable way to run a rule pack; per-rule `df.filter(...)
.count()` loops re-scan the table N times.

Rules return Columns (not results), so they compose into
``dq_report`` (one-row report frame) or ``enforce`` (raise on
violation) and stay inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect_not_null(col: str) -> Column:
    """Violation count: rows where ``col`` is NULL."""
    return F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).cast("bigint")


def expect_unique(*cols: str) -> Column:
    """Violation count: rows beyond the first per key value
    (count - distinct count; 0 ⇔ the column set is a key). Single
    column counts non-null rows (SQL COUNT(col) semantics); composite
    keys count every row, so NULL-bearing keys register as
    duplicates rather than silently passing."""
    if len(cols) == 1:
        return (F.count(F.col(cols[0])) - F.countDistinct(F.col(cols[0]))).cast("bigint")
    return (F.count(F.lit(1)) - F.countDistinct(*[F.col(c) for c in cols])).cast("bigint")


def expect_in_set(col: str, allowed: Sequence[str]) -> Column:
    """Violation count: non-null values outside ``allowed``."""
    return F.sum(
        F.when(F.col(col).isNotNull() & ~F.col(col).isin(*allowed), 1).otherwise(0)
    ).cast("bigint")


def expect_between(col: str, lo, hi) -> Column:
    """Violation count: non-null values outside [lo, hi]."""
    return F.sum(
        F.when(
            F.col(col).isNotNull() & ((F.col(col) < lo) | (F.col(col) > hi)), 1
        ).otherwise(0)
    ).cast("bigint")


def dq_report(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """One-row report: total row count + one violation-count column
    per rule, computed in a single aggregate pass."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[col.alias(name) for name, col in rules.items()],
    )


def enforce(df: DataFrame, rules: Mapping[str, Column]) -> DataFrame:
    """Gate: raise ``ValueError`` naming every violated rule, else
    return ``df`` unchanged. One aggregate job either way."""
    row = dq_report(df, rules).collect()[0]
    violated = {name: row[name] for name in rules if row[name]}
    if violated:
        raise ValueError(f"data-quality violations: {violated}")
    return df
