"""Declarative cast manifest (SURVEY.md §1.2).

Reproduces the semantics of the reference's ``cast_types``
(``/root/reference/utils/transform_functions.py:29-48``) applied to its
manifest (``/root/reference/main.py:119-123``):

- ``Decimal2`` — ``round(cast(double), 2)``: a double rounded
  HALF_UP to 2 places, NOT a fixed-point decimal (the xlsx spec says
  Decimal(21,2) but the code uses round-on-double; we keep the code's
  behavior for value parity and note the difference here);
- ``Decimal1`` — ``round(cast(double), 1)``;
- ``Integer`` — ``cast(int)``, silently null on non-numeric input;
- ``Date``    — explicit ``to_date(col, fmt)``; the reference relies on
  a global LEGACY time-parser policy (``extract_functions.py:61``) +
  plain cast — an explicit format is deterministic and needs no global
  session flag.

Like the reference, the manifest is defensive: entries whose column is
absent from the frame are skipped, so one manifest serves many
differently-shaped frames (``transform_functions.py:34``).

All casts are single Catalyst expressions — one ``select`` pass, fully
inside whole-stage codegen; nothing here touches Python at runtime.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DATE_FORMAT_DEFAULT = "yyyy-MM-dd"


@dataclass(frozen=True)
class CastSpec:
    """One manifest entry: column name + target type tag.

    ``date_format`` may be a single pattern or an ordered tuple of
    fallback patterns — the deterministic replacement for the
    reference's global LEGACY time-parser policy
    (``extract_functions.py:61``), which silently accepted several
    spellings: here each accepted spelling is DECLARED, tried in
    order, and anything else is null (try_to_date), with no global
    session flag.
    """

    column: str
    type_tag: str  # Decimal2 | Decimal1 | Integer | Date | String
    date_format: str | tuple[str, ...] = DATE_FORMAT_DEFAULT

    def expr(self) -> Column:
        # try_cast / try_to_date, not plain cast: Spark 4 defaults to
        # ANSI mode where cast-on-malformed THROWS; the reference's
        # semantics (transform_functions.py:40-43 under non-ANSI 3.x)
        # are silent-null. try_* reproduces that independent of the
        # session's spark.sql.ansi.enabled setting.
        c = F.col(self.column)
        tag = self.type_tag
        if tag == "Decimal2":
            return F.round(c.try_cast("double"), 2)
        if tag == "Decimal1":
            return F.round(c.try_cast("double"), 1)
        if tag == "Integer":
            return c.try_cast("int")
        if tag == "Date":
            fmts = (
                (self.date_format,)
                if isinstance(self.date_format, str)
                else tuple(self.date_format)
            )
            return F.coalesce(*[F.try_to_date(c, f) for f in fmts])
        if tag == "String":
            return c.cast("string")
        raise ValueError(f"unknown cast tag {tag!r} for column {self.column!r}")


def cast_types(df: DataFrame, manifest: list[tuple[str, str]] | list[CastSpec]) -> DataFrame:
    """Apply a cast manifest; silently skip columns the frame lacks."""
    specs = [s if isinstance(s, CastSpec) else CastSpec(*s) for s in manifest]
    present = set(df.columns)
    exprs: list[Column] = []
    by_name = {s.column: s for s in specs if s.column in present}
    for name in df.columns:
        spec = by_name.get(name)
        exprs.append(spec.expr().alias(name) if spec else F.col(name))
    return df.select(*exprs)


# The reference's shared manifest (main.py:119-123), reused verbatim
# across all five COVID sources thanks to the skip-if-absent rule.
COVID_CAST_MANIFEST: list[tuple[str, str]] = [
    ("date", "Date"),
    ("stringency_index", "Decimal1"),
    ("population", "Integer"),
    ("aged_65_older", "Integer"),
    ("aged_70_older", "Integer"),
    ("new_tests", "Integer"),
    ("total_tests", "Integer"),
    ("total_vaccinations", "Integer"),
    ("daily_vaccinations", "Integer"),
    ("total_boosters", "Integer"),
    ("value", "Decimal2"),
    ("excess_proj_all_ages", "Decimal2"),
    ("new_cases", "Integer"),
    ("new_deaths", "Integer"),
    ("total_cases", "Integer"),
    ("total_deaths", "Integer"),
    ("weekly_cases", "Integer"),
    ("weekly_deaths", "Integer"),
]
