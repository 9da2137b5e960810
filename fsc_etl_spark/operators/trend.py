"""Per-group model fitting via batch ``applyInPandas``.

The one batch surface the engine hadn't exercised: grouped pandas
execution, where each group's full frame crosses to a Python worker as
Arrow batches and a vectorized numpy computation returns one row per
group. Used for per-entity trend fitting (OLS slope) — expressible in
SQL as ``regr_slope`` but genuinely nicer in numpy once the model
grows beyond a closed form, so this operator is the template for the
model-per-group family (per-user forecasters, per-domain quality
curves, per-source calibration).

Scale notes:
- the shuffle key is the group key; group frames must fit a worker's
  memory — fine for per-entity daily rollups (days/entity is small);
- inputs are REDUCED (groupBy day count) before crossing to Python,
  so Arrow moves one row per (entity, day), not raw events;
- inside the UDF everything is numpy float64; rows are sorted by the
  x column first so summation order — and therefore the float result
  — is deterministic for a given group's contents.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def group_trend_slope(
    grouped: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """OLS slope of y over x per group (one output row per key):
    ``slope = Σ(x-x̄)(y-ȳ) / Σ(x-x̄)²``, NULL when x has no variance —
    the exact contract of SQL ``REGR_SLOPE(y, x)``."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(x_col)
        x = pdf[x_col].to_numpy(dtype="float64")
        y = pdf[y_col].to_numpy(dtype="float64")
        xc = x - x.mean()
        den = float((xc * xc).sum())
        slope = float((xc * (y - y.mean())).sum() / den) if den > 0.0 else None
        return pd.DataFrame(
            {key_col: [pdf[key_col].iloc[0]], "slope": [slope], "n_points": [len(pdf)]}
        )

    return grouped.groupBy(key_col).applyInPandas(
        fit, schema=f"{key_col} long, slope double, n_points long"
    )
