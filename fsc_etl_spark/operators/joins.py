"""Join operators (SURVEY.md §2.3 J1-J3).

Scale posture:
- J1 dim joins get an explicit ``F.broadcast`` hint — the dims here
  (countries mapping, region/nation) are tiny relative to facts, and
  at 100 TB a broadcast-hash join removes the fact-side shuffle
  entirely. AQE would usually pick this anyway; the hint makes it
  deterministic.
- J2 star assembly is a chain of left joins on one composite key. All
  joins share the SAME key, so Spark shuffles the fact side once and
  reuses the exchange across the chain (verify: one Exchange per input,
  not per join, in the physical plan). For repeated runs over a stable
  lake layout, bucketing both sides by the key removes even that.
- J3 key-membership uses ``left_semi`` when only existence is needed —
  no payload duplication, no row multiplication on skewed keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | None = None,
    left_col: str | None = None,
    right_col: str | None = None,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Equi-join a fact frame to a small dimension (J1).

    Either ``on=[shared cols]`` or a ``left_col``/``right_col`` pair
    (the reference joins ``location == location_map``, main.py:102-103).
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    if on is not None:
        return fact.join(d, list(on), how)
    cond = fact[left_col] == d[right_col]
    return fact.join(d, cond, how)


def star_left_join(
    base: DataFrame,
    satellites: Sequence[DataFrame],
    on: Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Left-join chain assembling a wide fact row (J2, main.py:213-220).

    Every satellite must expose exactly the ``on`` columns plus its
    payload; the shared join key keeps one partitioning across the
    whole chain.
    """
    out = base
    for sat in satellites:
        out = out.join(sat, list(on), how)
    return out


def key_membership_join(
    df: DataFrame,
    keys: DataFrame,
    on: Sequence[str],
    keep_key_payload: bool = False,
) -> DataFrame:
    """Key-membership filter (J3, main.py:277).

    With ``keep_key_payload`` the reference's inner-join behavior is
    kept (it needs the DW-side ``_SK`` column); otherwise a left-semi
    join — cheaper, no duplication if ``keys`` is not unique.
    """
    if keep_key_payload:
        return df.join(keys, list(on), "inner")
    return df.join(keys, list(on), "left_semi")


def anti_join(df: DataFrame, other: DataFrame, on: Sequence[str]) -> DataFrame:
    """NOT EXISTS on the join key (used by the merge fallback, J6)."""
    return df.join(other, list(on), "left_anti")
