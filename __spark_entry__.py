"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship scan-agg (TPC-H Q1 shape) at
sf0.001. ``queries()`` exposes every implemented operator from
SURVEY.md §2 / §2.12 as (spark, sf_dir) -> DataFrame callables;
``oracle_sql()`` gives each one's DuckDB-runnable ANSI-SQL twin with
identical column names and final types (see plans/oracles.py for the
determinism rules: exact-decimal accumulation, explicit casts,
tie-broken orderings).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fsc_etl_spark.plans import (
    analytics,
    analytics_ext,
    analytics_more,
    streaming_queries,
    tpch_more,
    tpch_partsupp,
    training_data,
)
from fsc_etl_spark.plans.analytics_ext import EXT_ORACLES
from fsc_etl_spark.plans.analytics_more import MORE_ORACLES
from fsc_etl_spark.plans.oracles import ORACLES
from fsc_etl_spark.plans.oracles_training import TRAINING_ORACLES
from fsc_etl_spark.plans.streaming_queries import STREAMING_ORACLES
from fsc_etl_spark.plans.tpch_more import TPCH_ORACLES
from fsc_etl_spark.plans.tpch_partsupp import PARTSUPP_ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return analytics.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.12."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(analytics.QUERIES)
    out.update(analytics_ext.QUERIES)
    out.update(analytics_more.QUERIES)
    out.update(tpch_more.QUERIES)
    out.update(tpch_partsupp.QUERIES)
    out.update(training_data.QUERIES)
    out.update(streaming_queries.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry (keys without an
    oracle get the driver's weaker rows-only check)."""
    return {
        **ORACLES,
        **EXT_ORACLES,
        **MORE_ORACLES,
        **TPCH_ORACLES,
        **PARTSUPP_ORACLES,
        **TRAINING_ORACLES,
        **STREAMING_ORACLES,
    }
