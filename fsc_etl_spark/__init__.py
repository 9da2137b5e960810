"""fsc_etl_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of the
reference ETL engine (FullStack-BigData-Covid-19/FSC-ETL, surveyed in
SURVEY.md): typed CSV/Parquet scans, a declarative casting manifest,
projection/filter/pivot operators, star-schema assembly via broadcast +
left-join chains, snapshot-diff CDC, surrogate-key assignment, and
merge/upsert sinks — plus the large-scale training-data extensions
(dedup, similarity search, text analysis, multimodal plumbing) a 100 TB
data pipeline needs.

Design principles (SURVEY.md §7):
- DataFrame/SQL everywhere; no RDD drops, no driver-side row loops.
- Let Catalyst/AQE optimize: declarative plans, broadcast hints for
  small dims, no ``coalesce(1)``, explicit schemas (no inference).
- Python UDFs only where built-ins genuinely cannot express the
  semantics, and then always Arrow-vectorized (pandas_udf / mapInPandas).
"""

__version__ = "0.1.0"

from fsc_etl_spark.session import get_spark  # noqa: F401
