"""Explicit schemas — no inference anywhere (SURVEY.md §1.2-1.3).

The reference reads every CSV as all-string with header names only
(``/root/reference/main.py:75-79``) and applies types later via a cast
manifest. We keep that two-phase model for the COVID pipeline (string
schemas below + ``functions.casting``), but make both phases explicit
StructTypes so runs are deterministic.

Also declares the schemas of the driver-generated synthetic tables
(/root/testdata, TESTDATA.md) so scans never rely on parquet footer
surprises and the streaming reader can attach a schema up front.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Synthetic analytics tables (TESTDATA.md) — parquet, used by queries()/bench
# ---------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

# events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) and
# TIMESTAMP(MICROS) across fixture generations. Spark's reader has no
# nanos type: the NANOS encoding must be scanned as long (with
# spark.sql.legacy.parquet.nanosAsLong) and converted to a microsecond
# TimestampType with exact integer division, while the MICROS encoding
# is a native Spark timestamp. readers.py sniffs the parquet footer and
# picks EVENTS (long ts) or EVENTS_TS (timestamp ts) accordingly —
# never assume one encoding.
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

# The same table with ts as a real timestamp — the scan schema for
# TIMESTAMP(MICROS) fixtures and for re-staged event files.
EVENTS_TS = T.StructType(
    [
        f if f.name != "ts" else T.StructField("ts", T.TimestampType())
        for f in EVENTS.fields
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# Event-type domain of the synthetic events table (stable; used by the
# pivot operator so the plan needs no extra distinct-values job).
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

# ---------------------------------------------------------------------------
# COVID pipeline source schemas (FIXTURES.md §1) — all-string on read,
# mirroring the reference's header-only CSV scans (main.py:75-79); the
# cast manifest in functions/casting.py applies target types afterwards.
# ---------------------------------------------------------------------------


def _string_schema(*cols: str) -> T.StructType:
    return T.StructType([T.StructField(c, T.StringType()) for c in cols])


OWID_COVID_DATA = _string_schema(
    "location",
    "iso_code",
    "date",
    "stringency_index",
    "population",
    "aged_65_older",
    "aged_70_older",
    "new_tests",
    "total_tests",
)

VACCINATIONS = _string_schema(
    "iso_code", "date", "total_vaccinations", "daily_vaccinations", "total_boosters"
)

HOSPITALIZATIONS = _string_schema("iso_code", "date", "indicator", "value")

EXCESS_MORTALITY = _string_schema("location", "date", "excess_proj_all_ages")

FULL_DATA = _string_schema(
    "location",
    "date",
    "new_cases",
    "new_deaths",
    "total_cases",
    "total_deaths",
    "weekly_cases",
    "weekly_deaths",
)

COVID_SOURCES: dict[str, T.StructType] = {
    "owid_covid_data": OWID_COVID_DATA,
    "vaccinations": VACCINATIONS,
    "hospitalizations": HOSPITALIZATIONS,
    "excess_mortality": EXCESS_MORTALITY,
    "full_data": FULL_DATA,
}

# Indicator domain of the hospitalizations long table (main.py:111-114) —
# declared up front so the pivot is a single-shuffle groupBy().pivot().
HOSP_INDICATORS = {
    "Daily hospital occupancy": "Daily_hospital_occupancy",
    "Daily ICU occupancy": "Daily_icu_occupancy",
    "Weekly new hospital admissions": "Weekly_new_hospital_admissions",
    "Weekly new ICU admissions": "Weekly_new_icu_admissions",
}

# ---------------------------------------------------------------------------
# Metrics_Fact golden output contract (docs/Metrics_Fact.xlsx via
# FIXTURES.md §2; assembly main.py:213-229). Year/Month/Is_updated are
# curated-layer partition/CDC columns dropped before the DW load.
# ---------------------------------------------------------------------------

METRICS_FACT = T.StructType(
    [
        T.StructField("_SK_METRICS_FACT", T.LongType()),
        T.StructField("_TF_LAST_UPDATE", T.TimestampType()),
        T.StructField("Location", T.StringType()),
        T.StructField("CodeISO", T.StringType()),
        T.StructField("Date", T.DateType()),
        T.StructField("New_cases", T.IntegerType()),
        T.StructField("New_deaths", T.IntegerType()),
        T.StructField("Total_cases", T.IntegerType()),
        T.StructField("Total_deaths", T.IntegerType()),
        T.StructField("Weekly_cases", T.IntegerType()),
        T.StructField("Weekly_deaths", T.IntegerType()),
        T.StructField("Daily_hospital_occupancy", T.DoubleType()),
        T.StructField("Daily_icu_occupancy", T.DoubleType()),
        T.StructField("Weekly_new_hospital_admissions", T.DoubleType()),
        T.StructField("Weekly_new_icu_admissions", T.DoubleType()),
        T.StructField("Total_vaccinations", T.IntegerType()),
        T.StructField("Daily_vaccinations", T.IntegerType()),
        T.StructField("Total_boosters_vaccinations", T.IntegerType()),
        T.StructField("New_tests", T.IntegerType()),
        T.StructField("Total_tests", T.IntegerType()),
        T.StructField("Projection_excess_death", T.DoubleType()),
        T.StructField("Stringency_index", T.DoubleType()),
        T.StructField("Population", T.IntegerType()),
        T.StructField("Aged_65_older_perc", T.IntegerType()),
        T.StructField("Aged_70_older_perc", T.IntegerType()),
        T.StructField("Year", T.IntegerType()),
        T.StructField("Month", T.StringType()),
        T.StructField("Is_updated", T.StringType()),
    ]
)
