"""JDBC integration — S7 (query-pushdown scan) and S9 (staged DW
upsert) executed against a LIVE embedded database.

Apache Derby ships on the Spark classpath (derby-*.jar, present for
the Hive metastore), so the full wire path runs for real: Spark JDBC
writer → Derby tables → warehouse-side DELETE/DELETE/INSERT merge →
Spark JDBC reader with query pushdown. This is the executable form of
the reference's Synapse flow (/root/reference/main.py:252-271,
utils/load_functions.py:2-60) — same statement shapes, embedded
engine instead of a cloud DW.
"""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest

from fsc_etl_spark.sources.readers import read_jdbc_query
from fsc_etl_spark.sources.writers import ensure_jdbc_table, write_jdbc_staged_upsert

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_url():
    db = tempfile.mkdtemp(prefix="fsc_derby_") + "/db"
    return f"jdbc:derby:{db};create=true"


T0 = dt.datetime(2021, 1, 1)
T1 = dt.datetime(2021, 1, 2)


def test_staged_upsert_last_writer_wins(spark, derby_url):
    init = spark.createDataFrame(
        [(1, 10.0, T0), (2, 20.0, T0), (3, 30.0, T1)],
        "k long, val double, updated_at timestamp",
    )
    assert ensure_jdbc_table(spark, derby_url, "target", init.schema, DERBY_PROPS)
    (
        init.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "target")
        .option("driver", DERBY_PROPS["driver"])
        .option("truncate", "true")
        .mode("overwrite")
        .save()
    )

    # k=2 newer (must update), k=3 STALE (target must win), k=4 new.
    batch = spark.createDataFrame(
        [(2, 99.0, T1), (3, 77.0, T0), (4, 40.0, T1)],
        "k long, val double, updated_at timestamp",
    )
    stmts = write_jdbc_staged_upsert(
        batch, derby_url, "staging", "target", ["k"], "updated_at", properties=DERBY_PROPS
    )
    assert len(stmts) == 3 and stmts[-1].startswith("INSERT INTO target")

    out = read_jdbc_query(
        spark, derby_url, "SELECT k, val FROM target", properties=DERBY_PROPS
    )
    assert sorted((r[0], r[1]) for r in out.collect()) == [
        (1, 10.0),
        (2, 99.0),
        (3, 30.0),
        (4, 40.0),
    ]


def test_staged_upsert_idempotent_replay(spark, derby_url):
    """Replaying the same batch converges to the same state — the >=
    delta guard makes the DW merge safe under at-least-once delivery
    (what foreachBatch retries require of a sink)."""
    batch = spark.createDataFrame(
        [(2, 99.0, T1), (4, 40.0, T1)], "k long, val double, updated_at timestamp"
    )
    before = sorted(
        tuple(r)
        for r in read_jdbc_query(
            spark, derby_url, "SELECT k, val FROM target", properties=DERBY_PROPS
        ).collect()
    )
    write_jdbc_staged_upsert(
        batch, derby_url, "staging", "target", ["k"], "updated_at", properties=DERBY_PROPS
    )
    after = sorted(
        tuple(r)
        for r in read_jdbc_query(
            spark, derby_url, "SELECT k, val FROM target", properties=DERBY_PROPS
        ).collect()
    )
    assert after == before


def test_jdbc_query_pushdown_executes_in_engine(spark, derby_url):
    """The query= text runs inside Derby — only the aggregated result
    crosses the wire (the reference's max-key probe shape)."""
    out = read_jdbc_query(
        spark,
        derby_url,
        "SELECT MAX(k) AS max_k, COUNT(*) AS n FROM target",
        properties=DERBY_PROPS,
    )
    row = out.first()
    assert (row[0], row[1]) == (4, 4)


def test_partitioned_jdbc_read_parallel_and_equal(spark, derby_url):
    """The parallel JDBC scan must actually split into numPartitions
    concurrent range reads AND return exactly the single-connection
    result — including rows OUTSIDE the [lower, upper] stride bounds
    (they belong to the edge partitions, not nowhere)."""
    from fsc_etl_spark.sources.readers import read_jdbc_partitioned

    rows = [(i, float(i) / 7) for i in range(500)]
    df_in = spark.createDataFrame(rows, "ID bigint, VAL double")
    ensure_jdbc_table(
        spark, derby_url, "PART_READ_T", df_in.schema, properties=DERBY_PROPS
    )
    df_in.write.mode("append").jdbc(derby_url, "PART_READ_T", properties=DERBY_PROPS)
    # stride bounds deliberately INSIDE the data range: 0..499 data,
    # bounds 100..400 — rows outside must still appear
    df = read_jdbc_partitioned(
        spark,
        derby_url,
        "PART_READ_T",
        partition_column="ID",
        lower_bound=100,
        upper_bound=400,
        num_partitions=4,
        properties=DERBY_PROPS,
    )
    assert df.rdd.getNumPartitions() == 4
    got = {(r["ID"], r["VAL"]) for r in df.collect()}
    assert got == set(rows)
