"""S1-S4/S11 ingest utilities — driven with file:// URLs (no network)."""

from __future__ import annotations

import datetime as dt
import os
import pathlib

from fsc_etl_spark.sources.ingest import (
    archive_snapshot,
    download_file,
    download_files,
    fetch_distributed,
    get_parameter,
    get_raw_paths,
    get_secret_parameter,
)


def _src_files(tmp_path) -> tuple[str, list[str]]:
    src = tmp_path / "remote"
    src.mkdir()
    names = ["a.csv", "b.csv"]
    for n in names:
        (src / n).write_text(f"col\n{n}\n")
    return src.as_uri(), names


def test_download_is_idempotent(tmp_path):
    base, names = _src_files(tmp_path)
    dest = str(tmp_path / "local" / "a.csv")
    assert download_file(f"{base}/a.csv", dest) is True
    assert pathlib.Path(dest).read_text() == "col\na.csv\n"
    assert download_file(f"{base}/a.csv", dest) is False  # skip, like the reference


def test_download_files_and_paths(tmp_path):
    base, names = _src_files(tmp_path)
    dest = str(tmp_path / "local")
    paths = download_files(base, names, dest)
    assert [os.path.basename(p) for p in paths] == names
    raws = get_raw_paths(["sub/a.csv", "b.csv"], "/mnt/raw")
    assert raws[0] == {"filename": "a.csv", "rawpath": "/mnt/raw/sub/a.csv"}


def test_archive_rotation(tmp_path):
    base, names = _src_files(tmp_path)
    local = str(tmp_path / "local")
    download_files(base, names, local)
    last = str(tmp_path / "last")

    d1 = archive_snapshot(local, str(tmp_path / "arch"), dt.date(2021, 3, 1), last_dir=last)
    assert d1.endswith("2021/03/01")
    assert sorted(os.listdir(last)) == names

    # Next day's rotation replaces last/ and keeps the dated archive.
    (pathlib.Path(local) / "a.csv").write_text("col\nNEW\n")
    archive_snapshot(local, str(tmp_path / "arch"), dt.date(2021, 3, 2), last_dir=last)
    assert (pathlib.Path(last) / "a.csv").read_text() == "col\nNEW\n"
    assert (pathlib.Path(d1) / "a.csv").read_text() == "col\na.csv\n"


def test_parameters_from_env(monkeypatch):
    monkeypatch.setenv("FULLMODE", "Y")
    monkeypatch.setenv("KV__DB_PASSWORD", "s3cret")
    assert get_parameter("FULLMODE") == "Y"
    assert get_parameter("MISSING", "N") == "N"
    assert get_secret_parameter("kv", "db_password") == "s3cret"


def test_fetch_distributed_over_executors(spark, tmp_path):
    base, names = _src_files(tmp_path)
    dest = str(tmp_path / "fanout")
    os.makedirs(dest)
    urls = spark.createDataFrame(
        [(n, f"{base}/{n}") for n in names], "name string, url string"
    ).repartition(2)
    res = {r["name"]: r for r in fetch_distributed(spark, urls, dest).collect()}
    assert set(res) == set(names)
    assert all(r["fetched"] for r in res.values())
    assert all(os.path.getsize(r["path"]) == r["bytes"] for r in res.values())
    # second pass: idempotent skip on every executor
    res2 = {r["name"]: r for r in fetch_distributed(spark, urls, dest).collect()}
    assert not any(r["fetched"] for r in res2.values())


def test_json_roundtrip_schema_first(spark, tmp_path, sf_smoke):
    """parquet → JSON-lines → schema-first read_json round-trips
    values and types (no inference pass)."""
    from fsc_etl_spark import schemas
    from fsc_etl_spark.sources.readers import read_json, read_parquet_table

    src = read_parquet_table(spark, sf_smoke, "nation")
    path = str(tmp_path / "nation_json")
    src.write.json(path)
    back = read_json(spark, path, schemas.NATION)
    assert back.schema == schemas.NATION
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_partitioned_sink_format_roundtrip(spark, tmp_path):
    """S8 sink is format-parametric: parquet, ORC (both native
    columnar formats), and JSON round-trip the same partitioned layout
    through the one writer path."""
    from pyspark.sql import functions as F

    from fsc_etl_spark.sources.writers import write_partitioned

    df = spark.createDataFrame(
        [(i, f"g{i % 3}", float(i) * 1.5) for i in range(30)], "id int, g string, v double"
    )
    readers = {
        "parquet": lambda p: spark.read.parquet(p),
        "orc": lambda p: spark.read.orc(p),
        "json": lambda p: spark.read.json(p),
    }
    import os

    for fmt, rd in readers.items():
        path = str(tmp_path / f"sink_{fmt}")
        write_partitioned(df, path, partition_by=["g"], mode="overwrite", fmt=fmt)
        assert sorted(e for e in os.listdir(path) if e.startswith("g=")) == [
            "g=g0", "g=g1", "g=g2",
        ]
        back = rd(path)
        got = sorted((int(r.id), r.g, float(r.v)) for r in back.collect())
        assert got == sorted((r.id, r.g, r.v) for r in df.collect()), fmt


def test_python_datasource_synth_docs(spark):
    """Custom Python DataSource: partitioned generation is
    deterministic, respects the partitions option, and matches the
    md5-derived content contract."""
    import hashlib

    from fsc_etl_spark.sources.pydatasource import register

    register(spark)
    df = (
        spark.read.format("fsc_synth_docs")
        .option("n", "200")
        .option("partitions", "4")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = {r.doc_id: (r.text, r.source) for r in df.collect()}
    assert len(rows) == 200
    h7 = hashlib.md5(b"doc:7").hexdigest()
    want = " ".join(h7[(j * 4) % 32 : (j * 4) % 32 + 4] for j in range(8))
    assert rows[7] == (want, "src2")
    again = {r.doc_id: (r.text, r.source) for r in
             spark.read.format("fsc_synth_docs").option("n", "200").option("partitions", "4").load().collect()}
    assert rows == again


def test_configure_object_store_env_and_overrides(spark, monkeypatch):
    from fsc_etl_spark.session import configure_object_store

    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "test-key")
    monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
    applied = configure_object_store(
        spark, "s3a", settings={"fs.s3a.endpoint.region": "us-east-1"}
    )
    assert "fs.s3a.access.key" in applied          # set env var applied
    assert "fs.s3a.secret.key" not in applied       # unset env var skipped
    assert "fs.s3a.endpoint.region" in applied      # explicit override applied
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.access.key") == "test-key"
    assert hconf.get("fs.s3a.endpoint.region") == "us-east-1"
