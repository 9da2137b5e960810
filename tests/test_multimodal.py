"""Multimodal plumbing: binary columns through Arrow-batched
mapInPandas with the stubbed decoder."""

from __future__ import annotations

from fsc_etl_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    documents_as_media,
    extract_features,
)


def test_media_roundtrip_schema(spark):
    rows = [
        (1, "image", bytearray(b"\x89PNG fake"), "image/png", {"w": "2"}),
        (2, "audio", bytearray(b""), "audio/wav", {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media)
    assert feats.schema == FEATURE_SCHEMA
    got = {r["media_id"]: r for r in feats.collect()}
    assert got[1]["byte_len"] == 9
    assert got[1]["checksum"] == sum(b"\x89PNG fake")
    assert len(got[1]["feature"]) == 4
    assert got[2]["byte_len"] == 0 and got[2]["checksum"] == 0


def test_documents_adapter_byte_lengths(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    feats = extract_features(documents_as_media(docs))
    joined = feats.join(docs, feats.media_id == docs.doc_id)
    # ASCII corpus: byte length == char count (n_chars column)
    bad = joined.filter("byte_len <> n_chars").count()
    assert bad == 0
