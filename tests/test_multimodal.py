"""Multimodal plumbing: binary columns through Arrow-batched
mapInPandas with the stubbed decoder."""

from __future__ import annotations

from fsc_etl_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    FRAME_SCHEMA,
    MEDIA_SCHEMA,
    RESIZED_SCHEMA,
    documents_as_media,
    extract_features,
    resize_images,
    sample_frames,
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


def test_resize_fixes_output_size(spark):
    rows = [
        (1, "image", bytearray(b"abcdef"), "image/png", {}),
        (2, "image", bytearray(b""), "image/png", {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = resize_images(media, width=4, height=2)
    assert out.schema == RESIZED_SCHEMA
    got = {r["media_id"]: r for r in out.collect()}
    assert len(got[1]["content"]) == 8 and got[1]["width"] == 4 and got[1]["height"] == 2
    assert bytes(got[1]["content"]) == b"abcdefab"  # deterministic stub
    assert len(got[2]["content"]) == 8  # empty input still yields target size


def test_sample_frames_explodes_rows(spark):
    content = bytes(range(100))
    media = spark.createDataFrame(
        [(7, "video", bytearray(content), "video/mp4", {})], MEDIA_SCHEMA
    )
    frames = sample_frames(media, n_frames=4)
    assert frames.schema == FRAME_SCHEMA
    got = sorted(frames.collect(), key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in got] == [0, 1, 2, 3]
    assert [r["offset_bytes"] for r in got] == [0, 25, 50, 75]
    assert all(len(r["frame"]) == 25 for r in got)
    assert bytes(got[2]["frame"]) == content[50:75]


def test_documents_adapter_byte_lengths(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    feats = extract_features(documents_as_media(docs))
    joined = feats.join(docs, feats.media_id == docs.doc_id)
    # ASCII corpus: byte length == char count (n_chars column)
    bad = joined.filter("byte_len <> n_chars").count()
    assert bad == 0
