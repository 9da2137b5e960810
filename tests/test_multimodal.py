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


# ---------------------------------------------------------------------------
# Real codec (imagecodec.py): PPM/BMP round trips + resize through Spark
# ---------------------------------------------------------------------------


def test_codec_roundtrips_and_resize_map():
    import numpy as np

    from fsc_etl_spark.operators.imagecodec import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
        encode_ppm,
        resize_bytes,
        resize_nearest,
        sniff,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(8, 12, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    assert (decode_bmp(encode_bmp(img)) == img).all()
    # odd width exercises the BMP 4-byte row-stride padding
    odd = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(odd)) == odd).all()
    # PPM comments in the header are legal
    assert (decode_ppm(b"P6\n# c\n12 8\n255\n" + img.tobytes()) == img).all()
    # exact nearest-neighbor index map src=(dst*src)//dst
    r = resize_nearest(img, 6, 4)
    assert (r == img[np.ix_([0, 2, 4, 6], [0, 2, 4, 6, 8, 10])]).all()
    # same-format re-encode, mime derived from magic
    out, mime = resize_bytes(encode_ppm(img), 6, 4)
    assert mime == "image/x-portable-pixmap" and (decode_ppm(out) == r).all()
    out, mime = resize_bytes(encode_bmp(img), 6, 4)
    assert mime == "image/bmp" and (decode_bmp(out) == r).all()
    assert resize_bytes(b"plain text, not an image", 6, 4) is None
    assert sniff(encode_ppm(img)) == "ppm" and sniff(encode_bmp(img)) == "bmp"


def test_resize_images_routes_real_formats_and_fallback(spark):
    import numpy as np

    from fsc_etl_spark.operators.imagecodec import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
        encode_ppm,
        resize_nearest,
    )
    from fsc_etl_spark.operators.multimodal import MEDIA_SCHEMA, resize_images

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(8, 12, 3), dtype=np.uint8)
    rows = [
        (1, "image", bytearray(encode_ppm(img)), "application/octet-stream", {}),
        (2, "image", bytearray(encode_bmp(img)), "application/octet-stream", {}),
        (3, "image", bytearray(b"opaque-bytes"), "application/octet-stream", {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in resize_images(media, 6, 4).collect()}
    want = resize_nearest(img, 6, 4)
    assert got[1]["mime"] == "image/x-portable-pixmap"
    assert (decode_ppm(bytes(got[1]["content"])) == want).all()
    assert got[2]["mime"] == "image/bmp"
    assert (decode_bmp(bytes(got[2]["content"])) == want).all()
    # unrecognized bytes keep the documented cycle-to-target fallback
    assert got[3]["mime"] == "application/octet-stream"
    assert len(got[3]["content"]) == 24


def test_frame_decode_pipeline_exact(spark, sf_smoke):
    """Raw concatenated-P6 video -> sample_frames slices exact frames
    -> decode_frames parses them: px_sum equals a local numpy decode of
    the same cycled-text construction."""
    from fsc_etl_spark.operators.multimodal import (
        decode_frames,
        documents_as_ppm_video,
        sample_frames,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(20)
    vids = documents_as_ppm_video(docs, width=8, height=4, n_frames=4)
    out = decode_frames(sample_frames(vids, n_frames=4))
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {(r["media_id"], r["frame_idx"]): r for r in out.collect()}
    assert len(got) == 4 * len(texts)
    for (mid, fidx), r in got.items():
        assert (r["width"], r["height"]) == (8, 4)
        t = texts[mid].encode()
        reps = -(-(96 + 4) // max(1, len(t)))
        cyc = (t * reps)
        assert r["px_sum"] == sum(cyc[fidx : fidx + 96])


def test_magic_false_positives_fall_back():
    """Bytes that merely START like PPM/BMP but fail header validation
    must fall back (None), not raise mid-batch."""
    from fsc_etl_spark.operators.imagecodec import resize_bytes

    for b in (b"P6 is a great format honestly", b"BM" + b"x" * 60, b"P6\n2 2\n255\nab"):
        assert resize_bytes(b, 4, 4) is None


def test_wav_codec_roundtrip_and_chunk_walk():
    import numpy as np

    from fsc_etl_spark.operators.audiocodec import (
        analyze,
        decode_wav,
        downsample,
        encode_wav,
        sniff,
    )

    rng = np.random.default_rng(5)
    mono = rng.integers(-32768, 32768, size=300, dtype="<i2")
    data = encode_wav(mono, 8000)
    assert sniff(data)
    got, rate = decode_wav(data)
    assert rate == 8000 and (got[:, 0] == mono).all()
    # stereo interleave round trip
    stereo = rng.integers(-32768, 32768, size=(100, 2), dtype="<i2")
    got2, _ = decode_wav(encode_wav(stereo, 44100))
    assert (got2 == stereo).all()
    # extra RIFF chunk before data must be skipped (chunk walk)
    hdr_end = 36  # RIFF(12) + fmt(8+16)
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    patched = bytearray(data[:hdr_end] + extra + data[hdr_end:])
    patched[4:8] = (len(patched) - 8).to_bytes(4, "little")
    got3, _ = decode_wav(bytes(patched))
    assert (got3[:, 0] == mono).all()
    # 8-bit unsigned widens by centering
    eight = (
        b"RIFF" + (36 + 4).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
        + b"data" + (4).to_bytes(4, "little") + bytes([0, 128, 255, 64])
    )
    got4, _ = decode_wav(eight)
    assert got4[:, 0].tolist() == [(0 - 128) << 8, 0, (255 - 128) << 8, (64 - 128) << 8]
    # integer-exact analysis + decimation
    s = np.array([[100], [-200], [300], [-400], [500]], dtype="int64")
    st = analyze(s, 1000)
    assert st == {
        "n_frames": 5,
        "peak": 500,
        "energy": 100**2 + 200**2 + 300**2 + 400**2 + 500**2,
        "duration_us": 5000,
    }
    assert downsample(s, 2)[:, 0].tolist() == [100, 300, 500]


# ---------------------------------------------------------------------------
# Property tests: codec round trips over random shapes/content
# ---------------------------------------------------------------------------


def test_codec_roundtrip_properties():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from fsc_etl_spark.operators.audiocodec import decode_wav, encode_wav
    from fsc_etl_spark.operators.imagecodec import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
        encode_ppm,
        resize_nearest,
    )

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        seed=st.integers(0, 2**31 - 1),
    )
    def image_roundtrip(w, h, seed):
        img = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_ppm(encode_ppm(img)) == img).all()
        assert (decode_bmp(encode_bmp(img)) == img).all()
        # resize to own size is identity; resize output has exact shape
        assert (resize_nearest(img, w, h) == img).all()
        tw, th = max(1, w // 2), max(1, h // 3)
        assert resize_nearest(img, tw, th).shape == (th, tw, 3)

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(1, 500),
        ch=st.integers(1, 2),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def wav_roundtrip(n, ch, rate, seed):
        s = np.random.default_rng(seed).integers(-32768, 32768, size=(n, ch), dtype="<i2")
        got, got_rate = decode_wav(encode_wav(s, rate))
        assert got_rate == rate and (got == s).all()

    image_roundtrip()
    wav_roundtrip()


def test_codec_truncation_raises_cleanly():
    import numpy as np
    import pytest as _pytest

    from fsc_etl_spark.operators.audiocodec import decode_wav, encode_wav
    from fsc_etl_spark.operators.imagecodec import (
        decode_bmp,
        decode_ppm,
        encode_bmp,
        encode_ppm,
    )

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    for codec_bytes, decoder in (
        (encode_ppm(img), decode_ppm),
        (encode_bmp(img), decode_bmp),
    ):
        with _pytest.raises(ValueError):
            decoder(codec_bytes[:-5])
    with _pytest.raises(ValueError):
        decode_wav(encode_wav(np.zeros(4, dtype="<i2"))[:20])


def test_extract_features_real_decode_paths(spark):
    """Recognized formats must go through the REAL codecs: a P6 image
    reports its true dimensions/pixel sum, a WAV clip its true frame
    count/peak/rate; unknown bytes keep the deterministic fallback."""
    import numpy as np

    from fsc_etl_spark.operators.audiocodec import encode_wav
    from fsc_etl_spark.operators.imagecodec import encode_ppm

    img = np.arange(2 * 3 * 3, dtype="u1").reshape(2, 3, 3)  # h=2, w=3
    ppm = encode_ppm(img)
    samples = np.array([[100], [-200], [300]], dtype="<i2")
    wav = encode_wav(samples, 8000)
    rows = [
        (1, "image", bytearray(ppm), "image/x-portable-pixmap", {}),
        (2, "audio", bytearray(wav), "audio/wav", {}),
        (3, "image", bytearray(b"\x89PNG fake"), "image/png", {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert got[1] == [3.0, 2.0, float(int(img.sum()) % 1_000_003), 0.0]
    assert got[2] == [3.0, 300.0, float((100**2 + 200**2 + 300**2) % 1_000_003), 8000.0]
    n = len(b"\x89PNG fake")
    assert got[3] == [float(n), float(n % 256), float(sum(b"\x89PNG fake") % 997), 137.0]
