"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns beside typed metadata; all
per-item work (decode, resize, feature-extract, frame-sample) runs as
Arrow-batched pandas iterators over ``mapInPandas`` — the only layer
of this engine where Python touches row data, and it does so in
columnar batches, never row-at-a-time.

The decode internals are STUBBED (this container ships no PIL/ffmpeg
— import-gated with a deterministic fallback) but the Spark-side
contract is real and tested: schemas, batch iteration, partitioning
behavior, and output column shapes are exactly what a real decoder
would use — swap ``_fake_decode`` for the real library call and
nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(content: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder's feature vector.

    Real implementation would be e.g. PIL.Image.open + model forward;
    neither is installed here, so we derive a stable 4-dim summary
    from the bytes themselves (keeps tests meaningful end-to-end).
    """
    try:
        import PIL.Image  # noqa: F401  (not in this container)

        raise NotImplementedError("real decoder path not wired in this environment")
    except ImportError:
        pass
    n = len(content)
    s = sum(content[:256])
    return [float(n), float(n % 256), float(s % 997), float(content[0] if n else 0)]


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Decode/feature-extract each media item via mapInPandas.

    Arrow streams ``content`` in columnar batches; each batch is
    processed vectorized-per-column in one Python call. At scale the
    input should be repartitioned so batches hold ~10-100 MB of media
    bytes (``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
    rows per batch).
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": content.map(len).astype("int64"),
                    "checksum": content.map(lambda b: sum(b) % 2**31).astype("int64"),
                    "feature": content.map(_fake_decode),
                }
            )

    return media.mapInPandas(process, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("offset_bytes", T.LongType()),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize every image to (width, height) — binary in, binary out.

    STUB transform (no PIL in this container): the output bytes are a
    deterministic function of input bytes and target size (truncate/
    cycle to width*height), standing in for ``PIL.Image.resize`` +
    re-encode. The Spark contract — binary column through an Arrow
    batch, new typed size metadata — is the real one.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = max(1, width * height)

        def fake_resize(b: bytes) -> bytes:
            if not b:
                return bytes(target)
            reps = -(-target // len(b))
            return (b * reps)[:target]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": pdf["content"].map(fake_resize),
                    "mime": pdf["mime"],
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(process, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int) -> DataFrame:
    """Sample ``n_frames`` evenly spaced frames per video — the
    row-exploding shape (one media row → n frame rows) every video
    pipeline needs.

    STUB decode (no ffmpeg): a "frame" is the fixed-size byte slice at
    the frame's offset, standing in for a real frame grab at an evenly
    spaced timestamp; offsets are computed exactly as a real sampler
    would place seek points.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "frame": [], "offset_bytes": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                size = len(content)
                chunk = max(1, size // max(1, n_frames))
                for i in range(n_frames):
                    off = min(i * chunk, max(0, size - 1))
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame"].append(bytes(content[off : off + chunk]))
                    out["offset_bytes"].append(off)
            yield pd.DataFrame(out)

    return media.mapInPandas(process, schema=FRAME_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as media content so the
    multimodal path has real data to chew on in this environment."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )
