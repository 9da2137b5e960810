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
