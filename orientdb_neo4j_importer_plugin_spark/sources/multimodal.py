"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` (the sanctioned Python hot path — never per-row Python).

The decode step itself is STUBBED: this container has no image/audio
libraries, so ``decode_stub=True`` (default) produces a deterministic fake
(content-hash-derived dimensions) while keeping every piece of Spark-side
plumbing real and tested — schema, partitioning, UDF signature, Arrow batch
shape. Swap ``_decode_batch_stub`` for a real PIL/libav call on a cluster
that has them.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# media table schema: the binary column is opaque to the engine; metadata is
# typed and queryable (partition/prune on it).
MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("source_uri", StringType(), True),
    ]
)

MEDIA_FEATURES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("content_sha1", StringType(), True),
        StructField("width", IntegerType(), True),  # fake-decoded (stub)
        StructField("height", IntegerType(), True),
        StructField("decoder", StringType(), False),
    ]
)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (content = patterned bytes)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("kind"),
            F.encode(
                F.concat(F.lit("media-payload-"), F.repeat(F.col("id").cast("string"), 32)),
                "utf-8",
            ).cast("binary").alias("content"),
            F.lit("application/octet-stream").alias("mime"),
            F.concat(F.lit("synthetic://"), F.col("id").cast("string")).alias(
                "source_uri"
            ),
        )
    )


def _decode_batch_stub(pdf: pd.DataFrame) -> pd.DataFrame:
    """DETERMINISTIC FAKE decode: dimensions derived from the content hash.
    Replace with a real decoder (PIL.Image.open etc.) where available."""
    out = pd.DataFrame()
    out["media_id"] = pdf["media_id"]
    out["kind"] = pdf["kind"]
    content = pdf["content"]
    out["n_bytes"] = content.map(lambda b: len(b) if b is not None else None).astype(
        "Int32"
    )
    sha = content.map(
        lambda b: hashlib.sha1(b).hexdigest() if b is not None else None
    )
    out["content_sha1"] = sha
    out["width"] = sha.map(
        lambda s: (int(s[:4], 16) % 1920) + 1 if s is not None else None
    ).astype("Int32")
    out["height"] = sha.map(
        lambda s: (int(s[4:8], 16) % 1080) + 1 if s is not None else None
    ).astype("Int32")
    out["decoder"] = "stub-sha1"
    return out


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas: each Arrow batch becomes one pandas frame; the decode runs
    vectorized per batch, never per row in Python. At scale, repartition on
    a size-balanced key first so batches are even (binary columns skew)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch_stub(pdf)

    return media.mapInPandas(run, schema=MEDIA_FEATURES)
