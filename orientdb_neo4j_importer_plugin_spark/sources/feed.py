"""Change-feed sources: batch and streaming readers over a WAL directory.

Reference analogue: the Bolt-session source management
(``ONeo4jConnectionManager.java:44-90``) and the sequential cursor scans
(``ONeo4jImporterVerticesAndEdgesMigrator.java:183-190``). Here the "source"
is a directory of immutable change-event files — parquet for the normal
path, JSON for schema-evolution feeds (new columns appear mid-stream and
the reader widens, mirroring lazy property creation,
``ONeo4jImporterUtils.java:124-285``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..schema import CHANGE_EVENT


def check_feed_dir(feed_dir: str) -> None:
    """Liveness check — the checkConnection analogue
    (``ONeo4jConnectionManager.java:77-90``)."""
    if not os.path.isdir(feed_dir):
        raise FileNotFoundError(f"change-feed directory not found: {feed_dir}")


def read_feed(
    spark: SparkSession,
    feed_dir: str,
    schema: StructType = CHANGE_EVENT,
    fmt: str = "parquet",
) -> DataFrame:
    """Batch read of the whole feed (replay / backfill path)."""
    check_feed_dir(feed_dir)
    reader = spark.read.schema(schema)
    if fmt == "parquet":
        return reader.parquet(feed_dir)
    if fmt == "json":
        return reader.json(feed_dir)
    raise ValueError(f"unsupported feed format: {fmt}")


def open_feed_stream(
    spark: SparkSession,
    feed_dir: str,
    schema: StructType = CHANGE_EVENT,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming tail of the feed directory.

    The explicit schema means files missing late-added columns (v1 events)
    null-fill them — the reader-side half of schema evolution. For brand-new
    columns not in `schema` yet, the CDC runner's evolve step widens the
    TABLE; restart the stream with the widened event schema to ingest them
    (same restart discipline as adding columns to any streaming source).
    """
    check_feed_dir(feed_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if fmt == "parquet":
        return reader.parquet(feed_dir)
    if fmt == "json":
        return reader.json(feed_dir)
    raise ValueError(f"unsupported feed format: {fmt}")
