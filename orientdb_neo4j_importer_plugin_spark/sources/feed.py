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

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..schema import CHANGE_EVENT, spark_type_for


def check_feed_dir(feed_dir: str) -> None:
    """Liveness check — the checkConnection analogue
    (``ONeo4jConnectionManager.java:77-90``)."""
    if not os.path.isdir(feed_dir):
        raise FileNotFoundError(f"change-feed directory not found: {feed_dir}")


def infer_feed_schema(
    spark: SparkSession,
    feed_dir: str,
    sample_files: int = 4,
    sample_lines: int = 200,
) -> StructType:
    """Schema inference for a JSON-lines WAL feed — the reference's
    sample-one-value rule (``ONeo4jImporterUtils.java:145-155``, default to
    STRING ``:308-309``) applied per column over a BOUNDED driver-side
    sample (first `sample_lines` lines of the first `sample_files` files —
    O(sample) IO, never a scan). CDC meta columns are pinned to their
    contract types (lsn LONG, op STRING); temporal values arrive as ISO
    strings and stay STRING here — the apply path casts them to the table's
    types (uncastable values quarantine, not crash).

    Columns added in files beyond the sample are missed until the stream is
    restarted with a re-inferred schema — the standard streaming-source
    restart discipline (same as open_feed_stream's explicit-schema note).
    """
    check_feed_dir(feed_dir)
    files = sorted(
        f
        for f in os.listdir(feed_dir)
        if f.endswith((".json", ".jsonl")) and not f.startswith((".", "_"))
    )[:sample_files]
    if not files:
        raise FileNotFoundError(f"no .json/.jsonl files in {feed_dir}")
    order: list[str] = []
    types: dict[str, object] = {}
    for fn in files:
        with open(os.path.join(feed_dir, fn)) as fh:
            for i, line in enumerate(fh):
                if i >= sample_lines:
                    break
                line = line.strip()
                if not line:
                    continue
                for k, v in json.loads(line).items():
                    if k not in types:
                        order.append(k)
                        types[k] = None
                    if types[k] is None and v is not None:
                        types[k] = spark_type_for(v)
    pinned = {"lsn": LongType(), "op": StringType()}
    return StructType(
        [
            StructField(k, pinned.get(k, types[k] or StringType()), True)
            for k in order
        ]
    )


def read_feed(
    spark: SparkSession,
    feed_dir: str,
    schema: StructType | None = CHANGE_EVENT,
    fmt: str = "parquet",
) -> DataFrame:
    """Batch read of the whole feed (replay / backfill path).
    fmt="jsonl" with schema=None infers the schema from a bounded sample."""
    check_feed_dir(feed_dir)
    if fmt in ("json", "jsonl") and schema is None:
        schema = infer_feed_schema(spark, feed_dir)
    reader = spark.read.schema(schema)
    if fmt == "parquet":
        return reader.parquet(feed_dir)
    if fmt in ("json", "jsonl"):
        return reader.json(feed_dir)
    raise ValueError(f"unsupported feed format: {fmt}")


def open_feed_stream(
    spark: SparkSession,
    feed_dir: str,
    schema: StructType | None = CHANGE_EVENT,
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
    if fmt in ("json", "jsonl") and schema is None:
        schema = infer_feed_schema(spark, feed_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if fmt == "parquet":
        return reader.parquet(feed_dir)
    if fmt in ("json", "jsonl"):
        return reader.json(feed_dir)
    raise ValueError(f"unsupported feed format: {fmt}")
