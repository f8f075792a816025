"""Inspect surface: Iceberg metadata-tables analogue over SnapshotTable.

Iceberg exposes ``db.table$snapshots`` / ``$files`` / ``$partitions`` so
operators can query table health with plain SQL instead of spelunking
JSON. This module is that surface for our lake:

* :func:`snapshots_df` — one row per RETAINED version (driver-side walk
  of the ``v{N:08d}.json`` roots; bounded by ``expire_snapshots``, the
  same O(retained) walk ``snapshot_as_of`` already does).
* :func:`files_df` — one row per live data file of a snapshot, with the
  manifest-carried stats (rows, lsn span, tombstone presence, key
  bounds, bloom presence). Planned DISTRIBUTED: the input is one row
  per (bucket, manifest path) — O(num_buckets), exactly what the root
  metadata holds — and each executor parses its manifests and stats the
  files it names, so no file-level list ever materializes on the
  driver. At 100 TB with millions of files this is the only shape that
  works; it is also why Iceberg's own metadata tables are manifest
  scans, not catalog RPCs.
* :func:`partitions_df` — per-bucket rollup of ``files_df`` (file/row/
  byte counts split base vs delta): the compaction-debt dashboard for
  ``maintain()`` scheduling.

Reference analogue: the importer prints per-phase counts (imported
vertices/edges, index totals) as its only observability
(``ONeo4jImporter.java:432-501``); this surface is the queryable,
snapshot-versioned version of those counters for a continuously
ingesting table.
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .table import Snapshot, read_table_pointer

if TYPE_CHECKING:  # pragma: no cover
    from .table import SnapshotTable

_FILES_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("kind", StringType(), False),  # 'base' | 'delta'
        StructField("path", StringType(), False),
        StructField("size_bytes", LongType(), True),
        StructField("rows", LongType(), True),
        StructField("lsn_min", LongType(), True),
        StructField("lsn_max", LongType(), True),
        # True / False / NULL=unknown — the same three-valued contract the
        # maintenance pruner uses (never treat NULL as "no tombstones")
        StructField("tombstones", BooleanType(), True),
        StructField("key_min", StringType(), True),
        StructField("key_max", StringType(), True),
        StructField("has_key_bloom", BooleanType(), False),
        StructField("n_stat_cols", IntegerType(), False),
    ]
)


def _file_row(bucket: int, kind: str, path: str, stats: dict) -> tuple:
    st = stats.get(path) or {}
    try:
        size = os.path.getsize(path)
    except OSError:
        size = None
    km, kx = st.get("key_min"), st.get("key_max")
    return (
        bucket,
        kind,
        path,
        size,
        st.get("rows"),
        st.get("lsn_min"),
        st.get("lsn_max"),
        st.get("tombstones"),
        None if km is None else str(km),
        None if kx is None else str(kx),
        "key_bloom" in st,
        len(st.get("cols") or {}),
    )


def files_df(table: "SnapshotTable", snapshot: Snapshot | None = None) -> DataFrame:
    """One row per live data file of `snapshot` (default: current), with
    manifest stats. Distributed over manifests — one task parses one
    bucket's manifest and stats its files; the driver ships only the
    O(num_buckets) manifest path list it already holds in root metadata."""
    snap = snapshot or table.current()
    if snap.manifest_paths:
        items = [(int(b), p) for b, p in snap.manifest_paths.items()]
        inp = table.spark.createDataFrame(items, "bucket int, manifest string")

        def _parse(frames: Iterator) -> Iterator:
            import pandas as pd

            for pdf in frames:
                rows = []
                for bucket, mpath in zip(pdf["bucket"], pdf["manifest"]):
                    with open(mpath) as fh:
                        d = json.load(fh)
                    stats = d.get("stats", {})
                    for f in d.get("base", []):
                        rows.append(_file_row(int(bucket), "base", f, stats))
                    for f in d.get("deltas", []):
                        rows.append(_file_row(int(bucket), "delta", f, stats))
                yield pd.DataFrame(rows, columns=[f.name for f in _FILES_SCHEMA])

        return inp.repartition(min(len(items), 64)).mapInPandas(
            _parse, schema=_FILES_SCHEMA
        )
    # pre-manifest roots inline their file lists — bounded legacy path,
    # built driver-side from the already-parsed snapshot
    rows = []
    stats = table._stats_cache
    for b, files in snap.buckets.items():
        for f in files:
            rows.append(_file_row(int(b), "base", f, stats))
    for b, files in snap.deltas.items():
        for f in files:
            rows.append(_file_row(int(b), "delta", f, stats))
    return table.spark.createDataFrame(rows, _FILES_SCHEMA)


def partitions_df(
    table: "SnapshotTable", snapshot: Snapshot | None = None
) -> DataFrame:
    """Per-bucket rollup of :func:`files_df`: the compaction-debt view
    (delta file/row counts per bucket tell ``maintain()`` where MOR read
    amplification is accruing)."""
    return (
        files_df(table, snapshot)
        .groupBy("bucket")
        .agg(
            F.count("*").cast("int").alias("n_files"),
            F.sum(F.when(F.col("kind") == "base", 1).otherwise(0))
            .cast("int")
            .alias("n_base_files"),
            F.sum(F.when(F.col("kind") == "delta", 1).otherwise(0))
            .cast("int")
            .alias("n_delta_files"),
            F.sum("rows").alias("rows"),
            F.sum(F.when(F.col("kind") == "delta", F.col("rows")).otherwise(0))
            .alias("delta_rows"),
            F.sum("size_bytes").alias("size_bytes"),
            F.min("lsn_min").alias("lsn_min"),
            F.max("lsn_max").alias("lsn_max"),
        )
    )


_SNAPSHOTS_SCHEMA = StructType(
    [
        StructField("version", IntegerType(), False),
        StructField("parent", IntegerType(), True),
        StructField("committed_at", DoubleType(), True),
        StructField("num_buckets", IntegerType(), False),
        StructField("n_batches", IntegerType(), False),
        StructField("last_batch_id", StringType(), True),
        StructField("last_mode", StringType(), True),
        StructField("n_manifests", IntegerType(), False),
        StructField("pinned_by", StringType(), True),  # csv of ref names
        StructField("is_current", BooleanType(), False),
    ]
)


def snapshots_df(table: "SnapshotTable") -> DataFrame:
    """One row per retained version ≤ the pointer (Iceberg ``$snapshots``
    / ``$history`` analogue). Driver-side: O(retained versions) JSON
    reads, the bound ``expire_snapshots`` maintains; orphan claims ahead
    of the pointer are excluded exactly as expiry excludes them."""
    pointed = read_table_pointer(table.root)
    versions = sorted(
        v
        for v in (
            int(f[1:9])
            for f in os.listdir(table.meta_dir)
            if f.startswith("v") and f.endswith(".json")
        )
        if v <= pointed
    )
    refs = table.refs()
    pins: dict[int, list[str]] = {}
    for name, v in refs["tags"].items():
        pins.setdefault(v, []).append(f"tag:{name}")
    for name, b in refs["branches"].items():
        pins.setdefault(b["base_version"], []).append(f"branch:{name}")
    rows = []
    for v in versions:
        snap = Snapshot.from_json(
            open(os.path.join(table.meta_dir, f"v{v:08d}.json")).read()
        )
        last = snap.lineage[-1] if snap.lineage else {}
        bid = last.get("batch_id")
        rows.append(
            (
                snap.version,
                snap.parent,
                float(snap.committed_at) if snap.committed_at else None,
                snap.num_buckets,
                len(snap.ledger),
                str(bid) if bid is not None else None,
                last.get("mode"),
                len(snap.manifest_paths),
                ",".join(sorted(pins[v])) if v in pins else None,
                v == pointed,
            )
        )
    return table.spark.createDataFrame(rows, _SNAPSHOTS_SCHEMA)
