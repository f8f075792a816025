"""Inspect CLI: table health from the shell with NO Spark session.

The DataFrame inspect surface (`lake/inspect.py` — Iceberg
metadata-tables analogue) answers analytical questions at cluster scale;
this CLI answers the operator's shell questions ("how many snapshots,
how much compaction debt, which bucket is hot?") from pure metadata:
snapshot roots are O(num_buckets) JSON, manifests carry per-file stats,
and nothing here builds a DataFrame — like ``refs_cli``, it returns in
driver milliseconds against any table size.

Run::

    python -m orientdb_neo4j_importer_plugin_spark.inspect_cli \
        --table /lake/primary snapshots
    python -m ... --table /lake/primary partitions [--version N]
    python -m ... --table /lake/primary files --bucket 3 [--version N]

Completes the ops quartet: ``cli`` (ingest), ``mirror_cli``
(replication), ``maintain_cli`` (maintenance), ``refs_cli`` +
``inspect_cli`` (metadata). Reference analogue: the importer's printed
per-phase counters (``ONeo4jImporter.java:432-501``), made queryable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from .lake import SnapshotTable
from .lake.table import read_table_pointer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cdc-inspect",
        description="snapshot / partition / file metadata (no Spark)",
    )
    p.add_argument("--table", required=True, help="snapshot table root")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("snapshots", help="retained versions with pins and ledger sizes")
    pt = sub.add_parser("partitions", help="per-bucket file/row rollup")
    pt.add_argument("--version", type=int, default=None)
    f = sub.add_parser("files", help="per-file stats of one bucket")
    f.add_argument("--bucket", type=int, required=True)
    f.add_argument("--version", type=int, default=None)
    return p


def _snapshots(table: SnapshotTable) -> dict:
    pointed = read_table_pointer(table.root)
    versions = sorted(
        v
        for v in (
            int(n[1:9])
            for n in os.listdir(table.meta_dir)
            if n.startswith("v") and n.endswith(".json")
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
        snap = table.snapshot_at(v)
        last = snap.lineage[-1] if snap.lineage else {}
        rows.append(
            {
                "version": v,
                "parent": snap.parent,
                "committed_at": snap.committed_at or None,
                "num_buckets": snap.num_buckets,
                "n_batches": len(snap.ledger),
                "last_batch_id": (
                    str(last["batch_id"])
                    if last.get("batch_id") is not None
                    else None
                ),
                "pinned_by": sorted(pins.get(v, [])),
                "is_current": v == pointed,
            }
        )
    return {"snapshots": rows}


def _stats_of(table: SnapshotTable, snap) -> dict:
    # manifests were resolved by snapshot_at; their stats now sit in the
    # table's stats cache keyed by file path
    return table._stats_cache


def _partitions(table: SnapshotTable, snap) -> dict:
    stats = _stats_of(table, snap)
    rows = []
    for b in sorted(set(snap.buckets) | set(snap.deltas), key=int):
        base = snap.buckets.get(b, [])
        deltas = snap.deltas.get(b, [])
        n_rows = delta_rows = 0
        size = 0
        known = True
        for f in base + deltas:
            r = (stats.get(f) or {}).get("rows")
            if r is None:
                known = False
            else:
                n_rows += r
                if f in deltas:
                    delta_rows += r
            try:
                size += os.path.getsize(f)
            except OSError:
                pass
        rows.append(
            {
                "bucket": int(b),
                "n_base_files": len(base),
                "n_delta_files": len(deltas),
                "rows": n_rows if known else None,
                "delta_rows": delta_rows if known else None,
                "size_bytes": size,
            }
        )
    return {"version": snap.version, "partitions": rows}


def _files(table: SnapshotTable, snap, bucket: int) -> dict:
    stats = _stats_of(table, snap)
    rows = []
    for kind, files in (
        ("base", snap.buckets.get(str(bucket), [])),
        ("delta", snap.deltas.get(str(bucket), [])),
    ):
        for f in files:
            st = stats.get(f) or {}
            try:
                size = os.path.getsize(f)
            except OSError:
                size = None
            rows.append(
                {
                    "kind": kind,
                    "path": f,
                    "size_bytes": size,
                    "rows": st.get("rows"),
                    "lsn_min": st.get("lsn_min"),
                    "lsn_max": st.get("lsn_max"),
                    "tombstones": st.get("tombstones"),
                    "key_min": st.get("key_min"),
                    "key_max": st.get("key_max"),
                    "has_key_bloom": "key_bloom" in st,
                }
            )
    return {"version": snap.version, "bucket": bucket, "files": rows}


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not SnapshotTable.exists(args.table):
        raise SystemExit(f"table not found: {args.table}")
    # spark=None: every subcommand is metadata-only (refs_cli pattern)
    table = SnapshotTable.load(None, args.table)
    out: dict = {"table": args.table, "cmd": args.cmd}
    if args.cmd == "snapshots":
        out.update(_snapshots(table))
    else:
        version = getattr(args, "version", None)
        snap = (
            table.snapshot_at(version) if version is not None else table.current()
        )
        if args.cmd == "partitions":
            out.update(_partitions(table, snap))
        else:
            out.update(_files(table, snap, args.bucket))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
