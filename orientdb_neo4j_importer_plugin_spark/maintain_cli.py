"""Maintenance CLI: one spark-submit-able pass of `SnapshotTable.maintain`
— the background job a real deployment schedules between (or alongside)
ingest batches (compact delta backlogs, vacuum expirable tombstones,
materialize pending row-level changelogs, expire old snapshots, vacuum
orphans; see `lake/table.maintain` for the safe sequencing).

Run::

    python -m orientdb_neo4j_importer_plugin_spark.maintain_cli \
        --table /lake/primary --expire-keep 32 --orphans-older-than 86400

or via ``spark-submit --py-files engine.zip maintain_cli.py ...``. The
completion of the ops trio: ``cli`` ingests, ``mirror_cli`` replicates,
``maintain_cli`` keeps both sides healthy. All steps are idempotent, so a
crashed pass is simply re-run.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

from .lake import SnapshotTable
from .session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cdc-maintain",
        description="PySpark CDC lake maintenance: one maintain() pass",
    )
    p.add_argument("--table", required=True, help="snapshot table root")
    p.add_argument("--master", default=None,
                   help="spark master (default local[$SPARK_GRAFT_CPUS])")
    p.add_argument("--compact-if-deltas", type=int, default=8, metavar="N",
                   help="compact buckets whose delta backlog reached N files")
    p.add_argument("--max-file-rows", type=int, default=None, metavar="N",
                   help="split compacted base files at N rows "
                        "(tight per-file key/column stats for skipping)")
    p.add_argument("--cluster-by", default=None, metavar="COL[,COL]",
                   help="sort-order-on-rewrite for compacted files "
                        "(comma-separated scan columns, e.g. ts)")
    p.add_argument("--no-changelog", action="store_true",
                   help="skip materializing pending row-level changelogs")
    p.add_argument("--changelog-workers", type=int, default=8)
    p.add_argument("--expire-keep", type=int, default=None, metavar="N",
                   help="expire snapshots, keeping the newest N")
    p.add_argument("--orphans-older-than", type=float, default=None,
                   metavar="SEC", help="vacuum unreferenced files older "
                   "than SEC seconds")
    p.add_argument("--tombstone-below-lsn", type=int, default=None,
                   metavar="LSN", help="vacuum tombstones below the "
                   "replication-lag low-watermark LSN (see SCALE.md "
                   "retention policy)")
    p.add_argument("--log-level", default="WARN")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=args.log_level)
    spark = get_spark(master=args.master, app_name="cdc-maintain")
    spark.sparkContext.setLogLevel(args.log_level)
    if not SnapshotTable.exists(args.table):
        raise SystemExit(f"table not found: {args.table}")
    table = SnapshotTable.load(spark, args.table)
    summary = table.maintain(
        compact_if_deltas=args.compact_if_deltas,
        max_file_rows=args.max_file_rows,
        changelog=not args.no_changelog,
        changelog_workers=args.changelog_workers,
        expire_keep_last=args.expire_keep,
        orphans_older_than_sec=args.orphans_older_than,
        tombstone_below_lsn=args.tombstone_below_lsn,
        cluster_by=(
            args.cluster_by.split(",") if args.cluster_by else None
        ),
    )
    summary["table_version"] = table.current().version
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
