"""CLI entry point — argparse mirror of the reference's command line.

Reference: ``ONeo4jImporterCommandLineParser`` (``:71-162``) with options
``-neo4jdbdir`` (mandatory source), ``-o`` overwrite, ``-i`` relationship
indexes, ``-logLevel``. Mapping:

    -neo4jdbdir  -> --feed-dir        (change-feed WAL directory)
    odbdir       -> --table           (target snapshot table root)
    -o           -> --overwrite       (drop + recreate target)
    -i           -> --row-lineage     (MOR mode keeps per-row __lsn lineage
                                       hot; cow compacts it into base files)
    -logLevel    -> --log-level

Run: ``python -m orientdb_neo4j_importer_plugin_spark.cli --feed-dir ... --table ...``
or via ``spark-submit --py-files engine.zip cli.py ...``.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

from .lake import SnapshotTable
from .schema import CHANGE_EVENT, CHANGE_EVENT_V1, TRANSCRIPTS, TRANSCRIPTS_V1
from .session import get_spark
from .sources.feed import check_feed_dir
from .streaming import CdcStreamRunner


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cdc-ingest",
        description="PySpark CDC ingest: change-feed WAL -> snapshot lake table",
    )
    p.add_argument("--feed-dir", required=True, help="change-feed directory (parquet)")
    p.add_argument("--table", required=True, help="target table root")
    p.add_argument("--checkpoint", required=True, help="streaming checkpoint dir")
    p.add_argument("--master", default=None, help="spark master (default local[$SPARK_GRAFT_CPUS])")
    p.add_argument("--overwrite", action="store_true", help="drop existing table (reference -o)")
    p.add_argument("--mode", choices=["cow", "mor"], default="cow")
    p.add_argument("--compact-every", type=int, default=0, metavar="N",
                   help="MOR: compact deltas every N batches")
    p.add_argument("--num-buckets", type=int, default=64)
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--late-drop-seconds", type=int, default=None)
    p.add_argument("--quarantine", action="store_true",
                   help="divert poison records to the dead-letter table "
                        "instead of failing the batch")
    p.add_argument("--schema", choices=["v1", "v2", "infer"], default="v2",
                   help="event schema version (v1 lacks the tool column; "
                        "'infer' samples a jsonl feed)")
    p.add_argument("--format", choices=["parquet", "jsonl", "debezium"],
                   default="parquet",
                   help="feed file format (jsonl supports --schema infer; "
                        "debezium = JSON-lines change-event envelopes)")
    p.add_argument("--status-path", default=None, help="status JSON path")
    p.add_argument("--once", action="store_true", default=True,
                   help="process available data then exit (availableNow)")
    p.add_argument("--log-level", default="WARN")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=args.log_level)
    log = logging.getLogger("cdc-ingest")
    check_feed_dir(args.feed_dir)
    spark = get_spark(master=args.master, app_name="cdc-ingest")
    spark.sparkContext.setLogLevel(args.log_level)
    if args.schema == "infer":
        if args.format != "jsonl":
            raise SystemExit("--schema infer requires --format jsonl")
        table_schema, event_schema = TRANSCRIPTS, None
    else:
        table_schema = TRANSCRIPTS if args.schema == "v2" else TRANSCRIPTS_V1
        event_schema = CHANGE_EVENT if args.schema == "v2" else CHANGE_EVENT_V1
    if SnapshotTable.exists(args.table) and not args.overwrite:
        table = SnapshotTable.load(spark, args.table)
        log.info("loaded table %s at v%d", args.table, table.current().version)
    else:
        table = SnapshotTable.create(
            spark, args.table, table_schema, "conv_id",
            num_buckets=args.num_buckets, overwrite=args.overwrite,
        )
        log.info("created table %s", args.table)
    runner = CdcStreamRunner(
        spark,
        args.feed_dir,
        table,
        checkpoint_dir=args.checkpoint,
        event_schema=event_schema,
        max_files_per_trigger=args.max_files_per_trigger,
        late_drop_delay_seconds=args.late_drop_seconds,
        status_path=args.status_path,
        mode=args.mode,
        compact_every=args.compact_every,
        quarantine=args.quarantine,
        feed_format=args.format,
    )
    metrics = runner.run_to_completion()
    print(json.dumps(metrics.to_json()))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
