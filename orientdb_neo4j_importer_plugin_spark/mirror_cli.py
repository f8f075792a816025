"""Replication CLI: keep a replica SnapshotTable converged with a source
table — the spark-submit-able companion of ``cli.py`` (ingest) for the
fan-out stage (primary lake -> replicas).

Run::

    python -m orientdb_neo4j_importer_plugin_spark.mirror_cli \
        --source /lake/primary --replica /lake/replica --checkpoint /ckpt

or via ``spark-submit --py-files engine.zip mirror_cli.py ...``.

Two drain paths (same convergence guarantees, see streaming/mirror.py):

* default: streaming availableNow drain through the lake_cdf tail
  (checkpoint offsets; right when invocations are frequent and the
  backlog per run is modest),
* ``--window N``: bounded catch-up via batch version windows (right for
  a replica resuming far behind head — each window is one exactly-once
  apply, resumable from replica lineage).

The replica is created from the source's CURRENT schema when absent;
subsequent source schema evolution propagates through the apply path.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

from .lake import SnapshotTable
from .session import get_spark
from .streaming import MirrorRunner


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cdc-mirror",
        description="PySpark CDC mirror: snapshot table -> replica table",
    )
    p.add_argument("--source", required=True, help="source table root")
    p.add_argument("--replica", required=True, help="replica table root")
    p.add_argument("--checkpoint", required=True, help="streaming checkpoint dir")
    p.add_argument("--master", default=None,
                   help="spark master (default local[$SPARK_GRAFT_CPUS])")
    p.add_argument("--mode", choices=["cow", "mor"], default="mor")
    p.add_argument("--compact-every", type=int, default=0, metavar="N",
                   help="MOR replica: compact deltas every N batches")
    p.add_argument("--num-buckets", type=int, default=None,
                   help="replica bucket count when creating it "
                        "(default: match the source)")
    p.add_argument("--window", type=int, default=None, metavar="N",
                   help="drain via bounded catch-up windows of N source "
                        "versions instead of the streaming tail")
    p.add_argument("--bootstrap", action="store_true",
                   help="seed a newly-created replica from the source's "
                        "snapshot feed (O(live rows)) and tail only "
                        "increments after it, instead of replaying the "
                        "full commit history")
    p.add_argument("--overwrite", action="store_true",
                   help="drop an existing replica")
    p.add_argument("--status-path", default=None, help="status JSON path")
    p.add_argument("--log-level", default="WARN")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(level=args.log_level)
    log = logging.getLogger("cdc-mirror")
    spark = get_spark(master=args.master, app_name="cdc-mirror")
    spark.sparkContext.setLogLevel(args.log_level)
    if not SnapshotTable.exists(args.source):
        raise SystemExit(f"source table not found: {args.source}")
    source = SnapshotTable.load(spark, args.source)
    if SnapshotTable.exists(args.replica) and not args.overwrite:
        replica = SnapshotTable.load(spark, args.replica)
        # LWW merges group on the key set; a replica keyed differently from
        # its source would silently diverge despite converged applies
        if list(replica.current().keys) != list(source.current().keys):
            raise SystemExit(
                f"replica key columns {replica.current().keys} != source "
                f"key columns {source.current().keys}: refusing to mirror"
            )
        log.info("loaded replica %s at v%d", args.replica, replica.current().version)
    else:
        replica = SnapshotTable.create(
            spark, args.replica, source.current().schema,
            source.current().partition_key,
            key_columns=list(source.current().keys),
            num_buckets=args.num_buckets or source.current().num_buckets,
            overwrite=args.overwrite,
        )
        log.info("created replica %s", args.replica)
    starting_version = 0
    if args.bootstrap:
        from .sources.debezium import bootstrap_from_snapshot

        res, starting_version = bootstrap_from_snapshot(
            source, replica, mode=args.mode
        )
        log.info(
            "bootstrapped replica from snapshot v%d (%d rows upserted%s)",
            starting_version, res.upserts,
            ", replayed no-op" if res.skipped_replay else "",
        )
    runner = MirrorRunner(
        spark, source, replica,
        checkpoint_dir=args.checkpoint,
        starting_version=starting_version,
        status_path=args.status_path,
        mode=args.mode,
        compact_every=args.compact_every,
    )
    if args.window:
        runner.catch_up(window=args.window)
        metrics = runner.metrics
    else:
        metrics = runner.run_to_completion()
    out = metrics.to_json()
    out["replication_lag"] = runner.lag()
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
