"""Refs CLI: tags, branches, and write-audit-publish from the shell.

Every refs operation is PURE METADATA (snapshot pins, shallow-clone
manifests, hard-link adoption at publish) — no DataFrame is ever built, so
this CLI deliberately starts NO Spark session: `cdc-refs publish` against a
100 TB table completes in milliseconds on the driver. The write-audit
middle of the WAP flow (applying batches to the branch, auditing it) goes
through the normal engine surface (`cli.py` ingest / any query) with
``--table <root>/branches/<name>``.

Run::

    python -m orientdb_neo4j_importer_plugin_spark.refs_cli \
        --table /lake/primary branch wap
    python -m ...cli --table /lake/primary/branches/wap ...   # stage + audit
    python -m orientdb_neo4j_importer_plugin_spark.refs_cli \
        --table /lake/primary publish wap

Reference analogue: the importer writes straight into the live target
database (`ONeo4jImporterVerticesAndEdgesMigrator.java` commit-as-you-go);
branch-audit-publish is the staging step its one-shot design never had.
"""

from __future__ import annotations

import argparse
import json
import sys

from .lake import SnapshotTable


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cdc-refs",
        description="tags, branches, write-audit-publish (metadata-only, no Spark)",
    )
    p.add_argument("--table", required=True, help="snapshot table root")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="print tags, branches, and the current version")
    t = sub.add_parser("tag", help="pin the current (or given) version under a name")
    t.add_argument("name")
    t.add_argument("--version", type=int, default=None,
                   help="pin this retained version instead of current")
    dt = sub.add_parser("drop-tag", help="remove a tag pin")
    dt.add_argument("name")
    b = sub.add_parser("branch", help="fork a zero-copy branch at current")
    b.add_argument("name")
    db = sub.add_parser("drop-branch", help="discard a branch and unpin its base")
    db.add_argument("name")
    pub = sub.add_parser(
        "publish", help="fast-forward the branch's audited state onto main"
    )
    pub.add_argument("name")
    pub.add_argument("--keep", action="store_true",
                     help="keep the branch (and its base pin) after publish")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not SnapshotTable.exists(args.table):
        raise SystemExit(f"table not found: {args.table}")
    # spark=None: every refs op is metadata-only, none builds a DataFrame
    table = SnapshotTable.load(None, args.table)
    out: dict = {"table": args.table, "cmd": args.cmd}
    if args.cmd == "list":
        out.update(table.refs())
        out["current_version"] = table.current().version
    elif args.cmd == "tag":
        snap = table.snapshot_at(args.version) if args.version is not None else None
        out["pinned_version"] = table.create_tag(args.name, snapshot=snap)
        out["tag"] = args.name
    elif args.cmd == "drop-tag":
        table.drop_tag(args.name)
        out["dropped"] = args.name
    elif args.cmd == "branch":
        br = table.create_branch(args.name)
        out["branch_root"] = br.root
        out["base_version"] = table.refs()["branches"][args.name]["base_version"]
    elif args.cmd == "drop-branch":
        table.drop_branch(args.name)
        out["dropped"] = args.name
    elif args.cmd == "publish":
        snap = table.publish_branch(args.name, drop=not args.keep)
        out["published_version"] = snap.version
        out["dropped_branch"] = not args.keep
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
