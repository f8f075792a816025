"""Debezium-style change-event envelope adapter.

Real binlog/WAL tails usually arrive as Debezium/Maxwell-shaped JSON:

    {"before": {...}|null, "after": {...}|null, "op": "c|u|d|r",
     "ts_ms": ..., "source": {"lsn": ..., "partition": ...}}

This adapter maps that envelope onto the engine's flat CHANGE_EVENT
(lsn, op I/U/D, source_part, payload columns) with pure column expressions —
the payload struct is projected, never parsed per-row in Python.

Reference analogue: the record-shape translation the importer does between
the Neo4j driver `Record` and its property map
(``ONeo4jImporterVerticesAndEdgesMigrator.java:241-257``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..schema import KEY_COLUMNS, TRANSCRIPTS

# op mapping: Debezium c(reate)/r(ead, snapshot) -> I, u -> U, d -> D
_OP_MAP = {"c": "I", "r": "I", "u": "U", "d": "D"}


def debezium_envelope_schema(payload: StructType = TRANSCRIPTS) -> StructType:
    nullable_payload = StructType(
        [StructField(f.name, f.dataType, True) for f in payload.fields]
    )
    return StructType(
        [
            StructField("before", nullable_payload, True),
            StructField("after", nullable_payload, True),
            StructField("op", StringType(), False),
            StructField("ts_ms", LongType(), True),
            StructField(
                "source",
                StructType(
                    [
                        StructField("lsn", LongType(), False),
                        StructField("partition", LongType(), True),
                    ]
                ),
                False,
            ),
        ]
    )


def from_debezium(
    envelopes: DataFrame,
    payload: StructType = TRANSCRIPTS,
    on_unmapped: str = "drop",
    keys: list[str] | None = None,
) -> DataFrame:
    """Flatten a Debezium envelope stream/batch into CHANGE_EVENT shape.

    Deletes carry only `before` — keys are taken from `after` with a
    `before` fallback so a delete still routes to its bucket. `keys` is the
    TARGET TABLE's key set (default: the transcripts PK); a table keyed
    differently must pass its own keys or delete envelopes flatten with
    NULL key columns and mis-apply (`replicate_changelog` /
    `bootstrap_from_snapshot` pass the source table's persisted keys
    automatically).

    on_unmapped controls envelopes whose op isn't c/r/u/d (e.g. 't' truncate,
    'm' message): "drop" filters them out (the count is visible as the
    events_in delta downstream), "keep" passes them through with a NULL op
    so apply_changes' quarantine path records them with a reason — never
    silently applied as an upsert with a null payload.
    """
    if on_unmapped not in ("drop", "keep"):
        raise ValueError(f"on_unmapped must be 'drop' or 'keep', got {on_unmapped!r}")
    key_set = set(KEY_COLUMNS if keys is None else keys)
    op = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in _OP_MAP.items() for x in kv]
        ),
        F.col("op"),
    )
    if on_unmapped == "drop":
        envelopes = envelopes.filter(op.isNotNull())
    cols = [
        F.col("source.lsn").alias("lsn"),
        op.alias("op"),
        F.coalesce(F.col("source.partition"), F.lit(0)).cast("int").alias("source_part"),
    ]
    for f in payload.fields:
        if f.name in key_set:
            expr = F.coalesce(F.col(f"after.{f.name}"), F.col(f"before.{f.name}"))
        else:
            # payload comes from `after`; null for deletes by construction
            expr = F.col(f"after.{f.name}")
        cols.append(expr.cast(f.dataType).alias(f.name))
    return envelopes.select(*cols)


def to_debezium(
    changes: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Map a `SnapshotTable.changelog_envelope()` diff onto the Debezium
    wire shape — the OUTBOUND half of this adapter, turning the lake into
    a change-event *producer* so a downstream cluster can subscribe to the
    table the same way this engine subscribes to its upstream (cascade
    replication). I/U/D map to c/u/d; `source.lsn` carries the winning
    row lsn (monotone per key — the cascade target's LWW resolves
    identically to the source's), `source.partition` the key's bucket,
    and `ts_ms` the event-time millis from the row's `ts_col` field
    (after-image first, before-image for deletes; null when the payload
    has no such field).

    Reference analogue: the importer only CONSUMES (Neo4j -> OrientDB,
    ``ONeo4jImporterVerticesAndEdgesMigrator.java:183-190``); the produce
    side is what a continuous pipeline needs to fan the applied state out
    to further consumers without re-reading the upstream WAL.

    Pure column expressions — envelope construction never leaves the JVM.
    """
    out_op = F.element_at(
        F.create_map(
            F.lit("I"), F.lit("c"), F.lit("U"), F.lit("u"), F.lit("D"), F.lit("d")
        ),
        F.col("op"),
    )
    after_fields = changes.schema["after"].dataType.names
    if ts_col in after_fields:
        ts_ms = F.unix_millis(
            F.coalesce(F.col(f"after.{ts_col}"), F.col(f"before.{ts_col}"))
        )
    else:
        ts_ms = F.lit(None).cast(LongType())
    return changes.select(
        F.col("before"),
        F.col("after"),
        out_op.alias("op"),
        ts_ms.alias("ts_ms"),
        F.struct(
            F.col("lsn").alias("lsn"),
            F.col("bucket").cast(LongType()).alias("partition"),
        ).alias("source"),
    )


def export_changelog_feed(
    table,
    out_dir: str,
    from_version: int,
    to_version: int | None = None,
    ts_col: str = "ts",
) -> None:
    """Publish a version range of a SnapshotTable's changelog as a
    JSON-lines Debezium feed directory — the durable hand-off between a
    source lake and downstream replicas (each file is an immutable chunk,
    the same WAL-directory contract `sources.feed` consumes). One pass
    over O(changed data); writer parallelism follows the diff's
    partitioning."""
    env = to_debezium(
        table.changelog_envelope(from_version, to_version), ts_col=ts_col
    )
    env.write.mode("append").json(out_dir)


def read_debezium_feed(
    spark,
    feed_dir: str,
    payload: StructType = TRANSCRIPTS,
) -> DataFrame:
    """Read a JSON Debezium feed directory (as written by
    `export_changelog_feed` or an external producer) with the explicit
    envelope schema — no inference scan — ready for `from_debezium`."""
    return spark.read.schema(debezium_envelope_schema(payload)).json(feed_dir)


def replicate_changelog(
    src,
    dst,
    from_version: int,
    to_version: int | None = None,
    batch_id: str | None = None,
    mode: str = "cow",
):
    """Cascade replication: apply a source table's changelog (as the
    round-tripped Debezium envelope stream) onto a target SnapshotTable in
    ONE idempotent exactly-once batch. Because `changelog_envelope`
    collapses the range to net per-key changes carrying the source's
    winning lsns, the target's LWW reduces to the identical state no
    matter how ranges are sliced or re-applied — replaying the same
    (batch_id, range) is a ledger no-op.

    Returns the `ApplyResult` counters."""
    from ..cdc.apply import apply_changes

    to_v = src.current().version if to_version is None else to_version
    env = to_debezium(src.changelog_envelope(from_version, to_v))
    # flatten with the SOURCE's schema at to_v: columns the source evolved
    # must reach apply_changes so the target evolves too (projecting to the
    # target's schema would silently drop them)
    events = from_debezium(
        env,
        payload=src.snapshot_at(to_v).schema,
        keys=list(src.current().keys),
    )
    bid = batch_id or f"replicate-{from_version}-{to_v}"
    return apply_changes(events, dst, batch_id=bid, mode=mode)


def snapshot_envelopes(
    table,
    snapshot_version: int | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Initial-snapshot export: the table's LIVE rows at a version as
    Debezium read events (op='r', after-image only) — Debezium's
    "snapshot phase", which together with the incremental envelope feed
    gives a brand-new consumer the complete bootstrap-then-tail protocol
    (`from_debezium` maps 'r' -> I, and each row carries its REAL winning
    lsn, so increments that race the snapshot resolve by LWW exactly as
    they did on the source — no "snapshot fence" coordination needed).

    Reference analogue: the full node scan that seeds the one-shot import
    (``ONeo4jImporterVerticesAndEdgesMigrator.java:183-190``), exposed as
    a feed instead of a terminal copy.

    One bucket-parallel scan of the snapshot; pure column expressions.
    """
    from ..lake.table import DELETED_COL, LSN_COL, bucket_expr_for

    snap = (
        table.current()
        if snapshot_version is None
        else table.snapshot_at(snapshot_version)
    )
    rows = table.read(snapshot=snap, raw=True).filter(
        ~F.coalesce(F.col(DELETED_COL), F.lit(False))
    )
    payload_cols = [f.name for f in snap.schema.fields]
    after = F.struct(*[F.col(c).alias(c) for c in payload_cols])
    if ts_col in payload_cols:
        ts_ms = F.unix_millis(F.col(ts_col))
    else:
        ts_ms = F.lit(None).cast(LongType())
    before_type = StructType(
        [StructField(f.name, f.dataType, True) for f in snap.schema.fields]
    )
    return rows.select(
        F.lit(None).cast(before_type).alias("before"),
        after.alias("after"),
        F.lit("r").alias("op"),
        ts_ms.alias("ts_ms"),
        F.struct(
            F.col(LSN_COL).cast(LongType()).alias("lsn"),
            bucket_expr_for(snap).cast(LongType()).alias("partition"),
        ).alias("source"),
    )


def bootstrap_from_snapshot(
    source,
    target,
    batch_id: str | None = None,
    mode: str = "cow",
):
    """Seed a fresh consumer table from a source snapshot feed, then let
    `replicate_changelog` / MirrorRunner carry the increments — the full
    Debezium snapshot-then-stream bootstrap, in one exactly-once batch.
    Returns (ApplyResult, snapshot_version): pass the version as the
    mirror's `starting_version` (or replicate_changelog's from_version);
    overlap either side of the boundary is absorbed by LWW idempotence.
    """
    from ..cdc.apply import apply_changes

    snap_v = source.current().version
    env = snapshot_envelopes(source, snapshot_version=snap_v)
    # source-side schema for the same evolution reason as replicate_changelog
    events = from_debezium(
        env,
        payload=source.snapshot_at(snap_v).schema,
        keys=list(source.current().keys),
    )
    bid = batch_id or f"bootstrap-{snap_v}"
    # record the replication position durably: MirrorRunner.catch_up /
    # lag() resume from replica lineage, so a bootstrap alone is a valid
    # mirror starting state even before any incremental batch lands
    res = apply_changes(
        events, target, batch_id=bid, mode=mode,
        lineage_extra={"mirror_source_version": snap_v},
    )
    return res, snap_v
