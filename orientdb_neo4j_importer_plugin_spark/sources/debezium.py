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
) -> DataFrame:
    """Flatten a Debezium envelope stream/batch into CHANGE_EVENT shape.

    Deletes carry only `before` — keys are taken from `after` with a
    `before` fallback so a delete still routes to its bucket.

    on_unmapped controls envelopes whose op isn't c/r/u/d (e.g. 't' truncate,
    'm' message): "drop" filters them out (the count is visible as the
    events_in delta downstream), "keep" passes them through with a NULL op
    so apply_changes' quarantine path records them with a reason — never
    silently applied as an upsert with a null payload.
    """
    if on_unmapped not in ("drop", "keep"):
        raise ValueError(f"on_unmapped must be 'drop' or 'keep', got {on_unmapped!r}")
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
        if f.name in KEY_COLUMNS:
            expr = F.coalesce(F.col(f"after.{f.name}"), F.col(f"before.{f.name}"))
        else:
            # payload comes from `after`; null for deletes by construction
            expr = F.col(f"after.{f.name}")
        cols.append(expr.cast(f.dataType).alias(f.name))
    return envelopes.select(*cols)
