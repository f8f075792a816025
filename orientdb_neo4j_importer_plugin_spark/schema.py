"""Canonical schemas + type-mapping helpers.

Reference analogues:

* ``TRANSCRIPTS`` is the target table shape mandated by BASELINE.json
  ``input_hint`` — the analogue of an OrientDB vertex class with declared
  properties (``ONeo4jImporterVerticesAndEdgesMigrator.java:705-710``).
* ``CHANGE_EVENT`` wraps the payload with CDC metadata; ``lsn`` is the
  analogue of Neo4j's monotone internal ``ID(node)`` cursor order
  (``ONeo4jImporterVerticesAndEdgesMigrator.java:183-190``), ``source_part``
  carries provenance like ``neo4jLabelList`` lineage columns (``:257``).
* ``merge_schemas`` is the lazy-schema-growth analogue
  (``ONeo4jImporterUtils.java:124-285`` creates classes/properties on first
  occurrence; we append new columns on first occurrence).
* ``spark_type_for`` mirrors ``mapNeo4JToOrientDBPropertyType``
  (``ONeo4jImporterUtils.java:287-341``) including its default-to-STRING rule.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Primary key of the transcripts table — the analogue of neo4jNodeID +
# UNIQUE_HASH_INDEX (Migrator:252-254,363-370).
KEY_COLUMNS = ["conv_id", "turn_idx"]

# Target table (BASELINE.json input_hint). `tool` is the late-added column
# exercising schema evolution; v1 feeds omit it entirely.
TRANSCRIPTS = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), True),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

# v1 payload: transcripts before the `tool` column existed.
TRANSCRIPTS_V1 = StructType([f for f in TRANSCRIPTS.fields if f.name != "tool"])

# Per-conversation metadata (second CDC source, one row per conv_id):
# the dimension side of the two-source incremental join view.
CONV_META = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("channel", StringType(), True),
        StructField("priority", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

# CDC envelope columns prepended to the payload.
CDC_META_FIELDS = [
    StructField("lsn", LongType(), False),
    StructField("op", StringType(), False),  # 'I' | 'U' | 'D'
    StructField("source_part", IntegerType(), False),
]

CDC_META_COLUMNS = [f.name for f in CDC_META_FIELDS]


def change_event_schema(payload: StructType = TRANSCRIPTS) -> StructType:
    """Envelope schema: CDC metadata + flattened (nullable) payload columns.

    Payload columns are nullable in the envelope because delete events carry
    only the key (Migrator deletes have no analogue — the reference rebuilds
    from scratch; we generalize to op='D').
    """
    fields = list(CDC_META_FIELDS)
    for f in payload.fields:
        nullable = f.name not in KEY_COLUMNS
        fields.append(StructField(f.name, f.dataType, nullable))
    return StructType(fields)


CHANGE_EVENT = change_event_schema(TRANSCRIPTS)
CHANGE_EVENT_V1 = change_event_schema(TRANSCRIPTS_V1)


# ---------------------------------------------------------------------------
# Type mapping (reference: ONeo4jImporterUtils.java:287-341)
# ---------------------------------------------------------------------------

_PY_TO_SPARK: dict[type, DataType] = {
    str: StringType(),
    int: LongType(),
    bool: BooleanType(),
    float: DoubleType(),
    bytes: BinaryType(),
}


def spark_type_for(value: object) -> DataType:
    """Infer a Spark type from a sampled Python value; default STRING.

    Mirrors the reference's sample-one-value inference
    (``ONeo4jImporterUtils.java:145-155``) and its default-to-STRING rule
    (``:308-309``, ``:220-222``).
    """
    if value is None:
        return StringType()
    if isinstance(value, bool):  # bool before int: bool is an int subclass
        return BooleanType()
    for py, st in _PY_TO_SPARK.items():
        if isinstance(value, py):
            return st
    if isinstance(value, (list, tuple)):
        elem = spark_type_for(value[0]) if value else StringType()
        return ArrayType(elem, True)
    return StringType()


_WIDENS: dict[type, tuple[type, ...]] = {
    LongType: (ByteType, ShortType, IntegerType),
    DoubleType: (FloatType,),
    IntegerType: (ByteType, ShortType),
    FloatType: (),
}


class SchemaEvolutionError(TypeError):
    """An incoming batch tries to change a column to an incompatible type."""


def _compatible(a: DataType, b: DataType) -> DataType:
    """Resolve the table type `a` against an incoming batch type `b`.

    Old data files are read through the evolved schema, so the table type
    may only ever change by a widening the parquet reader supports
    (int->long, float->double; pyspark>=4.0 type-widened reads). Any other
    atomic mismatch KEEPS the table type — values are cast per record at
    apply time, where uncastable ones hit the quarantine path (the
    reference's tolerated lossy coercion, ``Migrator:313-317``). A silent
    fall-back-to-STRING would permanently break reads of pre-evolution
    files, so it never happens; structurally impossible pairs (complex vs
    atomic, mismatched containers) raise instead.
    """
    if a == b:
        return a
    for wide, narrows in _WIDENS.items():
        if isinstance(a, wide) and isinstance(b, narrows):
            return a
        if isinstance(b, wide) and isinstance(a, narrows):
            return b
    complex_types = (ArrayType, StructType)
    if isinstance(a, complex_types) or isinstance(b, complex_types):
        raise SchemaEvolutionError(
            f"incompatible type change {a.simpleString()} -> {b.simpleString()}"
        )
    return a  # atomic mismatch: table type wins; values cast per record


def merge_schemas(table: StructType, incoming: StructType) -> StructType:
    """Union of table schema and an incoming batch schema.

    Existing columns keep their (possibly widened) type; brand-new columns are
    appended nullable — the Iceberg ``mergeSchema`` / lazy-property-creation
    analogue (``ONeo4jImporterUtils.java:124-285``). Column identity is
    case-insensitive like the reference's class-name collision handling
    (``Migrator:539-561``), preserving the table's original spelling.
    """
    by_name = {f.name.lower(): f for f in table.fields}
    out = list(table.fields)
    for f in incoming.fields:
        cur = by_name.get(f.name.lower())
        if cur is None:
            out.append(StructField(f.name, f.dataType, True))
            by_name[f.name.lower()] = out[-1]
        else:
            merged = _compatible(cur.dataType, f.dataType)
            if merged != cur.dataType:
                idx = out.index(cur)
                out[idx] = StructField(cur.name, merged, cur.nullable)
                by_name[cur.name.lower()] = out[idx]
    return StructType(out)


def payload_columns(schema: StructType) -> list[str]:
    """Payload (non-envelope) column names in schema order."""
    return [f.name for f in schema.fields if f.name not in CDC_META_COLUMNS]
