"""Per-record error isolation (dead-letter path) — the reference's
catch-per-record / rollback-batch / continue behavior
(``ONeo4jImporterVerticesAndEdgesMigrator.java:274-283,585-594``): poison
events divert to a queryable quarantine table with a reason, the batch
commits, good rows land. Also covers the schema-evolution incompatible-type
rejection and the Debezium unmapped-op policy.
"""

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.schema import (
    TRANSCRIPTS,
    SchemaEvolutionError,
    merge_schemas,
)
from orientdb_neo4j_importer_plugin_spark.sources.debezium import (
    debezium_envelope_schema,
    from_debezium,
)

TS = datetime.datetime(2024, 1, 1, 10, 0, 0)

EVENT_COLS = "lsn long, op string, conv_id string, turn_idx int, role string, text string, tool string, ts timestamp, source_part int"


def _mk_table(spark, tmp_path, name="q"):
    return SnapshotTable.create(
        spark, str(tmp_path / name), TRANSCRIPTS, "conv_id", num_buckets=4
    )


def test_poison_records_quarantined_batch_commits(spark, tmp_path):
    table = _mk_table(spark, tmp_path)
    rows = [
        (1, "I", "c1", 0, "user", "hello", None, TS, 0),       # good
        (2, "X", "c1", 1, "user", "bad op", None, TS, 0),      # bad_op
        (3, "I", None, 2, "user", "null key", None, TS, 0),    # null_key
        (None, "I", "c1", 3, "user", "null lsn", None, TS, 0), # null_lsn
        (5, "I", "c2", 0, "assistant", "also good", None, TS, 0),
    ]
    feed = spark.createDataFrame(rows, EVENT_COLS)
    res = apply_changes(feed, table, batch_id="b0", quarantine=True)
    assert res.quarantined == 3
    assert res.events_in == 2
    assert res.snapshot_version is not None  # batch committed
    got = {(r.conv_id, r.turn_idx) for r in table.read().collect()}
    assert got == {("c1", 0), ("c2", 0)}
    q = table.read_quarantine()
    reasons = {r.reason for r in q.collect()}
    assert reasons == {"bad_op", "null_key:conv_id", "null_lsn"}
    assert q.filter(F.col("event_json").contains("bad op")).count() == 1
    # quarantine count recorded in lineage like late_dropped
    lin = table.current().lineage[-1]
    assert lin["quarantined"] == 3


def test_uncastable_payload_quarantined(spark, tmp_path):
    table = _mk_table(spark, tmp_path, "q2")
    # turn_idx arrives as string: castable for good rows, poison otherwise
    rows = [
        (1, "I", "c1", "0", "user", "ok", None, TS, 0),
        (2, "I", "c1", "not-a-number", "user", "poison", None, TS, 0),
    ]
    schema = "lsn long, op string, conv_id string, turn_idx string, role string, text string, tool string, ts timestamp, source_part int"
    feed = spark.createDataFrame(rows, schema)
    res = apply_changes(feed, table, batch_id="b0", quarantine=True)
    assert res.quarantined == 1 and res.events_in == 1
    assert {r.reason for r in table.read_quarantine().collect()} == {
        "uncastable:turn_idx"
    }
    assert [r.turn_idx for r in table.read().collect()] == [0]


def test_quarantine_off_is_default_and_unchanged(spark, tmp_path):
    table = _mk_table(spark, tmp_path, "q3")
    feed = spark.createDataFrame(
        [(1, "I", "c1", 0, "user", "hello", None, TS, 0)], EVENT_COLS
    )
    res = apply_changes(feed, table, batch_id="b0")
    assert res.quarantined == 0
    assert table.read_quarantine().count() == 0


def test_all_poison_batch_still_ledgers(spark, tmp_path):
    table = _mk_table(spark, tmp_path, "q4")
    feed = spark.createDataFrame(
        [(1, "Z", "c1", 0, "user", "x", None, TS, 0)], EVENT_COLS
    )
    res = apply_changes(feed, table, batch_id="b0", quarantine=True)
    assert res.events_in == 0 and res.quarantined == 1
    assert table.is_batch_committed("b0")  # replay stays a no-op
    res2 = apply_changes(feed, table, batch_id="b0", quarantine=True)
    assert res2.skipped_replay
    assert table.read_quarantine().count() == 1  # not double-quarantined


def test_schema_type_change_rules(spark):
    from pyspark.sql.types import ArrayType

    # structurally impossible: array vs scalar -> raise
    with pytest.raises(SchemaEvolutionError):
        merge_schemas(
            StructType([StructField("a", ArrayType(StringType()), True)]),
            StructType([StructField("a", LongType(), True)]),
        )
    # numeric widening changes the table type
    merged = merge_schemas(
        StructType([StructField("a", IntegerType(), True)]),
        StructType([StructField("a", LongType(), True)]),
    )
    assert merged.fields[0].dataType == LongType()
    # atomic mismatch keeps the table type (never falls back to STRING —
    # that would break reads of pre-evolution parquet files)
    kept = merge_schemas(
        StructType([StructField("a", TimestampType(), True)]),
        StructType([StructField("a", StringType(), True)]),
    )
    assert kept.fields[0].dataType == TimestampType()


def test_debezium_unmapped_op_dropped(spark):
    env_schema = debezium_envelope_schema()
    payload = ("c1", 0, "user", "hi", None, TS)
    rows = [
        (None, payload, "c", 0, (1, 0)),
        (None, None, "t", 0, (2, 0)),  # truncate: no before/after
    ]
    env = spark.createDataFrame(rows, env_schema)
    out = from_debezium(env)
    assert [r.op for r in out.collect()] == ["I"]
    kept = from_debezium(env, on_unmapped="keep")
    assert kept.count() == 2
    assert kept.filter(F.col("op").isNull()).count() == 1


def test_custom_key_columns_persisted_and_used(spark, tmp_path):
    # a table keyed on a single column, different from the transcripts PK:
    # the MOR read-merge must group on the persisted key, not the global
    schema = StructType(
        [
            StructField("k", StringType(), False),
            StructField("v", StringType(), True),
        ]
    )
    table = SnapshotTable.create(
        spark,
        str(tmp_path / "custom"),
        schema,
        partition_key="k",
        num_buckets=2,
        key_columns=["k"],
    )
    assert table.current().keys == ["k"]
    feed1 = spark.createDataFrame(
        [(1, "I", "a", "v1", 0), (2, "I", "b", "v1", 0)],
        "lsn long, op string, k string, v string, source_part int",
    )
    feed2 = spark.createDataFrame(
        [(3, "U", "a", "v2", 0)],
        "lsn long, op string, k string, v string, source_part int",
    )
    apply_changes(feed1, table, batch_id="b1", mode="mor")
    apply_changes(feed2, table, batch_id="b2", mode="mor")
    got = {(r.k, r.v) for r in table.read().collect()}
    assert got == {("a", "v2"), ("b", "v1")}


# --- quarantine replay (fix-and-reinject loop) ------------------------------


def test_replay_quarantine_with_repair(spark, tmp_path):
    from orientdb_neo4j_importer_plugin_spark.cdc import replay_quarantine

    table = _mk_table(spark, tmp_path, "qr")
    rows = [
        (1, "I", "c1", 0, "user", "good", None, TS, 0),
        (2, "X", "c1", 1, "user", "fixable op", None, TS, 0),   # bad_op
        (3, "I", None, 2, "user", "unfixable", None, TS, 0),    # null_key
    ]
    feed = spark.createDataFrame(rows, EVENT_COLS)
    apply_changes(feed, table, batch_id="b0", quarantine=True)
    assert table.read_quarantine().count() == 2

    # repair hook: the upstream bug mapped inserts to 'X' — remap and replay
    def fix(df):
        return df.withColumn(
            "op", F.when(F.col("op") == "X", "I").otherwise(F.col("op"))
        )

    res = replay_quarantine(table, transform=fix, batch_id="replay-1")
    assert res is not None
    assert res.events_in == 1      # the fixed row applied
    assert res.quarantined == 1    # the null-key row is still poison
    got = {(r.conv_id, r.turn_idx) for r in table.read().collect()}
    assert got == {("c1", 0), ("c1", 1)}
    # purge removed the replayed source rows; only the survivor remains,
    # under the replay batch id
    q = table.read_quarantine().collect()
    assert len(q) == 1
    assert q[0].batch_id == "replay-1"
    assert q[0].reason == "null_key:conv_id"
    # original lexical values survived the JSON round-trip
    assert "unfixable" in q[0].event_json
    # lineage records provenance of the replay
    lin = table.current().lineage[-1]
    assert lin["batch_id"] == "replay-1" and lin["replayed_from"] == ["b0"]


def test_replay_preserves_uncastable_originals(spark, tmp_path):
    """The all-string re-parse must re-poison uncastable values instead of
    silently nulling them (the failure mode of a typed from_json)."""
    from orientdb_neo4j_importer_plugin_spark.cdc import replay_quarantine

    table = _mk_table(spark, tmp_path, "qu")
    schema = "lsn long, op string, conv_id string, turn_idx string, role string, text string, tool string, ts timestamp, source_part int"
    rows = [(1, "I", "c1", "boom", "user", "poison", None, TS, 0)]
    apply_changes(
        spark.createDataFrame(rows, schema), table, batch_id="b0", quarantine=True
    )
    res = replay_quarantine(table, batch_id="replay-u")  # no repair
    assert res.quarantined == 1 and res.events_in == 0
    q = table.read_quarantine().collect()
    assert len(q) == 1 and q[0].batch_id == "replay-u"
    assert q[0].reason == "uncastable:turn_idx"
    assert table.read().count() == 0


def test_replay_empty_selection_is_noop(spark, tmp_path):
    from orientdb_neo4j_importer_plugin_spark.cdc import replay_quarantine

    table = _mk_table(spark, tmp_path, "qe")
    assert replay_quarantine(table) is None
    assert replay_quarantine(table, batch_ids=["nope"]) is None


def test_quarantined_future_ts_does_not_poison_watermark(spark, tmp_path):
    """A poison row's corrupt future timestamp must never advance the
    committed event-time watermark (it would late-drop all good events)."""
    table = _mk_table(spark, tmp_path, "qw")
    far = datetime.datetime(3000, 1, 1)
    rows = [
        (1, "I", "c1", 0, "user", "good", None, TS, 0),
        (2, "X", "c1", 1, "user", "poison from the future", None, far, 0),
    ]
    feed = spark.createDataFrame(rows, EVENT_COLS)
    res = apply_changes(feed, table, batch_id="b0", quarantine=True)
    assert res.quarantined == 1
    hwm = table.current().lineage[-1]["event_ts_max"]
    assert hwm.startswith("2024"), hwm  # the good row's ts, not year 3000


def test_watermark_cumulative_across_batches(spark, tmp_path):
    """event_ts_max is monotone: a later batch of older events carries the
    previous high watermark forward (survives lineage-window truncation)."""
    table = _mk_table(spark, tmp_path, "qm")
    late_ts = datetime.datetime(2023, 6, 1)
    b0 = [(1, "I", "c1", 0, "user", "new", None, TS, 0)]
    b1 = [(2, "I", "c2", 0, "user", "older", None, late_ts, 0)]
    apply_changes(spark.createDataFrame(b0, EVENT_COLS), table, batch_id="b0")
    apply_changes(spark.createDataFrame(b1, EVENT_COLS), table, batch_id="b1")
    assert table.current().lineage[-1]["event_ts_max"].startswith("2024")


def test_delete_with_uncastable_key_quarantined(spark, tmp_path):
    """A tombstone whose key can't cast must quarantine, not become a
    null-key tombstone that can never match its row."""
    table = _mk_table(spark, tmp_path, "qd")
    schema = "lsn long, op string, conv_id string, turn_idx string, role string, text string, tool string, ts timestamp, source_part int"
    rows = [
        (1, "I", "c1", "0", "user", "live", None, TS, 0),
        (2, "D", "c1", "zero", None, None, None, TS, 0),  # corrupt key delete
    ]
    res = apply_changes(
        spark.createDataFrame(rows, schema), table, batch_id="b0", quarantine=True
    )
    assert res.quarantined == 1 and res.events_in == 1
    assert table.read_quarantine().collect()[0].reason == "uncastable:turn_idx"
    assert table.read().count() == 1  # the live row was NOT deleted


def test_quarantine_write_idempotent_per_batch(spark, tmp_path):
    """Re-deriving a batch's poison set (conflict recompute / checkpoint
    replay) overwrites rather than duplicates the dead-letter rows."""
    table = _mk_table(spark, tmp_path, "qi")
    rows = [
        (1, "I", "c1", 0, "user", "good", None, TS, 0),
        (2, "X", "c1", 1, "user", "bad", None, TS, 0),
    ]
    feed = spark.createDataFrame(rows, EVENT_COLS)
    apply_changes(feed, table, batch_id="b0", quarantine=True)
    # simulate the re-attempt: the ledger makes the COMMIT a replay no-op,
    # but the quarantine write happens before the commit — it must overwrite
    apply_changes(feed, table, batch_id="b0", quarantine=True)
    # force the pre-commit path again with a fresh handle (no warm ledger)
    from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable

    t2 = SnapshotTable.load(spark, str(tmp_path / "qi"))
    apply_changes(feed, t2, batch_id="b0", quarantine=True)
    assert table.read_quarantine().count() == 1  # not 2 or 3


def test_quarantine_batch_ids_never_collide(spark, tmp_path):
    """Distinct batch ids that sanitize identically must keep distinct
    dead-letter directories (injective encoding)."""
    table = _mk_table(spark, tmp_path, "qc")
    rows = [(2, "X", "c1", 1, "user", "bad", None, TS, 0)]
    feed = spark.createDataFrame(rows, EVENT_COLS)
    apply_changes(feed, table, batch_id="b:1", quarantine=True)
    apply_changes(feed, table, batch_id="b_1", quarantine=True)
    q = table.read_quarantine().collect()
    assert len(q) == 2
    assert {r.batch_id for r in q} == {"b:1", "b_1"}


def test_quarantine_adversarial_id_never_deletes_sibling(spark, tmp_path):
    """batch_id 'x-<md5(x)[:8]>' sanitizes to batch 'x''s CURRENT-format dir
    name; the legacy-layout migration delete must not destroy it."""
    table = _mk_table(spark, tmp_path, "qa")
    rows = [(2, "X", "c1", 1, "user", "bad", None, TS, 0)]
    feed = spark.createDataFrame(rows, EVENT_COLS)
    apply_changes(feed, table, batch_id="x", quarantine=True)
    apply_changes(feed, table, batch_id="x-9dd4e461", quarantine=True)  # md5('x')[:8]
    q = table.read_quarantine().collect()
    assert len(q) == 2
    assert {r.batch_id for r in q} == {"x", "x-9dd4e461"}
