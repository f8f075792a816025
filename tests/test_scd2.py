"""SCD Type-2 history: batch fold + incrementally-maintained view.

The reference keeps final state only (in-place vertex overwrite keyed by
the unique neo4jNodeID index, Migrator.java:252-254); the SCD2 consumer is
the versioned-history analogue. Invariants proven here:

* batch fold: interval chaining, delete close-out, is_current == LWW
  final state, patch rejection;
* incremental view: bit-equality with the batch fold under
  single-change-per-key commits, exactly-once refresh, as-of reads,
  mid-stream schema evolution, MOR mode.
"""

import datetime

import pytest
from pyspark.sql import functions as F

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.cdc.scd import Scd2View, scd2_history
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.schema import (
    KEY_COLUMNS,
    TRANSCRIPTS,
    TRANSCRIPTS_V1,
)

EVENT_DDL = (
    "lsn long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)
TS = datetime.datetime(2024, 1, 1)


def ev(lsn, op, conv, turn, text=None, role="user", tool=None):
    payload_null = op == "D"
    return (
        lsn,
        op,
        conv,
        turn,
        None if payload_null else role,
        None if payload_null else text,
        None if payload_null else tool,
        TS,
    )


# one key updated twice then deleted; one insert-only; one insert+update;
# one delete of a never-seen key (no history row at all)
EVENTS = [
    ev(10, "I", "a", 1, "a1 v0"),
    ev(20, "U", "a", 1, "a1 v1"),
    ev(30, "U", "a", 1, "a1 v2"),
    ev(40, "D", "a", 1),
    ev(11, "I", "b", 1, "b1 v0"),
    ev(12, "I", "b", 2, "b2 v0"),
    ev(22, "U", "b", 2, "b2 v1"),
    ev(99, "D", "zz", 9),
]


def _feed(spark, rows=EVENTS):
    return spark.createDataFrame(rows, EVENT_DDL)


def _hist_rows(df):
    cols = [
        "conv_id", "turn_idx", "text",
        "valid_from_lsn", "valid_to_lsn", "is_current",
    ]
    return sorted(
        tuple(r) for r in df.select(*cols).collect()
    )


def test_batch_intervals(spark):
    hist = scd2_history(_feed(spark), KEY_COLUMNS)
    assert _hist_rows(hist) == sorted(
        [
            ("a", 1, "a1 v0", 10, 20, False),
            ("a", 1, "a1 v1", 20, 30, False),
            ("a", 1, "a1 v2", 30, 40, False),  # closed by the delete
            ("b", 1, "b1 v0", 11, None, True),
            ("b", 2, "b2 v0", 12, 22, False),
            ("b", 2, "b2 v1", 22, None, True),
            # no row for zz: delete of a never-seen key emits nothing
        ]
    )


def test_batch_current_equals_lww_state(spark, sf_dir):
    """Replaying only is_current rows == the table's final LWW state."""
    from orientdb_neo4j_importer_plugin_spark.feedgen import feed_from_tpch

    feed = feed_from_tpch(spark, sf_dir)
    cur = (
        scd2_history(feed, KEY_COLUMNS, payload_cols=["role", "text", "tool", "ts"])
        .filter("is_current")
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )
    import os, tempfile

    root = tempfile.mkdtemp(dir=os.environ.get("TMPDIR", "/tmp"))
    table = SnapshotTable.create(
        spark, f"{root}/t", TRANSCRIPTS, "conv_id", num_buckets=8
    )
    apply_changes(feed, table, batch_id="b0")
    state = table.read().select(*cur.columns)
    assert cur.exceptAll(state).count() == 0
    assert state.exceptAll(cur).count() == 0


def test_batch_rejects_patch_events(spark):
    rows = EVENTS + [ev(15, "P", "b", 1, "partial")]
    hist = scd2_history(_feed(spark, rows), KEY_COLUMNS)
    with pytest.raises(Exception, match="full row images"):
        hist.collect()


def _commits_single_change_per_key():
    """Three commits, each touching every key at most once."""
    return [
        [ev(10, "I", "a", 1, "a1 v0"), ev(11, "I", "b", 1, "b1 v0"),
         ev(12, "I", "b", 2, "b2 v0")],
        [ev(20, "U", "a", 1, "a1 v1"), ev(22, "U", "b", 2, "b2 v1")],
        [ev(40, "D", "a", 1)],
    ]


def test_view_matches_batch_fold(spark, tmp_path):
    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPTS, "conv_id", num_buckets=4
    )
    all_rows = []
    for i, rows in enumerate(_commits_single_change_per_key()):
        apply_changes(_feed(spark, rows), table, batch_id=f"b{i}")
        all_rows += rows
    view = Scd2View.create(table, str(tmp_path / "hist"))
    res = view.refresh()
    assert res["windows"] == 3 and not res["skipped"]
    batch = scd2_history(_feed(spark, all_rows), KEY_COLUMNS)
    assert _hist_rows(view.read()) == _hist_rows(batch)
    # idempotent: nothing new -> skip; replayed windows are ledger no-ops
    assert view.refresh()["skipped"] is True


def test_view_as_of(spark, tmp_path):
    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPTS, "conv_id", num_buckets=4
    )
    for i, rows in enumerate(_commits_single_change_per_key()):
        apply_changes(_feed(spark, rows), table, batch_id=f"b{i}")
    view = Scd2View.create(table, str(tmp_path / "hist"))
    view.refresh()
    got = sorted(
        tuple(r)
        for r in view.as_of(25).select("conv_id", "turn_idx", "text").collect()
    )
    # at lsn 25: a1 at v1 (updated at 20, deleted later at 40),
    # b1 v0, b2 v1 (updated at 22 <= 25)
    assert got == [("a", 1, "a1 v1"), ("b", 1, "b1 v0"), ("b", 2, "b2 v1")]
    # as_of before everything: empty
    assert view.as_of(5).count() == 0


def test_view_resume_and_mor(spark, tmp_path):
    """Refresh mid-history, commit more, refresh again (lineage resume);
    MOR mode converges identically after compaction."""
    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPTS, "conv_id", num_buckets=4
    )
    commits = _commits_single_change_per_key()
    apply_changes(_feed(spark, commits[0]), table, batch_id="b0")
    view = Scd2View.create(table, str(tmp_path / "hist"))
    assert view.refresh(mode="mor")["windows"] == 1
    assert view.last_refreshed_version() == 1
    for i, rows in enumerate(commits[1:], start=1):
        apply_changes(_feed(spark, rows), table, batch_id=f"b{i}")
    assert view.refresh(mode="mor")["windows"] == 2
    view.target.compact()
    batch = scd2_history(
        _feed(spark, [r for c in commits for r in c]), KEY_COLUMNS
    )
    assert _hist_rows(view.read()) == _hist_rows(batch)


def test_view_schema_evolution(spark, tmp_path):
    """Source gains `tool` mid-stream: new history rows carry it, rows
    captured before the column existed close with tool null."""
    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPTS_V1, "conv_id", num_buckets=4
    )
    v1 = spark.createDataFrame(
        [(10, "I", "a", 1, "user", "a1 v0", TS)],
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, ts timestamp",
    )
    apply_changes(v1, table, batch_id="b0")
    view = Scd2View.create(table, str(tmp_path / "hist"))
    view.refresh()
    v2 = _feed(spark, [ev(20, "U", "a", 1, "a1 v1", tool="search")])
    apply_changes(v2, table, batch_id="b1")
    view.refresh()
    rows = sorted(
        tuple(r)
        for r in view.read()
        .select("conv_id", "text", "tool", "valid_from_lsn", "valid_to_lsn")
        .collect()
    )
    assert rows == [
        ("a", "a1 v0", None, 10, 20),
        ("a", "a1 v1", "search", 20, None),
    ]


def test_view_rejects_mismatched_target(spark, tmp_path):
    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPTS, "conv_id", num_buckets=4
    )
    bad = SnapshotTable.create(
        spark,
        str(tmp_path / "bad"),
        TRANSCRIPTS,
        "conv_id",
        num_buckets=4,
    )
    with pytest.raises(ValueError, match="keyed by"):
        Scd2View(table, bad)
