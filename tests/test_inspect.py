"""Inspect surface (lake/inspect.py): snapshots()/files()/partitions()
metadata tables must agree with the snapshot they describe — paths,
per-kind counts, row totals, stats, ref pins — at the current AND a
time-travelled version, before and after compaction."""

import os

from pyspark.sql import functions as F

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS


def _table(spark, tmp_path, batches=3, n=120):
    table = SnapshotTable.create(
        spark, str(tmp_path / "insp"), TRANSCRIPTS, "conv_id", num_buckets=4
    )
    events = spark.range(n).select(
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
        F.concat(F.lit("c"), (F.col("id") % 40).cast("string")).alias("conv_id"),
        (F.col("id") % 7).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.current_timestamp().alias("ts"),
    )
    per = n // batches
    for i in range(batches):
        apply_changes(
            events.filter(f"lsn >= {i * per} and lsn < {(i + 1) * per}"),
            table,
            batch_id=f"b{i}",
            mode="mor",
        )
    return table


def test_files_matches_snapshot_inventory(spark, tmp_path):
    table = _table(spark, tmp_path)
    snap = table.current()
    rows = table.files().collect()
    # exact path inventory, kinds split the way the snapshot splits them
    assert {r["path"] for r in rows} == set(snap.all_files())
    assert {r["path"] for r in rows if r["kind"] == "base"} == set(
        snap.base_files()
    )
    assert {r["path"] for r in rows if r["kind"] == "delta"} == set(
        snap.delta_files()
    )
    for r in rows:
        assert r["rows"] and r["rows"] > 0
        assert r["size_bytes"] == os.path.getsize(r["path"])
        assert r["lsn_min"] is not None and r["lsn_max"] >= r["lsn_min"]
        # pure-insert feed: no tombstones anywhere
        assert r["tombstones"] is False
        # key bounds recorded (string partition key, stats always exact
        # or conservatively truncated)
        assert r["key_min"] is not None and r["key_max"] >= r["key_min"]


def test_files_row_totals_match_reads(spark, tmp_path):
    table = _table(spark, tmp_path)
    files = table.files()
    # footer row counts sum to the raw (pre-LWW) storage row count
    total = files.agg(F.sum("rows")).collect()[0][0]
    raw = table.read(raw=True).count()
    assert total == raw


def test_partitions_rollup(spark, tmp_path):
    table = _table(spark, tmp_path)
    snap = table.current()
    per = {r["bucket"]: r for r in table.partitions().collect()}
    touched = set(map(int, snap.buckets)) | set(map(int, snap.deltas))
    assert set(per) == touched
    for b, r in per.items():
        assert r["n_base_files"] == len(snap.buckets.get(str(b), []))
        assert r["n_delta_files"] == len(snap.deltas.get(str(b), []))
        assert r["n_files"] == r["n_base_files"] + r["n_delta_files"]
    # compaction clears the delta debt the rollup reported
    table.compact()
    after = {r["bucket"]: r for r in table.partitions().collect()}
    assert all(r["n_delta_files"] == 0 for r in after.values())
    assert all(r["delta_rows"] == 0 for r in after.values())


def test_files_time_travel(spark, tmp_path):
    table = _table(spark, tmp_path)
    v1 = table.current().version
    table.compact()
    old = table.snapshot_at(v1)
    # the old snapshot's inventory is still exactly reconstructable
    assert {r["path"] for r in table.files(old).collect()} == set(
        old.all_files()
    )
    # and differs from the head's (compaction rewrote the layout)
    head_paths = {r["path"] for r in table.files().collect()}
    assert head_paths != set(old.all_files())


def test_snapshots_listing_and_pins(spark, tmp_path):
    table = _table(spark, tmp_path, batches=3)
    table.create_tag("rc1")
    head = table.current().version
    rows = {r["version"]: r for r in table.snapshots().collect()}
    # every retained version listed, newest flagged current
    assert head in rows and rows[head]["is_current"]
    assert sum(1 for r in rows.values() if r["is_current"]) == 1
    assert rows[head]["pinned_by"] == "tag:rc1"
    assert rows[head]["last_batch_id"] == "b2"
    assert rows[head]["last_mode"] == "mor"
    assert rows[head]["n_batches"] == 3
    # parent chain is the version order
    assert rows[head]["parent"] == head - 1
    # committed_at is monotone along the chain
    vs = sorted(rows)
    epochs = [rows[v]["committed_at"] for v in vs if rows[v]["committed_at"]]
    assert epochs == sorted(epochs)


def test_empty_table(spark, tmp_path):
    table = SnapshotTable.create(
        spark, str(tmp_path / "empty"), TRANSCRIPTS, "conv_id", num_buckets=4
    )
    assert table.files().count() == 0
    assert table.partitions().count() == 0
    snaps = table.snapshots().collect()
    assert len(snaps) == 1 and snaps[0]["is_current"]
    assert snaps[0]["n_batches"] == 0


def test_tombstone_flag_surfaces(spark, tmp_path):
    table = _table(spark, tmp_path, batches=1, n=40)
    deletes = spark.range(5).select(
        (F.col("id") + 1000).alias("lsn"),
        F.lit("D").alias("op"),
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("conv_id"),
        (F.col("id") % 7).cast("int").alias("turn_idx"),
        F.lit(None).cast("string").alias("role"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    apply_changes(deletes, table, batch_id="del", mode="mor")
    rows = table.files().collect()
    assert any(r["tombstones"] for r in rows if r["kind"] == "delta")
