"""Snapshot metadata sharding: the root JSON holds per-bucket manifest
references (Iceberg manifest-list analogue), so root size is O(num_buckets)
— independent of data-file count — and commit metadata IO is O(touched
buckets) because unchanged buckets carry their manifest forward by reference.
"""

import datetime
import json
import os

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS_V1

TS = datetime.datetime(2024, 1, 1, 10, 0, 0)
EVENT_COLS = "lsn long, op string, conv_id string, turn_idx int, role string, text string, ts timestamp, source_part int"


def _root_json(table):
    with open(os.path.join(table.meta_dir, "_current")) as fh:
        v = int(fh.read().strip())
    with open(os.path.join(table.meta_dir, f"v{v:08d}.json")) as fh:
        return json.load(fh)


def test_root_metadata_o1_in_file_count(spark, tmp_path):
    table = SnapshotTable.create(
        spark, str(tmp_path / "t4096"), TRANSCRIPTS_V1, "conv_id", num_buckets=4096
    )
    feed = spark.createDataFrame(
        [(i, "I", f"conv_{i}", 0, "user", f"text {i}", TS, 0) for i in range(200)],
        EVENT_COLS,
    )
    apply_changes(feed, table, batch_id="b0", mode="mor")
    root = _root_json(table)
    # no file lists inline — only per-bucket manifest references
    assert "buckets" not in root and "deltas" not in root
    dumped = json.dumps(root["manifests"])
    assert ".parquet" not in dumped
    # root entries bounded by touched buckets (<= 200 keys), not data files
    assert len(root["manifests"]) <= 200
    # the resolved view still sees every data file
    snap = table.current()
    assert sum(len(f) for f in snap.deltas.values()) >= 1
    assert table.read().count() == 200


def test_unchanged_buckets_reuse_manifests(spark, tmp_path):
    table = SnapshotTable.create(
        spark, str(tmp_path / "treuse"), TRANSCRIPTS_V1, "conv_id", num_buckets=64
    )
    wide = spark.createDataFrame(
        [(i, "I", f"conv_{i}", 0, "user", "x", TS, 0) for i in range(300)],
        EVENT_COLS,
    )
    apply_changes(wide, table, batch_id="b0")  # COW seeds many buckets
    m0 = dict(table.current().manifest_paths)
    narrow = spark.createDataFrame(
        [(1000, "U", "conv_1", 0, "user", "y", TS, 0)], EVENT_COLS
    )
    apply_changes(narrow, table, batch_id="b1")
    m1 = table.current().manifest_paths
    changed = {b for b in m0 if m1.get(b) != m0[b]}
    assert len(changed) == 1  # exactly the touched bucket rewrote its manifest
    assert sum(1 for b in m0 if m1.get(b) == m0[b]) == len(m0) - 1
    # state correct after the manifest-sharded commits
    got = {(r.conv_id, r.text) for r in table.read().collect()}
    assert ("conv_1", "y") in got and len(got) == 300


def test_reload_from_disk_resolves_manifests(spark, tmp_path):
    root = str(tmp_path / "treload")
    table = SnapshotTable.create(spark, root, TRANSCRIPTS_V1, "conv_id", num_buckets=8)
    feed = spark.createDataFrame(
        [(i, "I", f"conv_{i}", 0, "user", f"t{i}", TS, 0) for i in range(20)],
        EVENT_COLS,
    )
    apply_changes(feed, table, batch_id="b0")
    fresh = SnapshotTable.load(spark, root)  # empty manifest cache
    assert fresh.read().count() == 20
    assert fresh.current().buckets  # resolved from manifest files


def test_expire_snapshots_removes_orphan_manifests(spark, tmp_path):
    table = SnapshotTable.create(
        spark, str(tmp_path / "texp"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    for i in range(3):
        feed = spark.createDataFrame(
            [(100 * i + j, "I", f"conv_{j}", i, "user", f"r{i}", TS, 0) for j in range(10)],
            EVENT_COLS,
        )
        apply_changes(feed, table, batch_id=f"b{i}")
    n_before = len(os.listdir(table.manifest_dir))
    removed = table.expire_snapshots(keep_last=1)
    assert removed > 0
    assert len(os.listdir(table.manifest_dir)) < n_before
    assert table.read().count() == 30  # 10 convs x 3 turns, all intact
