"""Shallow (zero-copy) table clones: metadata-only branch of a snapshot,
independent writes, ledger carry-over, maintenance ownership guard."""

import os

import pytest

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS_V1

OUT = ["conv_id", "turn_idx", "role", "text", "ts"]


def state(t):
    return [
        tuple(r)
        for r in t.read().orderBy("conv_id", "turn_idx").select(*OUT).collect()
    ]


def _setup(spark, tmp_path):
    feed = gen_feed(
        spark, n_convs=10, turns_per_conv=5, updates_per_key=1, delete_every=7
    )
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    hi = feed.agg({"lsn": "max"}).first()[0] + 1
    apply_changes(feed.filter(feed.lsn < hi // 2), src, batch_id="b1", mode="mor")
    apply_changes(feed.filter(feed.lsn >= hi // 2), src, batch_id="b2", mode="mor")
    return src, feed, hi


def test_clone_is_zero_copy_and_reads_equal(spark, tmp_path):
    src, _, _ = _setup(spark, tmp_path)
    clone = src.clone(str(tmp_path / "clone"))
    assert state(clone) == state(src)
    # ZERO data files copied: everything under the clone's data dir is new
    data_files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(clone.data_dir)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert data_files == []
    assert clone.current().version == 0
    assert clone.current().lineage[0]["cloned_from"] == src.root


def test_clone_diverges_independently(spark, tmp_path):
    src, feed, hi = _setup(spark, tmp_path)
    clone = src.clone(str(tmp_path / "clone"))
    before_src = state(src)

    # new batch into the CLONE only
    extra = feed.limit(0).sparkSession.createDataFrame(
        [(hi + 1, "I", "conv_zz", 0, "user", "clone-only row", None, "p0")],
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, ts timestamp, source_part string",
    )
    apply_changes(extra, clone, batch_id="c1", mode="mor")
    assert state(src) == before_src  # source untouched
    assert ("conv_zz", 0) in {(r[0], r[1]) for r in state(clone)}

    # new batch into the SOURCE only
    extra2 = extra.selectExpr(
        "lsn + 1 as lsn", "op", "'conv_yy' as conv_id", "turn_idx",
        "role", "'src-only row' as text", "ts", "source_part",
    )
    apply_changes(extra2, src, batch_id="s3", mode="mor")
    assert ("conv_yy", 0) not in {(r[0], r[1]) for r in state(clone)}


def test_clone_carries_ledger_for_exactly_once(spark, tmp_path):
    src, feed, hi = _setup(spark, tmp_path)
    clone = src.clone(str(tmp_path / "clone"))
    # replaying a batch the SOURCE already applied is a no-op in the clone
    res = apply_changes(
        feed.filter(feed.lsn < hi // 2), clone, batch_id="b1", mode="mor"
    )
    assert res.skipped_replay
    assert state(clone) == state(src)


def test_clone_time_travel_snapshot(spark, tmp_path):
    src, _, _ = _setup(spark, tmp_path)
    v1 = src.snapshot_at(1)
    clone = src.clone(str(tmp_path / "clone_v1"), snapshot=v1)
    want = [
        tuple(r)
        for r in src.read(snapshot=v1)
        .orderBy("conv_id", "turn_idx")
        .select(*OUT)
        .collect()
    ]
    assert state(clone) == want


def test_clone_maintenance_never_deletes_borrowed_files(spark, tmp_path):
    src, feed, hi = _setup(spark, tmp_path)
    src_files = set(src.current().all_files())
    clone = src.clone(str(tmp_path / "clone"))

    # evolve the clone: compaction rewrites every bucket under the clone's
    # root, dropping all borrowed references from the CURRENT snapshot
    clone.compact()
    # expiring the clone's history must not touch the source's files
    clone.expire_snapshots(keep_last=1)
    assert all(os.path.exists(f) for f in src_files), "borrowed file deleted"
    assert state(src) == [
        tuple(r)
        for r in src.read().orderBy("conv_id", "turn_idx").select(*OUT).collect()
    ]
    # and the clone's own maintenance still works on its own files
    assert clone.current().version >= 1


def test_clone_refuses_existing_root(spark, tmp_path):
    src, _, _ = _setup(spark, tmp_path)
    src.clone(str(tmp_path / "clone"))
    with pytest.raises(FileExistsError):
        src.clone(str(tmp_path / "clone"))
