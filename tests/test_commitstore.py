"""Commit-protocol storage seam: the conditional-PUT object-store port
(ObjectStoreCommitStore over a simulated conditional object client) runs
the SAME multi-writer protocol the local-FS store passes, with the same
oracle-checked outcomes. (test_concurrency/test_multiwriter_process keep
exercising LocalFSCommitStore through the default path.)"""

import os

import pytest

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed, write_feed_chunks
from orientdb_neo4j_importer_plugin_spark.lake import (
    ConcurrentCommitError,
    SnapshotTable,
)
from orientdb_neo4j_importer_plugin_spark.lake.commitstore import (
    DirObjectClient,
    ObjectStoreCommitStore,
)
from orientdb_neo4j_importer_plugin_spark.oracle import (
    reduce_events_duckdb,
    table_matches_oracle,
)
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS_V1

OUT = ["conv_id", "turn_idx", "role", "text", "ts"]


def _store(tmp_path, **kw):
    return ObjectStoreCommitStore(DirObjectClient(str(tmp_path / "objsrv")), **kw)


def test_conditional_client_semantics(tmp_path):
    c = DirObjectClient(str(tmp_path / "srv"))
    k = str(tmp_path / "obj")
    e1 = c.put_if_absent(k, "a")
    assert e1 is not None
    assert c.put_if_absent(k, "b") is None  # already exists
    assert c.get(k) == "a"
    assert c.put_if_match(k, "c", "wrong-etag") is None  # stale etag
    e2 = c.put_if_match(k, "c", e1)
    assert e2 is not None and e2 != e1
    assert c.get(k) == "c"
    head = c.head(k)
    assert head is not None and head[0] == e2
    c.delete(k)
    assert c.get(k) is None and c.head(k) is None
    # if-match with None = create-if-absent
    assert c.put_if_match(k, "d", None) is not None


def test_object_store_commit_end_to_end(spark, tmp_path):
    """Full CDC apply path with every commit serialized through the
    conditional-object protocol; final state matches the DuckDB oracle."""
    feed = gen_feed(
        spark, n_convs=8, turns_per_conv=5, updates_per_key=1, delete_every=9
    )
    feed_dir = str(tmp_path / "feed")
    write_feed_chunks(feed, feed_dir)
    root = str(tmp_path / "table")
    t = SnapshotTable.create(
        spark, root, TRANSCRIPTS_V1, "conv_id", num_buckets=8,
        commit_store=_store(tmp_path),
    )
    full = spark.read.parquet(feed_dir)
    apply_changes(full.filter("lsn < 20"), t, batch_id="b1", mode="mor")
    apply_changes(full.filter("lsn >= 20"), t, batch_id="b2", mode="mor")
    t.compact()
    got = [
        tuple(r)
        for r in t.read().orderBy("conv_id", "turn_idx").select(*OUT).collect()
    ]
    ok, msg = table_matches_oracle(
        got,
        [
            tuple(r)
            for r in reduce_events_duckdb(
                f"{feed_dir}/*.parquet", has_tool=False
            ).fetchall()
        ],
    )
    assert ok, msg
    # replay is still a ledger no-op through the object-store path
    res = apply_changes(full.filter("lsn < 20"), t, batch_id="b1", mode="mor")
    assert res.skipped_replay


def test_object_store_two_writer_race_rebases(spark, tmp_path):
    """Writer B commits between A's snapshot read and A's pointer CAS; A's
    first swap loses (CAS mismatch) and the retry loop rebases it — same
    contract as the local-FS suite's interleave tests."""
    feed = gen_feed(spark, n_convs=6, turns_per_conv=4, updates_per_key=1)
    feed_dir = str(tmp_path / "feed")
    write_feed_chunks(feed, feed_dir)
    root = str(tmp_path / "table")
    store = _store(tmp_path)
    SnapshotTable.create(
        spark, root, TRANSCRIPTS_V1, "conv_id", num_buckets=4, commit_store=store,
    )
    a = SnapshotTable.load(spark, root, commit_store=store)
    b = SnapshotTable.load(spark, root, commit_store=store)
    full = spark.read.parquet(feed_dir)

    original = a._write_snapshot
    fired = {"done": False}

    def racy(snap, expected_parent):
        if not fired["done"]:
            fired["done"] = True
            apply_changes(full.filter("lsn >= 12"), b, batch_id="B", mode="mor")
        return original(snap, expected_parent)

    a._write_snapshot = racy
    apply_changes(full.filter("lsn < 12"), a, batch_id="A", mode="mor")
    assert fired["done"]
    snap = a.current()
    assert snap.ledger["B"] < snap.ledger["A"]  # B first, A rebased on top


def test_object_store_orphan_claims_block_by_default(spark, tmp_path):
    """reclaim_orphans=False (the default): an orphan claim is NEVER
    deleted — correctness without any lease-timing assumption — so the
    commit fails loudly regardless of the claim's age."""
    root = str(tmp_path / "table")
    t = SnapshotTable.create(
        spark, root, TRANSCRIPTS_V1, "conv_id", num_buckets=4,
        commit_store=_store(tmp_path),
    )
    feed = gen_feed(spark, n_convs=3, turns_per_conv=3)
    claim = os.path.join(root, "metadata", "v00000001.json")
    t.commit_store.client.put_if_absent(claim, "{}")
    os.utime(claim, (0, 0))  # ancient — still must not be reclaimed
    with pytest.raises(ConcurrentCommitError):
        apply_changes(feed, t, batch_id="x", mode="mor")


def test_object_store_orphan_reclaim_opt_in(spark, tmp_path):
    """With reclaim_orphans=True the local-FS liveness behavior returns:
    stale claims (ahead of the pointer, older than the timeout) are
    reclaimed and the commit proceeds."""
    root = str(tmp_path / "table")
    t = SnapshotTable.create(
        spark, root, TRANSCRIPTS_V1, "conv_id", num_buckets=4,
        commit_store=_store(tmp_path, reclaim_orphans=True),
    )
    feed = gen_feed(spark, n_convs=3, turns_per_conv=3)
    claim = os.path.join(root, "metadata", "v00000001.json")
    t.commit_store.client.put_if_absent(claim, "{}")
    # young claim: blocks (may be a live writer mid-swap)
    with pytest.raises(ConcurrentCommitError):
        apply_changes(feed, t, batch_id="x", mode="mor")
    os.utime(claim, (0, 0))  # stale: reclaimed, commit goes through
    res = apply_changes(feed, t, batch_id="x2", mode="mor")
    assert res.snapshot_version == 1
    assert t.current().version == 1
