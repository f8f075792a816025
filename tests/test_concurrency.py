"""Multi-writer commit retry (Iceberg commit-retry analogue).

Two SnapshotTable handles on the same root simulate two writers. The race is
forced deterministically: writer A's `_write_snapshot` is wrapped so that,
on its first invocation, writer B commits first — guaranteeing the pointer
moves between A's snapshot read and A's swap, which is exactly the window
the retry loop covers.
"""

import pytest

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed, write_feed_chunks
from orientdb_neo4j_importer_plugin_spark.lake import (
    CommitConflictError,
    SnapshotTable,
)
from orientdb_neo4j_importer_plugin_spark.oracle import (
    reduce_events_duckdb,
    table_matches_oracle,
)
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS_V1

OUT = ["conv_id", "turn_idx", "role", "text", "ts"]


def state(table):
    return [
        tuple(r)
        for r in table.read().orderBy("conv_id", "turn_idx").select(*OUT).collect()
    ]


def setup(spark, tmp_path):
    feed = gen_feed(
        spark, n_convs=8, turns_per_conv=5, updates_per_key=1, delete_every=9
    )
    feed_dir = str(tmp_path / "feed")
    write_feed_chunks(feed, feed_dir)
    root = str(tmp_path / "table")
    SnapshotTable.create(spark, root, TRANSCRIPTS_V1, "conv_id", num_buckets=8)
    full = spark.read.parquet(feed_dir)
    return full, feed_dir, root


def interleave(writer_a, commit_b):
    """Arrange for `commit_b()` to land between writer A's snapshot read and
    pointer swap (fires once, then restores the original path)."""
    original = writer_a._write_snapshot
    fired = {"done": False}

    def racy(snap, expected_parent):
        if not fired["done"]:
            fired["done"] = True
            commit_b()
        return original(snap, expected_parent)

    writer_a._write_snapshot = racy
    return fired


def test_mor_append_rebases_onto_concurrent_commit(spark, tmp_path):
    full, feed_dir, root = setup(spark, tmp_path)
    a = SnapshotTable.load(spark, root)
    b = SnapshotTable.load(spark, root)
    mid = 20
    fired = interleave(
        a, lambda: apply_changes(full.filter(full.lsn >= mid), b, batch_id="B", mode="mor")
    )
    apply_changes(full.filter(full.lsn < mid), a, batch_id="A", mode="mor")
    assert fired["done"], "the race was never exercised"
    snap = a.current()
    # both commits present: B landed first, A rebased on top
    assert snap.ledger["B"] < snap.ledger["A"]
    ok, msg = table_matches_oracle(
        state(a),
        [
            tuple(r)
            for r in reduce_events_duckdb(
                f"{feed_dir}/*.parquet", has_tool=False
            ).fetchall()
        ],
    )
    assert ok, msg


def test_cow_disjoint_buckets_rebase(spark, tmp_path):
    full, feed_dir, root = setup(spark, tmp_path)
    a = SnapshotTable.load(spark, root)
    b = SnapshotTable.load(spark, root)
    # partition the feed into bucket-disjoint conv sets (COW touches only
    # the buckets its keys hash to), so the rebase-success path is exercised
    # deterministically
    from orientdb_neo4j_importer_plugin_spark.lake.table import bucket_expr

    nb = a.current().num_buckets
    by_bucket = full.select(
        "conv_id", bucket_expr("conv_id", nb).alias("b")
    ).distinct().collect()
    half = sorted({r.conv_id for r in by_bucket if r.b < nb // 2})
    assert half and len(half) < len({r.conv_id for r in by_bucket})
    fa = full.filter(full.conv_id.isin(half))
    fb = full.filter(~full.conv_id.isin(half))
    fired = interleave(a, lambda: apply_changes(fb, b, batch_id="B"))
    apply_changes(fa, a, batch_id="A")  # must rebase, not conflict
    assert fired["done"]
    final = a.current()
    assert "A" in final.ledger and "B" in final.ledger
    assert final.ledger["B"] < final.ledger["A"]
    ok, msg = table_matches_oracle(
        state(a),
        [
            tuple(r)
            for r in reduce_events_duckdb(
                f"{feed_dir}/*.parquet", has_tool=False
            ).fetchall()
        ],
    )
    assert ok, msg


def test_cow_overlapping_buckets_conflict(spark, tmp_path):
    full, feed_dir, root = setup(spark, tmp_path)
    a = SnapshotTable.load(spark, root)
    b = SnapshotTable.load(spark, root)
    # same rows on both writers -> same buckets -> guaranteed overlap
    fired = interleave(a, lambda: apply_changes(full, b, batch_id="B"))
    with pytest.raises(CommitConflictError):
        apply_changes(full, a, batch_id="A")
    assert fired["done"]
    # B's commit is intact; A left no snapshot
    assert "B" in a.current().ledger and "A" not in a.current().ledger


def test_same_batch_id_race_is_replay_noop(spark, tmp_path):
    full, feed_dir, root = setup(spark, tmp_path)
    a = SnapshotTable.load(spark, root)
    b = SnapshotTable.load(spark, root)
    fired = interleave(a, lambda: apply_changes(full, b, batch_id="X", mode="mor"))
    apply_changes(full, a, batch_id="X", mode="mor")
    assert fired["done"]
    snap = a.current()
    # exactly one committed version for batch X (B's); A became a no-op
    assert snap.ledger["X"] == 1
    assert snap.version == 1


def test_compaction_recomputes_after_concurrent_delta(spark, tmp_path):
    full, feed_dir, root = setup(spark, tmp_path)
    a = SnapshotTable.load(spark, root)
    b = SnapshotTable.load(spark, root)
    mid = 20
    apply_changes(full.filter(full.lsn < mid), a, batch_id="base", mode="mor")
    # B lands a delta in the same buckets while A is mid-compaction
    fired = interleave(
        a,
        lambda: apply_changes(
            full.filter(full.lsn >= mid), b, batch_id="late", mode="mor"
        ),
    )
    a.compact()
    assert fired["done"]
    # nothing lost: final state equals the full-feed oracle
    ok, msg = table_matches_oracle(
        state(a),
        [
            tuple(r)
            for r in reduce_events_duckdb(
                f"{feed_dir}/*.parquet", has_tool=False
            ).fetchall()
        ],
    )
    assert ok, msg


def test_cow_conflict_removes_stale_files(spark, tmp_path):
    """A conflicted COW rewrite must not leave its (uncommittable) data
    files behind."""
    import glob
    import os

    full, feed_dir, root = setup(spark, tmp_path)
    a = SnapshotTable.load(spark, root)
    b = SnapshotTable.load(spark, root)
    fired = interleave(a, lambda: apply_changes(full, b, batch_id="B"))
    with pytest.raises(CommitConflictError):
        apply_changes(full, a, batch_id="A")
    assert fired["done"]
    live = set(a.current().all_files())
    on_disk = {
        p
        for p in glob.glob(os.path.join(root, "data", "**", "*.parquet"),
                           recursive=True)
    }
    assert on_disk == live  # no orphaned commit dirs


def test_vacuum_orphans(spark, tmp_path):
    """Files written by a crashed writer (no snapshot references them) are
    swept once old enough; live files and young files survive."""
    import os

    full, feed_dir, root = setup(spark, tmp_path)
    t = SnapshotTable.load(spark, root)
    apply_changes(full, t, batch_id="b0", mode="mor")
    # simulate a crashed writer: a data dir with no snapshot reference
    ghost = os.path.join(root, "data", "delta-99999999-dead")
    os.makedirs(ghost)
    with open(os.path.join(ghost, "part-0.parquet"), "w") as fh:
        fh.write("x")
    n_live = len(t.current().all_files())
    assert t.vacuum_orphans(older_than_sec=3600) == 0  # too young to sweep
    old = os.path.join(ghost, "part-0.parquet")
    os.utime(old, (0, 0))
    os.utime(ghost, (0, 0))  # dirs are age-guarded too (in-flight writes)
    assert t.vacuum_orphans(older_than_sec=3600) == 1
    assert not os.path.exists(ghost)  # empty dir pruned
    assert len(t.current().all_files()) == n_live
    assert t.read().count() > 0  # table still reads


def test_cow_conflict_detected_across_read_window(spark, tmp_path):
    """A commit landing between a caller's table READ and its
    commit_bucket_rewrite must conflict — validation is anchored on the
    snapshot the rewrite was read from (base_snapshot), not on whatever is
    current at commit time."""
    from pyspark.sql import functions as F

    from orientdb_neo4j_importer_plugin_spark.lake.table import (
        BUCKET_COL,
        bucket_expr_for,
    )

    full, feed_dir, root = setup(spark, tmp_path)
    a = SnapshotTable.load(spark, root)
    b = SnapshotTable.load(spark, root)
    apply_changes(full.filter("lsn < 20"), a, batch_id="seed", mode="mor")
    # A reads for a rewrite of every delta bucket...
    snap_a = a.current()
    ids = sorted(int(x) for x in snap_a.deltas)
    merged = a.read_buckets(ids, snapshot=snap_a, raw=True).withColumn(
        BUCKET_COL, bucket_expr_for(snap_a)
    )
    # ...B lands more rows in those buckets AFTER A's read...
    apply_changes(full.filter("lsn >= 20"), b, batch_id="late", mode="mor")
    # ...A's commit must refuse (B's rows would be folded away)
    with pytest.raises(CommitConflictError):
        a.commit_bucket_rewrite(
            merged, touched_buckets=ids, batch_id=None, base_snapshot=snap_a
        )
    # and B's rows are intact
    ok, msg = table_matches_oracle(
        state(a),
        [
            tuple(r)
            for r in reduce_events_duckdb(
                f"{feed_dir}/*.parquet", has_tool=False
            ).fetchall()
        ],
    )
    assert ok, msg


def test_rebase_preserves_concurrent_schema_evolution(spark, tmp_path):
    """A rebased commit must re-merge schemas: a column added by a
    concurrent writer survives in the rebased snapshot."""
    from pyspark.sql.types import StringType, StructField, StructType

    full, feed_dir, root = setup(spark, tmp_path)
    a = SnapshotTable.load(spark, root)
    b = SnapshotTable.load(spark, root)

    def b_evolves():
        incoming = StructType(
            list(b.current().schema.fields)
            + [StructField("tool", StringType(), True)]
        )
        b.evolve_schema(incoming)

    fired = interleave(a, b_evolves)
    apply_changes(full.filter("lsn < 20"), a, batch_id="A", mode="mor")
    assert fired["done"]
    names = {f.name for f in a.current().schema.fields}
    assert "tool" in names, "concurrent schema evolution was clobbered by rebase"


def test_orphan_version_claim_is_reclaimed(spark, tmp_path):
    """A version file claimed by a crashed writer (pointer never advanced)
    must not wedge the table: old claims are reclaimed, young ones block."""
    import os

    from orientdb_neo4j_importer_plugin_spark.lake import ConcurrentCommitError

    full, feed_dir, root = setup(spark, tmp_path)
    t = SnapshotTable.load(spark, root)
    # fake a crashed writer's claim of v1 (pointer still at v0)
    claim = os.path.join(root, "metadata", "v00000001.json")
    with open(claim, "w") as fh:
        fh.write("{}")
    # young claim: commit fails loudly (could be a live writer mid-swap)
    with pytest.raises(ConcurrentCommitError):
        apply_changes(full.filter("lsn < 20"), t, batch_id="x", mode="mor")
    # stale claim: reclaimed and the commit goes through
    os.utime(claim, (0, 0))
    res = apply_changes(full.filter("lsn < 20"), t, batch_id="x2", mode="mor")
    assert res.snapshot_version == 1
    # expire anchored on the pointer never deletes the live snapshot
    assert t.expire_snapshots(keep_last=1) == 0
    assert t.current().version == 1


def test_mor_append_conflicts_with_concurrent_rebucket(spark, tmp_path):
    """A delta append whose bucket ids were computed under the OLD layout
    must conflict with a concurrent rebucket, not rebase (the rows would be
    invisible to every pruned read under the new layout)."""
    full, feed_dir, root = setup(spark, tmp_path)
    a = SnapshotTable.load(spark, root)
    b = SnapshotTable.load(spark, root)
    apply_changes(full.filter("lsn < 20"), a, batch_id="seed", mode="mor")
    fired = interleave(a, lambda: b.rebucket(16))
    with pytest.raises(CommitConflictError):
        apply_changes(full.filter("lsn >= 20"), a, batch_id="late", mode="mor")
    assert fired["done"]
    # recompute against the new layout converges
    apply_changes(full.filter("lsn >= 20"), a, batch_id="late", mode="mor")
    ok, msg = table_matches_oracle(
        state(a),
        [
            tuple(r)
            for r in reduce_events_duckdb(
                f"{feed_dir}/*.parquet", has_tool=False
            ).fetchall()
        ],
    )
    assert ok, msg


def test_rollback_reverts_watermark(spark, tmp_path):
    """Rolling back must restore the TARGET's event-time watermark, or
    replayed batches get late-dropped against the abandoned future hwm."""
    full, feed_dir, root = setup(spark, tmp_path)
    t = SnapshotTable.load(spark, root)
    apply_changes(full.filter("lsn < 20"), t, batch_id="b0", mode="mor")
    v1 = t.current().version
    hwm_v1 = t.current().lineage[-1].get("event_ts_max")
    apply_changes(full.filter("lsn >= 20"), t, batch_id="b1", mode="mor")
    assert t.current().lineage[-1]["event_ts_max"] >= hwm_v1
    snap = t.rollback(v1)
    assert snap.lineage[-2].get("event_ts_max") == hwm_v1  # [-1] is the marker
    hwms = [e["event_ts_max"] for e in snap.lineage if "event_ts_max" in e]
    assert max(hwms) == hwm_v1  # b1's future watermark is gone


def test_mor_append_conflicts_with_rebucket_before_commit_call(spark, tmp_path):
    """The wide window: a rebucket that fully lands while the apply is still
    in its Spark jobs (i.e. BEFORE commit_delta_append is even called) must
    still conflict — the guard has to validate against the snapshot the
    bucket ids were computed from, not the commit-time current()."""
    import glob
    import os

    from orientdb_neo4j_importer_plugin_spark.cdc.apply import BUCKET_COL, bucket_expr
    from pyspark.sql import functions as F

    full, feed_dir, root = setup(spark, tmp_path)
    t = SnapshotTable.load(spark, root)
    apply_changes(full.filter("lsn < 20"), t, batch_id="seed", mode="mor")
    snap = t.current()  # bucket ids will derive from THIS layout (8 buckets)
    winners = (
        full.filter("lsn >= 20 and op = 'I'")
        .select(
            "conv_id", "turn_idx", "role", "text", "ts",
            F.col("lsn").alias("__lsn"), F.lit(False).alias("__deleted"),
        )
        .withColumn(BUCKET_COL, bucket_expr("conv_id", snap.num_buckets))
    )
    SnapshotTable.load(spark, root).rebucket(16)  # lands fully, no interleave
    with pytest.raises(CommitConflictError):
        t.commit_delta_append(
            winners, list(range(snap.num_buckets)), batch_id="late",
            base_snapshot=snap,
        )
    # the conflicted append's delta files were cleaned up, not orphaned
    # (snap is v1 -> the conflicted dir would be delta-00000002-*; the seed
    # batch's live delta-00000001-* must survive)
    assert not glob.glob(os.path.join(root, "data", "delta-00000002-*"))
    assert glob.glob(os.path.join(root, "data", "delta-00000001-*"))
    # recompute against the new layout converges
    apply_changes(full.filter("lsn >= 20"), t, batch_id="late", mode="mor")
    ok, msg = table_matches_oracle(
        state(t),
        [
            tuple(r)
            for r in reduce_events_duckdb(
                f"{feed_dir}/*.parquet", has_tool=False
            ).fetchall()
        ],
    )
    assert ok, msg
