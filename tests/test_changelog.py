"""Row-level change-data-feed (SnapshotTable.changelog): op classification,
no-op suppression across compaction/COW rewrites, and layout changes
between the two versions."""

from pyspark.sql import functions as F

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed, write_feed_chunks
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS_V1


def setup(spark, tmp_path):
    feed = gen_feed(
        spark, n_convs=10, turns_per_conv=6, updates_per_key=2, delete_every=5
    )
    feed_dir = str(tmp_path / "feed")
    write_feed_chunks(feed, feed_dir)
    table = SnapshotTable.create(
        spark, str(tmp_path / "table"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    return spark.read.parquet(feed_dir), table


def _expected_diff(spark, full, pred1):
    """Reference diff computed independently: LWW state of batch1 vs all."""
    w = F.max(F.struct("lsn", "op", "role", "text", "ts")).alias("w")

    def lww(df):
        return {
            (r.conv_id, r.turn_idx): r.w
            for r in df.groupBy("conv_id", "turn_idx").agg(w).collect()
        }

    s1, s2 = lww(full.filter(pred1)), lww(full)
    out = {}
    for k, new in s2.items():
        old = s1.get(k)
        old_live = old is not None and old.op != "D"
        new_live = new.op != "D"
        if not old_live and new_live:
            out[k] = ("I", new.text)
        elif old_live and not new_live:
            out[k] = ("D", None)
        elif old_live and new_live and old.lsn != new.lsn:
            out[k] = ("U", new.text)
    return out


PRED1 = "(op = 'I' and pmod(turn_idx, 5) != 0) or (op != 'I' and pmod(lsn, 2) = 0)"
PRED2 = "(op = 'I' and pmod(turn_idx, 5) = 0) or (op != 'I' and pmod(lsn, 2) = 1)"


def test_changelog_classifies_i_u_d(spark, tmp_path):
    full, table = setup(spark, tmp_path)
    apply_changes(full.filter(PRED1), table, batch_id="b1", mode="mor")
    v1 = table.current().version
    apply_changes(full.filter(PRED2), table, batch_id="b2", mode="mor")
    got = {
        (r.conv_id, r.turn_idx): (r.op, r.text)
        for r in table.changelog(v1).collect()
    }
    want = _expected_diff(spark, full, PRED1)
    assert got == want
    assert {op for op, _ in got.values()} == {"I", "U", "D"}  # all kinds appear


def test_changelog_suppresses_compaction_noise(spark, tmp_path):
    """Compaction/COW rewrites copy unchanged rows into NEW files; the
    changelog must not report them as changes."""
    full, table = setup(spark, tmp_path)
    apply_changes(full, table, batch_id="all", mode="mor")
    v1 = table.current().version
    table.compact()  # rewrites every delta-holding bucket
    assert table.current().version > v1
    assert table.changelog(v1).count() == 0


def test_changelog_across_rebucket(spark, tmp_path):
    """A rebucket between the two versions changes every key->bucket
    mapping; the diff must use each snapshot's own layout."""
    full, table = setup(spark, tmp_path)
    apply_changes(full.filter(PRED1), table, batch_id="b1", mode="mor")
    v1 = table.current().version
    table.rebucket(16)
    apply_changes(full.filter(PRED2), table, batch_id="b2", mode="mor")
    got = {
        (r.conv_id, r.turn_idx): (r.op, r.text)
        for r in table.changelog(v1).collect()
    }
    # rebucket rewrites every file, so EVERY key is a candidate — the state
    # diff must still reduce to exactly the true changes
    want = _expected_diff(spark, full, PRED1)
    assert got == want


def test_changelog_sees_removal_only_window(spark, tmp_path):
    """A rollback inside the window removes files without adding any — the
    keys that went live->gone must still surface as D rows (candidates come
    from removed files too, not just added ones)."""
    full, table = setup(spark, tmp_path)
    apply_changes(full.filter("lsn < 10"), table, batch_id="b1", mode="mor")
    v1 = table.current().version
    live_v1 = {(r.conv_id, r.turn_idx) for r in table.read().collect()}
    apply_changes(full.filter("lsn >= 10 and lsn < 20"), table, batch_id="b2",
                  mode="mor")
    live_v2 = {(r.conv_id, r.turn_idx) for r in table.read().collect()}
    v2 = table.current().version
    table.rollback(v1)  # removal-only: v3's file set == v1's
    got = {(r.conv_id, r.turn_idx): r.op for r in table.changelog(v2).collect()}
    want = {}
    for k in live_v2 - live_v1:
        want[k] = "D"  # live at v2, gone after rollback
    for k in live_v1 - live_v2:
        want[k] = "I"  # deleted by b2, resurrected by the rollback
    # keys live in both may differ by payload (b2 updates rolled back) -> U
    assert {k: v for k, v in got.items() if v in ("I", "D")} == want
