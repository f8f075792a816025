"""Merge-on-read write mode: delta appends + compaction + mixed-mode."""

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed, write_feed_chunks
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.oracle import (
    reduce_events_duckdb,
    table_matches_oracle,
)
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS_V1
from orientdb_neo4j_importer_plugin_spark.streaming import CdcStreamRunner

OUT = ["conv_id", "turn_idx", "role", "text", "ts"]


def state(table):
    return [
        tuple(r)
        for r in table.read().orderBy("conv_id", "turn_idx").select(*OUT).collect()
    ]


def oracle(feed_dir):
    return [
        tuple(r)
        for r in reduce_events_duckdb(f"{feed_dir}/*.parquet", has_tool=False).fetchall()
    ]


def setup(spark, tmp_path, **gen_kw):
    feed = gen_feed(spark, **gen_kw)
    feed_dir = str(tmp_path / "feed")
    write_feed_chunks(feed, feed_dir)
    table = SnapshotTable.create(
        spark, str(tmp_path / "table"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    return spark.read.parquet(feed_dir), feed_dir, table


def test_mor_out_of_order_and_compact(spark, tmp_path):
    full, feed_dir, table = setup(
        spark, tmp_path, n_convs=6, turns_per_conv=6, updates_per_key=2, delete_every=4
    )
    mid = 36
    apply_changes(full.filter(full.lsn >= mid), table, batch_id="late", mode="mor")
    apply_changes(full.filter(full.lsn < mid), table, batch_id="early", mode="mor")
    assert table.current().deltas, "MOR commits must produce delta files"
    ok, msg = table_matches_oracle(state(table), oracle(feed_dir))
    assert ok, msg
    # compaction folds deltas into base; state unchanged
    snap = table.compact()
    assert not snap.deltas
    ok, msg = table_matches_oracle(state(table), oracle(feed_dir))
    assert ok, msg
    # base invariant after compaction: one row per key (incl. tombstones)
    raw = table.read(raw=True)
    assert raw.count() == raw.select("conv_id", "turn_idx").distinct().count()


def test_mixed_cow_then_mor(spark, tmp_path):
    full, feed_dir, table = setup(
        spark, tmp_path, n_convs=5, turns_per_conv=8, updates_per_key=3
    )
    apply_changes(full.filter(full.lsn < 40), table, batch_id="b0", mode="cow")
    apply_changes(
        full.filter((full.lsn >= 40) & (full.lsn < 80)), table, batch_id="b1", mode="mor"
    )
    apply_changes(full.filter(full.lsn >= 80), table, batch_id="b2", mode="cow")
    # the final COW rewrite folded deltas of touched buckets
    ok, msg = table_matches_oracle(state(table), oracle(feed_dir))
    assert ok, msg


def test_mor_replay_ledger(spark, tmp_path):
    full, feed_dir, table = setup(spark, tmp_path, n_convs=3, turns_per_conv=5)
    r1 = apply_changes(full, table, batch_id="m0", mode="mor")
    v = table.current().version
    r2 = apply_changes(full, table, batch_id="m0", mode="mor")
    assert r2.skipped_replay and table.current().version == v
    assert not r1.skipped_replay


def test_streaming_mor_with_compaction(spark, tmp_path):
    feed = gen_feed(spark, n_convs=8, turns_per_conv=6, updates_per_key=2, delete_every=7)
    feed_dir = str(tmp_path / "sfeed")
    write_feed_chunks(feed, feed_dir, chunk_size=48)
    table = SnapshotTable.create(
        spark, str(tmp_path / "stable"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    runner = CdcStreamRunner(
        spark,
        feed_dir,
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        event_schema=feed.schema,
        max_files_per_trigger=1,
        mode="mor",
        compact_every=3,
    )
    runner.run_to_completion(timeout_sec=300)
    ok, msg = table_matches_oracle(state(table), oracle(feed_dir))
    assert ok, msg
    # schema evolution still works through MOR (tool column arrives late)
    from pyspark.sql import functions as F

    v2 = (
        gen_feed(spark, n_convs=8, turns_per_conv=6, updates_per_key=1, v2_from_lsn=0)
        .filter("op = 'U'")
        .withColumn("lsn", F.col("lsn") + 100_000)  # newer than every prior event
    )
    apply_changes(v2, table, batch_id="v2", mode="mor")
    assert "tool" in [f.name for f in table.current().schema.fields]
    assert table.read().filter("tool is not null").count() > 0


def test_verify_and_summarize(spark, tmp_path):
    from orientdb_neo4j_importer_plugin_spark.cdc.verify import (
        summarize,
        verify_replay,
    )

    full, feed_dir, table = setup(
        spark, tmp_path, n_convs=5, turns_per_conv=6, updates_per_key=2, delete_every=5
    )
    apply_changes(full.filter("lsn < 50"), table, batch_id="b0", mode="mor")
    apply_changes(full.filter("lsn >= 50"), table, batch_id="b1", mode="cow")
    rep = verify_replay(table, full)
    assert rep.ok, (rep.missing_rows, rep.extra_rows, rep.table_rows, rep.expected_rows)
    assert sum(rep.per_bucket.values()) == rep.table_rows
    s = summarize(table)
    assert s["rows"] == rep.table_rows
    assert s["committed_batches"] == 2
    assert s["events_in_total"] == full.count()
    # negative control: a corrupted feed (one extra event) must NOT verify
    bad = full.limit(1).selectExpr(
        "lsn + 999999 as lsn", "'U' as op", "conv_id", "turn_idx",
        "role", "'CORRUPTED' as text", "ts", "source_part"
    )
    rep_bad = verify_replay(table, full.unionByName(bad))
    assert not rep_bad.ok


def test_ledger_horizon_pruning(spark, tmp_path, monkeypatch):
    import orientdb_neo4j_importer_plugin_spark.lake.table as lt

    monkeypatch.setattr(lt, "LEDGER_HORIZON", 3)
    full, feed_dir, table = setup(spark, tmp_path, n_convs=3, turns_per_conv=4)
    for i in range(5):
        b = full.filter(f"pmod(lsn, 5) = {i}")
        apply_changes(b, table, batch_id=f"h{i}", mode="mor")
    ledger = table.current().ledger
    assert len(ledger) == 3  # oldest entries pruned
    assert "h0" not in ledger and "h4" in ledger
    # a replay from beyond the horizon re-applies but converges (idempotent)
    v = table.current().version
    apply_changes(full.filter("pmod(lsn, 5) = 0"), table, batch_id="h0", mode="mor")
    assert table.current().version == v + 1
    ok, msg = table_matches_oracle(state(table), oracle(feed_dir))
    assert ok, msg
