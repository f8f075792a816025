"""`lake_cdf` Python Data Source: streaming + batch change-feed reads.

Contract under test: rows emitted for version v are exactly the storage
rows of files ADDED by commit v (MOR delta = the batch's LWW winners,
tombstones as op='D'), offsets are version numbers, and a checkpointed
restart resumes where it stopped (exactly-once over immutable files).
"""

import time

from pyspark.sql import functions as F

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed, write_feed_chunks
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS_V1
from orientdb_neo4j_importer_plugin_spark.streaming.cdf_source import (
    LakeCdfDataSource,
)


def _mor_table(spark, tmp_path, n_batches=3):
    feed = gen_feed(
        spark, n_convs=8, turns_per_conv=6, updates_per_key=2, delete_every=5
    )
    feed_dir = str(tmp_path / "feed")
    write_feed_chunks(feed, feed_dir)
    table = SnapshotTable.create(
        spark, str(tmp_path / "table"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    full = spark.read.parquet(feed_dir)
    hi = full.agg(F.max("lsn")).first()[0] + 1
    step = hi // n_batches + 1
    for i in range(n_batches):
        batch = full.filter(
            (full.lsn >= i * step) & (full.lsn < (i + 1) * step)
        )
        apply_changes(batch, table, batch_id=f"b{i}", mode="mor")
    return table


def _register(spark):
    # idempotent across the shared session
    spark.dataSource.register(LakeCdfDataSource)


def test_batch_reader_matches_changes_since(spark, tmp_path):
    table = _mor_table(spark, tmp_path)
    _register(spark)
    got = (
        spark.read.format("lake_cdf")
        .option("path", table.root)
        .option("fromVersion", 0)
        .load()
    )
    # every MOR winner row (incl. tombstones) surfaces exactly once
    want = table.changes_since(0, raw=True)
    assert got.count() == want.count()
    eng = got.select("conv_id", "turn_idx", F.col("_lsn").alias("__lsn"))
    ora = want.select("conv_id", "turn_idx", "__lsn")
    assert eng.exceptAll(ora).count() == 0
    assert ora.exceptAll(eng).count() == 0
    # op D rows == tombstone rows
    assert (
        got.filter("op = 'D'").count()
        == want.filter("__deleted").count()
    )
    # _commit_version tags each row with the version whose commit added it
    versions = sorted(
        r[0] for r in got.select("_commit_version").distinct().collect()
    )
    assert versions == [1, 2, 3]
    per_v = {
        r["_commit_version"]: r["n"]
        for r in got.groupBy("_commit_version").agg(F.count("*").alias("n")).collect()
    }
    for v, n in per_v.items():
        assert table.changelog(v - 1, v).count() <= n  # file-level >= row-level


def test_batch_reader_window(spark, tmp_path):
    table = _mor_table(spark, tmp_path)
    _register(spark)

    def window(a, b):
        return (
            spark.read.format("lake_cdf")
            .option("path", table.root)
            .option("fromVersion", a)
            .option("toVersion", b)
            .load()
        )

    total = window(0, 3).count()
    assert total == window(0, 1).count() + window(1, 3).count()
    assert window(2, 2).count() == 0


def test_stream_tail_and_resume(spark, tmp_path):
    table = _mor_table(spark, tmp_path, n_batches=2)
    _register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sink")

    def run_once():
        q = (
            spark.readStream.format("lake_cdf")
            .option("path", table.root)
            .option("startingVersion", 0)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive

    run_once()
    first = spark.read.parquet(out)
    want_first = table.changes_since(0, raw=True).count()
    assert first.count() == want_first

    # new commit after the stream drained -> only the new version on resume
    feed2 = gen_feed(
        spark, n_convs=4, turns_per_conv=3, updates_per_key=1, delete_every=0
    )
    apply_changes(feed2, table, batch_id="late", mode="mor")
    run_once()
    second = spark.read.parquet(out)
    new_rows = second.filter("_commit_version = 3")
    assert new_rows.count() == second.count() - first.count()
    assert new_rows.count() > 0
    # no duplicates: versions 1..2 rows were not re-emitted
    assert second.count() == want_first + new_rows.count()


def test_cow_history_replay_reconstructs_state(spark, tmp_path):
    """COW commits re-emit rewritten buckets, so the tail is a superset of
    the row-level diff — but LWW over (commit_version, lsn) must still
    reconstruct the exact table state (the consumer-side replay contract)."""
    feed = gen_feed(
        spark, n_convs=10, turns_per_conv=5, updates_per_key=2, delete_every=4
    )
    table = SnapshotTable.create(
        spark, str(tmp_path / "cow"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    hi = feed.agg(F.max("lsn")).first()[0] + 1
    for i, (lo, up) in enumerate([(0, hi // 2), (hi // 2, hi)]):
        apply_changes(
            feed.filter((feed.lsn >= lo) & (feed.lsn < up)),
            table,
            batch_id=f"c{i}",
        )
    _register(spark)
    cdf = (
        spark.read.format("lake_cdf")
        .option("path", table.root)
        .option("fromVersion", 0)
        .load()
    )
    payload = ["role", "text", "ts"]
    w = F.max(F.struct("_commit_version", "_lsn", "op", *payload)).alias("w")
    state = (
        cdf.groupBy("conv_id", "turn_idx")
        .agg(w)
        .select("conv_id", "turn_idx", "w.op", *[f"w.{c}" for c in payload])
        .filter("op <> 'D'")
        .drop("op")
    )
    want = table.read().select("conv_id", "turn_idx", *payload)
    assert state.exceptAll(want).count() == 0
    assert want.exceptAll(state).count() == 0
    # the tail is file-level: strictly more history rows than final state
    assert cdf.count() >= want.count()


def test_replay_survives_rebucket(spark, tmp_path):
    """A rebucket rewrites EVERY bucket (all manifest paths change), the
    planner's worst case: the full relayout surfaces as that version's
    file set, and LWW replay over the whole history must still
    reconstruct the exact table state."""
    table = _mor_table(spark, tmp_path, n_batches=2)
    table.rebucket(16)
    _register(spark)
    cdf = (
        spark.read.format("lake_cdf")
        .option("path", table.root)
        .option("fromVersion", 0)
        .load()
    )
    payload = ["role", "text", "ts"]
    w = F.max(F.struct("_commit_version", "_lsn", "op", *payload)).alias("w")
    state = (
        cdf.groupBy("conv_id", "turn_idx")
        .agg(w)
        .select("conv_id", "turn_idx", "w.op", *[f"w.{c}" for c in payload])
        .filter("op <> 'D'")
        .drop("op")
    )
    want = table.read().select("conv_id", "turn_idx", *payload)
    assert state.exceptAll(want).count() == 0
    assert want.exceptAll(state).count() == 0


def test_rowlevel_matches_iter_changelogs(spark, tmp_path):
    """mode=rowlevel serves the PRE-MATERIALIZED per-version changelog —
    byte-identical to SnapshotTable.iter_changelogs at every version."""
    table = _mor_table(spark, tmp_path)
    assert table.materialize_changelog() == 3
    assert table.materialize_changelog() == 0  # idempotent
    _register(spark)
    got = (
        spark.read.format("lake_cdf")
        .option("path", table.root)
        .option("mode", "rowlevel")
        .option("fromVersion", 0)
        .load()
    )
    assert "op" in got.columns and "_lsn" not in got.columns
    total = 0
    for v, df in table.iter_changelogs(0):
        sub = got.filter(F.col("_commit_version") == v).select(*df.columns)
        assert sub.exceptAll(df).count() == 0, f"v{v}: extra rows"
        assert df.exceptAll(sub).count() == 0, f"v{v}: missing rows"
        total += df.count()
    assert got.count() == total


def test_materialize_union_strategy_equivalence(spark, tmp_path):
    """strategy='union' (one partitioned write job for the whole backlog)
    produces version directories indistinguishable from the per-version
    path: same rows per version as iter_changelogs, [] (not None) for a
    no-op commit's empty diff, idempotent, and a retry after a lost _DONE
    marker re-materializes exactly the unmarked version."""
    table = _mor_table(spark, tmp_path)
    table.compact()  # adds a version whose row-level diff is empty
    n = table.current().version
    assert (
        table.materialize_changelog(strategy="union", max_workers=4) == n
    )
    assert table.materialize_changelog(strategy="union") == 0  # idempotent
    empty = table.changelog_files(n)
    assert empty == []  # no-op commit: real empty changelog, not None
    for v, df in table.iter_changelogs(0):
        got = table.spark.read.parquet(table.changelog_dir(v)) if (
            table.changelog_files(v)
        ) else df.limit(0)
        got = got.select(*df.columns)
        assert got.exceptAll(df).count() == 0, f"v{v}: extra rows"
        assert df.exceptAll(got).count() == 0, f"v{v}: missing rows"
    # simulate a crash that lost one version's marker: only it re-runs
    import os

    os.remove(os.path.join(table.changelog_dir(2), "_DONE"))
    assert table.materialize_changelog(strategy="union") == 1
    assert table.changelog_files(2) is not None


def test_rowlevel_requires_materialization(spark, tmp_path):
    table = _mor_table(spark, tmp_path, n_batches=1)
    _register(spark)
    df = (
        spark.read.format("lake_cdf")
        .option("path", table.root)
        .option("mode", "rowlevel")
        .option("fromVersion", 0)
        .load()
    )
    try:
        df.count()
        raise AssertionError("expected planning to fail")
    except Exception as e:  # Spark wraps the planner error
        assert "not materialized" in str(e)


def test_rowlevel_stream_tail(spark, tmp_path):
    table = _mor_table(spark, tmp_path, n_batches=2)
    table.materialize_changelog()
    _register(spark)
    ckpt = str(tmp_path / "rl_ckpt")
    out = str(tmp_path / "rl_sink")

    def run_once():
        q = (
            spark.readStream.format("lake_cdf")
            .option("path", table.root)
            .option("mode", "rowlevel")
            .option("startingVersion", 0)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive

    run_once()
    first = spark.read.parquet(out).count()
    assert first == sum(df.count() for _, df in table.iter_changelogs(0))

    # new commit: materialize, resume, only the new version arrives
    feed2 = gen_feed(
        spark, n_convs=3, turns_per_conv=4, updates_per_key=1, delete_every=0
    )
    apply_changes(feed2, table, batch_id="late", mode="mor")
    v = table.current().version
    table.materialize_changelog()
    run_once()
    after = spark.read.parquet(out)
    assert after.count() == first + table.changelog(v - 1, v).count()
    assert after.filter(F.col("_commit_version") == v).count() > 0


def test_stream_sees_evolved_schema_on_restart(spark, tmp_path):
    table = _mor_table(spark, tmp_path, n_batches=1)
    _register(spark)
    # v2 feed adds the `tool` column -> schema evolves at the table
    feed2 = gen_feed(
        spark, n_convs=4, turns_per_conv=3, updates_per_key=1, delete_every=0,
        v2_from_lsn=0,
    )
    apply_changes(feed2, table, batch_id="v2", mode="mor")
    got = (
        spark.read.format("lake_cdf")
        .option("path", table.root)
        .option("fromVersion", 0)
        .load()
    )
    assert "tool" in got.columns
    # pre-evolution rows null-fill; post-evolution rows carry values.
    # (schema evolution commits a metadata-only snapshot first, so the v2
    # DATA lands at the table's latest version, not literally version 2)
    latest = table.current().version
    v1 = got.filter("_commit_version = 1")
    assert v1.count() > 0
    assert v1.filter(F.col("tool").isNotNull()).count() == 0
    v2 = got.filter(F.col("_commit_version") == latest)
    assert v2.filter(F.col("tool").isNotNull()).count() > 0


def test_rowlevel_stream_waits_for_materialization(spark, tmp_path):
    """ADVICE r2 repro: a writer commits a version BEFORE running
    materialize_changelog. The rowlevel stream must cap its offer at the
    highest contiguous materialized version (processing what exists, no
    crash), then pick up the straggler on a later run once materialized."""
    table = _mor_table(spark, tmp_path, n_batches=2)
    table.materialize_changelog()
    # a third commit, deliberately NOT materialized
    feed2 = gen_feed(
        spark, n_convs=3, turns_per_conv=4, updates_per_key=1, delete_every=0
    )
    apply_changes(feed2, table, batch_id="late", mode="mor")
    v_late = table.current().version
    assert table.changelog_files(v_late) is None

    _register(spark)
    ckpt = str(tmp_path / "wait_ckpt")
    out = str(tmp_path / "wait_sink")

    def run_once():
        q = (
            spark.readStream.format("lake_cdf")
            .option("path", table.root)
            .option("mode", "rowlevel")
            .option("startingVersion", 0)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive
        assert q.exception() is None  # the old behavior died here

    run_once()
    got = spark.read.parquet(out)
    # only the materialized prefix arrived; the unmaterialized tail waits
    assert got.filter(F.col("_commit_version") == v_late).count() == 0
    assert got.count() == sum(
        df.count() for _, df in table.iter_changelogs(0, v_late - 1)
    )

    table.materialize_changelog()
    run_once()
    after = spark.read.parquet(out)
    assert after.filter(F.col("_commit_version") == v_late).count() > 0
    assert after.count() == sum(
        df.count() for _, df in table.iter_changelogs(0)
    )
