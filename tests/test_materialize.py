"""Incremental view maintenance: target == full recompute at every step,
refreshes touch only affected keys, replay is a ledger no-op."""

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.lake.materialize import (
    IncrementalJoinView,
    IncrementalView,
)
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS_V1

VIEW_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("n_turns", LongType(), True),
        StructField("n_chars", LongType(), True),
    ]
)


def agg_fn(rows):
    return rows.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
    )


def _setup(spark, tmp_path):
    source = SnapshotTable.create(
        spark, str(tmp_path / "src"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    target = SnapshotTable.create(
        spark,
        str(tmp_path / "view"),
        VIEW_SCHEMA,
        "conv_id",
        num_buckets=4,
        key_columns=["conv_id"],
    )
    view = IncrementalView(source, target, "conv_id", agg_fn)
    feed = gen_feed(
        spark, n_convs=12, turns_per_conv=6, updates_per_key=2, delete_every=5
    )
    return source, target, view, feed


def _expect(source):
    return {
        (r["conv_id"], r["n_turns"], r["n_chars"])
        for r in agg_fn(source.read()).collect()
    }


def _got(target):
    return {
        (r["conv_id"], r["n_turns"], r["n_chars"])
        for r in target.read().collect()
    }


def test_view_tracks_source(spark, tmp_path):
    source, target, view, feed = _setup(spark, tmp_path)
    hi = feed.agg(F.max("lsn")).first()[0] + 1

    apply_changes(feed.filter(feed.lsn < hi // 2), source, batch_id="s1", mode="mor")
    r1 = view.refresh()
    assert not r1["skipped"] and r1["affected_keys"] > 0
    assert _got(target) == _expect(source)

    # second batch: updates + deletes land; only touched convs refresh
    apply_changes(feed.filter(feed.lsn >= hi // 2), source, batch_id="s2", mode="mor")
    changed_convs = (
        feed.filter(feed.lsn >= hi // 2).select("conv_id").distinct().count()
    )
    r2 = view.refresh()
    assert _got(target) == _expect(source)
    assert r2["affected_keys"] <= changed_convs
    assert view.last_refreshed_version() == source.current().version


def test_whole_conversation_delete_retracts(spark, tmp_path):
    source, target, view, feed = _setup(spark, tmp_path)
    apply_changes(feed, source, batch_id="s1", mode="mor")
    view.refresh()
    victim = source.read().first()["conv_id"]
    # delete every turn of one conversation
    turns = source.read().filter(F.col("conv_id") == victim).select("turn_idx")
    hi_lsn = feed.agg(F.max("lsn")).first()[0]
    deletes = turns.select(
        (F.lit(hi_lsn + 1) + F.col("turn_idx")).alias("lsn"),
        F.lit("D").alias("op"),
        F.lit(victim).alias("conv_id"),
        "turn_idx",
        F.lit(None).cast("string").alias("role"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit("p0").alias("source_part"),
    )
    apply_changes(deletes, source, batch_id="kill", mode="mor")
    r = view.refresh()
    assert r["affected_keys"] >= 1
    assert _got(target) == _expect(source)
    assert target.read().filter(F.col("conv_id") == victim).count() == 0


def test_streaming_maintenance_via_cdf(spark, tmp_path):
    """The lake_cdf subscription drives refresh(): the view converges after
    each drained stream run, and a restart picks up new source commits."""
    source, target, view, feed = _setup(spark, tmp_path)
    hi = feed.agg(F.max("lsn")).first()[0] + 1
    ckpt = str(tmp_path / "ckpt")

    apply_changes(feed.filter(feed.lsn < hi // 2), source, batch_id="s1", mode="mor")
    q = view.stream(ckpt)
    q.awaitTermination(120)
    assert not q.isActive
    assert _got(target) == _expect(source)

    apply_changes(feed.filter(feed.lsn >= hi // 2), source, batch_id="s2", mode="mor")
    q2 = view.stream(ckpt)
    q2.awaitTermination(120)
    assert _got(target) == _expect(source)
    assert view.last_refreshed_version() == source.current().version


def test_view_with_broadcast_dimension_join(spark, tmp_path):
    """agg_fn may enrich the pruned source rows with STATIC broadcast
    dimensions before aggregating — the simple-but-common 'join view'
    (fact x small dim) works today because the dim doesn't change the
    affected-key set. (Dim-table CHANGES are round-3 work.)"""
    source, _unused_target, _unused_view, feed = _setup(spark, tmp_path)
    role_dim = spark.createDataFrame(
        [("user", 1), ("assistant", 3), ("system", 0), ("tool", 2)],
        "role string, weight int",
    )
    schema = StructType(
        [
            StructField("conv_id", StringType(), False),
            StructField("n_turns", LongType(), True),
            StructField("weighted", LongType(), True),
        ]
    )
    target = SnapshotTable.create(
        spark, str(tmp_path / "dimview"), schema, "conv_id",
        num_buckets=4, key_columns=["conv_id"],
    )

    def agg_with_dim(rows):
        joined = rows.join(F.broadcast(role_dim), on="role", how="left")
        return joined.groupBy("conv_id").agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum(F.coalesce(F.col("weight"), F.lit(0)))
            .cast("long")
            .alias("weighted"),
        )

    view = IncrementalView(source, target, "conv_id", agg_with_dim)
    apply_changes(feed, source, batch_id="s1", mode="mor")
    view.refresh()
    got = {
        (r["conv_id"], r["n_turns"], r["weighted"])
        for r in target.read().collect()
    }
    want = {
        (r["conv_id"], r["n_turns"], r["weighted"])
        for r in agg_with_dim(source.read()).collect()
    }
    assert got == want


def test_refresh_is_idempotent_per_version(spark, tmp_path):
    source, target, view, feed = _setup(spark, tmp_path)
    apply_changes(feed, source, batch_id="s1", mode="mor")
    view.refresh()
    v = target.current().version
    again = view.refresh()
    assert again["skipped"] is True or again["affected_keys"] == 0
    assert target.current().version == v
    assert _got(target) == _expect(source)


def test_removal_only_vacuum_retracts_from_view(spark, tmp_path):
    """ADVICE r2 (high) repro: delete every turn of one conv, vacuum its
    tombstones, THEN refresh. The vacuum is a removal-only rewrite from the
    refresh window's perspective (the tombstone file added by the delete is
    gone again by refresh time), so an added-files-only candidate scan sees
    nothing and keeps the dead conv's aggregate forever. changed_keys_since
    must surface the conv from the REMOVED files."""
    source, target, view, feed = _setup(spark, tmp_path)
    apply_changes(feed, source, batch_id="s1", mode="mor")
    view.refresh()
    victim = source.read().first()["conv_id"]
    assert target.read().filter(F.col("conv_id") == victim).count() == 1

    turns = source.read().filter(F.col("conv_id") == victim).select("turn_idx")
    hi_lsn = feed.agg(F.max("lsn")).first()[0]
    deletes = turns.select(
        (F.lit(hi_lsn + 1) + F.col("turn_idx")).alias("lsn"),
        F.lit("D").alias("op"),
        F.lit(victim).alias("conv_id"),
        "turn_idx",
        F.lit(None).cast("string").alias("role"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit("p0").alias("source_part"),
    )
    apply_changes(deletes, source, batch_id="kill", mode="mor")
    # vacuum BEFORE the refresh: the delete's tombstone file is removed
    # again, leaving a pure base rewrite that no longer mentions victim
    source.vacuum_tombstones(below_lsn=hi_lsn + 1_000_000)

    r = view.refresh()
    assert r["affected_keys"] >= 1
    assert target.read().filter(F.col("conv_id") == victim).count() == 0
    assert _got(target) == _expect(source)
    assert view.last_refreshed_version() == source.current().version


def test_rowlevel_streamed_view_kill_and_resume(spark, tmp_path):
    """VERDICT r3 item 9: a mode=rowlevel lake_cdf subscription drives the
    view via refresh_from_changes (affected keys straight from the batch
    rows — zero consumer-side diff/join work), checkpointed; after a kill,
    more commits (including a whole-conversation delete) and a resume from
    the same checkpoint, the streamed view equals both the from-scratch
    aggregate and a twin view maintained by batch refresh()."""
    source, target, view, feed = _setup(spark, tmp_path)
    hi = feed.agg(F.max("lsn")).first()[0] + 1
    ckpt = str(tmp_path / "rl_ckpt")

    apply_changes(feed.filter(feed.lsn < hi // 2), source, batch_id="s1", mode="mor")
    source.materialize_changelog()
    q = view.stream(ckpt, rowlevel=True)
    q.awaitTermination(120)
    assert not q.isActive
    assert _got(target) == _expect(source)

    # while the stream is down: rest of the feed + kill one conversation
    apply_changes(feed.filter(feed.lsn >= hi // 2), source, batch_id="s2", mode="mor")
    victim = source.read().first()["conv_id"]
    turns = source.read().filter(F.col("conv_id") == victim).select("turn_idx")
    deletes = turns.select(
        (F.lit(hi + 10) + F.col("turn_idx")).alias("lsn"),
        F.lit("D").alias("op"),
        F.lit(victim).alias("conv_id"),
        "turn_idx",
        F.lit(None).cast("string").alias("role"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit("p0").alias("source_part"),
    )
    apply_changes(deletes, source, batch_id="kill", mode="mor")
    source.materialize_changelog()

    q2 = view.stream(ckpt, rowlevel=True)
    q2.awaitTermination(120)
    assert _got(target) == _expect(source)
    assert target.read().filter(F.col("conv_id") == victim).count() == 0

    # equals a twin maintained by batch refresh() over the same source
    twin_target = SnapshotTable.create(
        spark,
        str(tmp_path / "twin_view"),
        VIEW_SCHEMA,
        "conv_id",
        num_buckets=4,
        key_columns=["conv_id"],
    )
    twin = IncrementalView(source, twin_target, "conv_id", agg_fn)
    twin.refresh()
    assert _got(target) == _got(twin_target)


# ---------------------------------------------------------------------------
# Two-source join views (IncrementalJoinView)
# ---------------------------------------------------------------------------

META_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("channel", StringType(), True),
    ]
)

JOIN_VIEW_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("channel", StringType(), True),
        StructField("n_turns", LongType(), True),
        StructField("n_chars", LongType(), True),
    ]
)


def join_fn(turns, meta):
    agg = turns.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
    )
    return agg.join(meta.select("conv_id", "channel"), on="conv_id", how="inner")


def _meta_events(spark, rows, lsn0):
    """rows: list of (conv_id, channel | None for delete)."""
    data = [
        (
            lsn0 + i,
            "D" if ch is None else ("I" if lsn0 == 0 else "U"),
            cid,
            ch,
        )
        for i, (cid, ch) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "lsn long, op string, conv_id string, channel string"
    )


def _setup_join(spark, tmp_path):
    src_a = SnapshotTable.create(
        spark, str(tmp_path / "ja_src"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    src_b = SnapshotTable.create(
        spark,
        str(tmp_path / "jb_src"),
        META_SCHEMA,
        "conv_id",
        num_buckets=4,
        key_columns=["conv_id"],
    )
    target = SnapshotTable.create(
        spark,
        str(tmp_path / "jview"),
        JOIN_VIEW_SCHEMA,
        "conv_id",
        num_buckets=4,
        key_columns=["conv_id"],
    )
    view = IncrementalJoinView(src_a, src_b, target, "conv_id", join_fn)
    feed = gen_feed(
        spark, n_convs=12, turns_per_conv=6, updates_per_key=2, delete_every=5
    )
    return src_a, src_b, target, view, feed


def _expect_join(src_a, src_b):
    return {
        (r["conv_id"], r["channel"], r["n_turns"], r["n_chars"])
        for r in join_fn(src_a.read(), src_b.read()).collect()
    }


def _got_join(target):
    return {
        (r["conv_id"], r["channel"], r["n_turns"], r["n_chars"])
        for r in target.read().collect()
    }


def test_join_view_tracks_both_sources(spark, tmp_path):
    src_a, src_b, target, view, feed = _setup_join(spark, tmp_path)
    hi = feed.agg(F.max("lsn")).first()[0] + 1
    convs = [f"conv_{i:06d}" for i in range(12)]

    # fact side first: inner join against an empty dimension -> empty view
    apply_changes(feed.filter(feed.lsn < hi // 2), src_a, batch_id="a1", mode="mor")
    r1 = view.refresh()
    assert not r1["skipped"]
    assert target.read().count() == 0
    assert _got_join(target) == _expect_join(src_a, src_b)

    # dimension rows land for half the convs -> those convs appear
    apply_changes(
        _meta_events(spark, [(c, f"ch_{i % 3}") for i, c in enumerate(convs[:6])], 0),
        src_b,
        batch_id="b1",
        mode="mor",
    )
    view.refresh()
    assert _got_join(target) == _expect_join(src_a, src_b)
    assert target.read().count() > 0

    # more facts: only the touched convs refresh
    apply_changes(feed.filter(feed.lsn >= hi // 2), src_a, batch_id="a2", mode="mor")
    changed = (
        feed.filter(feed.lsn >= hi // 2).select("conv_id").distinct().count()
    )
    r3 = view.refresh()
    assert _got_join(target) == _expect_join(src_a, src_b)
    assert r3["affected_keys"] <= changed

    # dimension churn: channel reassignment + rest of the convs registered
    apply_changes(
        _meta_events(
            spark,
            [(convs[0], "ch_9")] + [(c, "ch_new") for c in convs[6:]],
            1_000_000,
        ),
        src_b,
        batch_id="b2",
        mode="mor",
    )
    r4 = view.refresh()
    assert _got_join(target) == _expect_join(src_a, src_b)
    assert r4["affected_keys"] <= 7
    assert view.last_refreshed_versions() == (
        src_a.current().version,
        src_b.current().version,
    )


def test_join_view_dimension_delete_retracts(spark, tmp_path):
    src_a, src_b, target, view, feed = _setup_join(spark, tmp_path)
    convs = [f"conv_{i:06d}" for i in range(12)]
    apply_changes(feed, src_a, batch_id="a1", mode="mor")
    apply_changes(
        _meta_events(spark, [(c, "ch_0") for c in convs], 0),
        src_b,
        batch_id="b1",
        mode="mor",
    )
    view.refresh()
    victim = convs[3]
    assert target.read().filter(F.col("conv_id") == victim).count() == 1

    apply_changes(
        _meta_events(spark, [(victim, None)], 5_000_000),
        src_b,
        batch_id="b2",
        mode="mor",
    )
    r = view.refresh()
    assert r["affected_keys"] >= 1
    # turns still exist, but the inner join lost its dimension match
    assert src_a.read().filter(F.col("conv_id") == victim).count() > 0
    assert target.read().filter(F.col("conv_id") == victim).count() == 0
    assert _got_join(target) == _expect_join(src_a, src_b)


def test_join_view_single_refresh_covers_both_commits(spark, tmp_path):
    src_a, src_b, target, view, feed = _setup_join(spark, tmp_path)
    convs = [f"conv_{i:06d}" for i in range(12)]
    apply_changes(feed, src_a, batch_id="a1", mode="mor")
    apply_changes(
        _meta_events(spark, [(c, "ch_1") for c in convs[:8]], 0),
        src_b,
        batch_id="b1",
        mode="mor",
    )
    r = view.refresh()
    assert not r["skipped"]
    assert _got_join(target) == _expect_join(src_a, src_b)
    again = view.refresh()
    assert again["skipped"] is True or again["affected_keys"] == 0


def test_join_view_requires_co_partitioned_sources(spark, tmp_path):
    src_a = SnapshotTable.create(
        spark, str(tmp_path / "ok_src"), TRANSCRIPTS_V1, "conv_id", num_buckets=4
    )
    bad_schema = StructType(
        [
            StructField("other_key", StringType(), False),
            StructField("channel", StringType(), True),
        ]
    )
    src_bad = SnapshotTable.create(
        spark, str(tmp_path / "bad_src"), bad_schema, "other_key", num_buckets=4
    )
    target = SnapshotTable.create(
        spark,
        str(tmp_path / "jv2"),
        JOIN_VIEW_SCHEMA,
        "conv_id",
        num_buckets=4,
        key_columns=["conv_id"],
    )
    import pytest

    with pytest.raises(ValueError, match="co-partitioned|partition key"):
        IncrementalJoinView(src_a, src_bad, target, "conv_id", join_fn)


def test_join_view_streamed_maintenance(spark, tmp_path):
    """Union-of-cdf wake-up stream: one query subscribed to BOTH commit
    logs converges the view; a restart picks up commits to either source."""
    src_a, src_b, target, view, feed = _setup_join(spark, tmp_path)
    convs = [f"conv_{i:06d}" for i in range(12)]
    hi = feed.agg(F.max("lsn")).first()[0] + 1
    ckpt = str(tmp_path / "jckpt")

    apply_changes(feed.filter(feed.lsn < hi // 2), src_a, batch_id="a1", mode="mor")
    apply_changes(
        _meta_events(spark, [(c, "ch_2") for c in convs], 0),
        src_b,
        batch_id="b1",
        mode="mor",
    )
    q = view.stream(ckpt)
    q.awaitTermination(120)
    assert not q.isActive
    assert _got_join(target) == _expect_join(src_a, src_b)

    # commits on both sides while the stream is down
    apply_changes(feed.filter(feed.lsn >= hi // 2), src_a, batch_id="a2", mode="mor")
    apply_changes(
        _meta_events(spark, [(convs[1], None)], 9_000_000),
        src_b,
        batch_id="b2",
        mode="mor",
    )
    q2 = view.stream(ckpt)
    q2.awaitTermination(120)
    assert _got_join(target) == _expect_join(src_a, src_b)
    assert view.last_refreshed_versions() == (
        src_a.current().version,
        src_b.current().version,
    )


def test_join_view_rowlevel_streamed(spark, tmp_path):
    """Join view maintained from BOTH sources' materialized row-level
    changelogs: affected join keys come straight from the union of batch
    rows (zero consumer-side diff work); checkpointed kill-and-resume with
    interleaved commits (including a dimension delete) converges to the
    from-scratch joined aggregate."""
    src_a, src_b, target, view, feed = _setup_join(spark, tmp_path)
    convs = [f"conv_{i:06d}" for i in range(12)]
    hi = feed.agg(F.max("lsn")).first()[0] + 1
    ckpt = str(tmp_path / "jrl_ckpt")

    apply_changes(feed.filter(feed.lsn < hi // 2), src_a, batch_id="a1", mode="mor")
    apply_changes(
        _meta_events(spark, [(c, "ch_5") for c in convs], 0),
        src_b,
        batch_id="b1",
        mode="mor",
    )
    src_a.materialize_changelog()
    src_b.materialize_changelog()
    q = view.stream(ckpt, rowlevel=True)
    q.awaitTermination(120)
    assert not q.isActive
    assert _got_join(target) == _expect_join(src_a, src_b)

    # while down: rest of the facts + one dimension delete
    apply_changes(feed.filter(feed.lsn >= hi // 2), src_a, batch_id="a2", mode="mor")
    apply_changes(
        _meta_events(spark, [(convs[2], None)], 9_000_000),
        src_b,
        batch_id="b2",
        mode="mor",
    )
    src_a.materialize_changelog()
    src_b.materialize_changelog()
    q2 = view.stream(ckpt, rowlevel=True)
    q2.awaitTermination(120)
    assert _got_join(target) == _expect_join(src_a, src_b)
    assert target.read().filter(F.col("conv_id") == convs[2]).count() == 0


def test_rollback_between_refreshes_reverts_view(spark, tmp_path):
    """A rollback is a removal-only commit (files of the undone versions
    vanish, nothing is added); the next refresh must recompute the keys the
    undone commits had touched instead of skipping with affected_keys=0."""
    source, target, view, feed = _setup(spark, tmp_path)
    hi = feed.agg(F.max("lsn")).first()[0] + 1
    apply_changes(feed.filter(feed.lsn < hi // 2), source, batch_id="s1", mode="mor")
    v1 = source.current().version
    view.refresh()
    apply_changes(feed.filter(feed.lsn >= hi // 2), source, batch_id="s2", mode="mor")
    view.refresh()
    assert _got(target) == _expect(source)

    source.rollback(v1)  # removal-only: current file set == v1's
    r = view.refresh()
    assert r["affected_keys"] >= 1
    assert _got(target) == _expect(source)
    assert view.last_refreshed_version() == source.current().version


# ---------------------------------------------------------------------------
# Streamed sketch maintenance: histogram-CDF quantiles as an IncrementalView
# ---------------------------------------------------------------------------


def test_streamed_hist_sketch_view_kill_and_resume(spark, tmp_path):
    """VERDICT r3 item 8: maintain the deterministic histogram-CDF quantile
    sketch (operators/temporal.value_quantiles_hist — mergeable cells, no
    RNG) as an IncrementalView over the rowlevel CDF stream. Streamed state
    == batch-recomputed sketch after kill, more commits (updates + deletes)
    and resume from the same checkpoint."""
    from pyspark.sql.types import DoubleType

    from orientdb_neo4j_importer_plugin_spark.operators import temporal as TP

    src_schema = StructType(
        [
            StructField("event_type", StringType(), False),
            StructField("event_id", LongType(), False),
            StructField("value", DoubleType(), True),
        ]
    )
    hist_schema = StructType(
        [
            StructField("event_type", StringType(), False),
            StructField("n", LongType(), True),
            StructField("p25", DoubleType(), True),
            StructField("p50", DoubleType(), True),
            StructField("p90", DoubleType(), True),
        ]
    )
    source = SnapshotTable.create(
        spark, str(tmp_path / "hist_src"), src_schema, "event_type",
        num_buckets=4, key_columns=["event_type", "event_id"],
    )
    target = SnapshotTable.create(
        spark, str(tmp_path / "hist_view"), hist_schema, "event_type",
        num_buckets=4, key_columns=["event_type"],
    )
    view = IncrementalView(source, target, "event_type", TP.value_quantiles_hist)

    def hist_rows(df):
        return {
            (r["event_type"], r["n"], r["p25"], r["p50"], r["p90"])
            for r in df.collect()
        }

    feed = spark.range(240).select(
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("event_type"),
        F.col("id").alias("event_id"),
        # deterministic spread, different shape per type
        ((F.col("id") % 97).cast("double") * ((F.col("id") % 3) + 1)).alias("value"),
    )
    ckpt = str(tmp_path / "hist_ckpt")

    apply_changes(feed.filter("event_id < 120"), source, batch_id="h1", mode="mor")
    source.materialize_changelog()
    q = view.stream(ckpt, rowlevel=True)
    q.awaitTermination(120)
    assert not q.isActive
    assert hist_rows(target.read()) == hist_rows(
        TP.value_quantiles_hist(source.read())
    )

    # while the stream is down: rest of the feed, value updates on one
    # type, and delete ALL rows of another type (sketch row must retract)
    apply_changes(feed.filter("event_id >= 120"), source, batch_id="h2", mode="mor")
    updates = spark.range(40).select(
        (F.col("id") + 1000).alias("lsn"),
        F.lit("U").alias("op"),
        F.lit("t1").alias("event_type"),
        (F.col("id") * 3 + 1).alias("event_id"),
        (F.col("id").cast("double") * 7.5).alias("value"),
    )
    apply_changes(updates, source, batch_id="h3", mode="mor")
    dead = source.read().filter("event_type = 't2'").select("event_id")
    deletes = dead.select(
        (F.lit(2000) + F.col("event_id")).alias("lsn"),
        F.lit("D").alias("op"),
        F.lit("t2").alias("event_type"),
        "event_id",
        F.lit(None).cast("double").alias("value"),
    )
    apply_changes(deletes, source, batch_id="h4", mode="mor")
    source.materialize_changelog()

    q2 = view.stream(ckpt, rowlevel=True)
    q2.awaitTermination(120)
    want = hist_rows(TP.value_quantiles_hist(source.read()))
    assert hist_rows(target.read()) == want and want
    assert target.read().filter("event_type = 't2'").count() == 0

    # equals a twin maintained by batch refresh() over the same source
    twin_target = SnapshotTable.create(
        spark, str(tmp_path / "hist_twin"), hist_schema, "event_type",
        num_buckets=4, key_columns=["event_type"],
    )
    twin = IncrementalView(source, twin_target, "event_type", TP.value_quantiles_hist)
    twin.refresh()
    assert hist_rows(target.read()) == hist_rows(twin_target.read())
