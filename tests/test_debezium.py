"""Debezium envelope adapter -> CDC apply -> oracle equivalence."""

import datetime

from pyspark.sql import functions as F

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS_V1
from orientdb_neo4j_importer_plugin_spark.sources.debezium import (
    debezium_envelope_schema,
    from_debezium,
)


def to_envelopes(feed):
    """Wrap a flat change feed into Debezium envelopes (test harness)."""
    payload = F.struct("conv_id", "turn_idx", "role", "text", "ts")
    dbz_op = (
        F.when(F.col("op") == "I", F.lit("c"))
        .when(F.col("op") == "U", F.lit("u"))
        .otherwise(F.lit("d"))
    )
    return feed.select(
        F.when(F.col("op") == "D", payload).alias("before"),
        F.when(F.col("op") != "D", payload).alias("after"),
        dbz_op.alias("op"),
        (F.col("lsn") * 1000).alias("ts_ms"),
        F.struct(
            F.col("lsn"), F.col("source_part").cast("long").alias("partition")
        ).alias("source"),
    )


def test_debezium_roundtrip_matches_direct_apply(spark, tmp_path):
    feed = gen_feed(spark, n_convs=4, turns_per_conv=6, updates_per_key=2, delete_every=5)
    envelopes = to_envelopes(feed)
    flat = from_debezium(envelopes, TRANSCRIPTS_V1)
    assert set(flat.columns) == {
        "lsn", "op", "source_part", "conv_id", "turn_idx", "role", "text", "ts",
    }
    # ops mapped, delete keys recovered from `before`
    assert flat.filter("op = 'D' and conv_id is null").count() == 0
    assert sorted(
        r["op"] for r in flat.select("op").distinct().collect()
    ) == ["D", "I", "U"]

    t1 = SnapshotTable.create(spark, str(tmp_path / "t1"), TRANSCRIPTS_V1, "conv_id", num_buckets=8)
    t2 = SnapshotTable.create(spark, str(tmp_path / "t2"), TRANSCRIPTS_V1, "conv_id", num_buckets=8)
    apply_changes(feed, t1, batch_id="direct")
    apply_changes(flat, t2, batch_id="via-dbz")
    a = [tuple(r) for r in t1.read().orderBy("conv_id", "turn_idx").collect()]
    b = [tuple(r) for r in t2.read().orderBy("conv_id", "turn_idx").collect()]
    assert a == b and len(a) > 0


def test_debezium_json_roundtrip(spark, tmp_path):
    """Envelope JSON on disk (the realistic wire format) parses with the
    declared schema and snapshot 'r' ops map to inserts."""
    feed = gen_feed(spark, n_convs=2, turns_per_conv=4)
    env = to_envelopes(feed).withColumn(
        "op", F.when(F.col("op") == "c", "r").otherwise(F.col("op"))
    )
    d = str(tmp_path / "dbz_json")
    env.coalesce(1).write.json(d)
    back = spark.read.schema(debezium_envelope_schema(TRANSCRIPTS_V1)).json(d)
    flat = from_debezium(back, TRANSCRIPTS_V1)
    assert flat.filter("op = 'I'").count() == 8
    assert flat.filter("ts is not null").count() == 8


OUT = ["conv_id", "turn_idx", "role", "text", "ts"]


def _state(t):
    return [
        tuple(r)
        for r in t.read().orderBy("conv_id", "turn_idx").select(*OUT).collect()
    ]


def _build_source(spark, tmp_path, mode="cow"):
    from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed

    feed = gen_feed(
        spark, n_convs=6, turns_per_conv=5, updates_per_key=2, delete_every=4
    )
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    # three deterministic slices, applied out of lsn order
    apply_changes(feed.filter("pmod(lsn, 3) = 1"), src, batch_id="s1", mode=mode)
    apply_changes(feed.filter("pmod(lsn, 3) = 0"), src, batch_id="s0", mode=mode)
    apply_changes(feed.filter("pmod(lsn, 3) = 2"), src, batch_id="s2", mode=mode)
    return src


def test_changelog_envelope_images(spark, tmp_path):
    src = _build_source(spark, tmp_path)
    env = src.changelog_envelope(1, 2)
    rows = env.collect()
    assert len(rows) > 0
    for r in rows:
        if r["op"] == "I":
            assert r["before"] is None and r["after"] is not None
        elif r["op"] == "D":
            assert r["after"] is None and r["before"] is not None
        else:
            assert r["before"] is not None and r["after"] is not None
            assert (r["before"]["conv_id"], r["before"]["turn_idx"]) == (
                r["conv_id"], r["turn_idx"],
            )
        assert r["lsn"] is not None
        assert 0 <= r["bucket"] < 8


def test_envelope_roundtrip_reproduces_changelog(spark, tmp_path):
    from orientdb_neo4j_importer_plugin_spark.sources.debezium import to_debezium

    src = _build_source(spark, tmp_path)
    env = to_debezium(src.changelog_envelope(0))
    back = from_debezium(env, TRANSCRIPTS_V1)
    chg = src.changelog(0)
    # every changelog row survives the wire round-trip with op + payload intact
    a = back.select("op", "conv_id", "turn_idx", "role", "text", "ts")
    b = chg.select("op", "conv_id", "turn_idx", "role", "text", "ts")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_cascade_replication_matches_source(spark, tmp_path):
    from orientdb_neo4j_importer_plugin_spark.sources.debezium import (
        replicate_changelog,
    )

    src = _build_source(spark, tmp_path, mode="mor")
    src.compact()
    dst = SnapshotTable.create(
        spark, str(tmp_path / "dst"), TRANSCRIPTS_V1, "conv_id",
        num_buckets=4,  # different layout on purpose
    )
    # replicate version-by-version (a consumer drained at its own pace)
    head = src.current().version
    mid = head // 2
    replicate_changelog(src, dst, 0, mid)
    replicate_changelog(src, dst, mid, head)
    assert _state(dst) == _state(src)
    # idempotence: re-applying a drained range is a ledger no-op
    v = dst.current().version
    stats = replicate_changelog(src, dst, mid, head)
    assert stats.skipped_replay is True
    assert dst.current().version == v
    assert _state(dst) == _state(src)


def test_export_feed_to_json_and_replay(spark, tmp_path):
    from orientdb_neo4j_importer_plugin_spark.sources.debezium import (
        export_changelog_feed,
        read_debezium_feed,
    )

    src = _build_source(spark, tmp_path)
    out = str(tmp_path / "dbz_feed")
    export_changelog_feed(src, out, 0)
    env = read_debezium_feed(spark, out, TRANSCRIPTS_V1)
    events = from_debezium(env, TRANSCRIPTS_V1)
    dst = SnapshotTable.create(
        spark, str(tmp_path / "dst2"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    apply_changes(events, dst, batch_id="from-json")
    assert _state(dst) == _state(src)


def test_stream_runner_tails_debezium_envelope_wal(spark, tmp_path):
    """CdcStreamRunner(feed_format='debezium'): tail a JSON-lines WAL of
    Debezium envelopes — the shape real binlog tails arrive in — and
    converge to the same state as the direct flat apply."""
    from orientdb_neo4j_importer_plugin_spark.streaming import CdcStreamRunner

    feed = gen_feed(
        spark, n_convs=5, turns_per_conv=5, updates_per_key=2, delete_every=4
    ).persist()
    wal = str(tmp_path / "dbz_wal")
    to_envelopes(feed).write.mode("overwrite").json(wal)

    direct = SnapshotTable.create(
        spark, str(tmp_path / "direct"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    apply_changes(feed, direct, batch_id="all")

    streamed = SnapshotTable.create(
        spark, str(tmp_path / "streamed"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    from orientdb_neo4j_importer_plugin_spark.schema import CHANGE_EVENT_V1

    runner = CdcStreamRunner(
        spark, wal, streamed,
        checkpoint_dir=str(tmp_path / "ckpt"),
        event_schema=CHANGE_EVENT_V1,
        feed_format="debezium",
        mode="mor",
    )
    m = runner.run_to_completion(timeout_sec=300)
    assert m.events_in == feed.count()
    out = ["conv_id", "turn_idx", "role", "text", "ts"]
    a = [tuple(r) for r in direct.read().orderBy(*out[:2]).select(*out).collect()]
    b = [tuple(r) for r in streamed.read().orderBy(*out[:2]).select(*out).collect()]
    assert a == b
    feed.unpersist()


def test_bootstrap_then_tail_protocol(spark, tmp_path):
    """Debezium snapshot-then-stream: seed a new consumer from the
    snapshot feed at v, tail increments from v — equality with the
    source, including increments racing the boundary (LWW absorbs)."""
    from orientdb_neo4j_importer_plugin_spark.sources.debezium import (
        bootstrap_from_snapshot,
        replicate_changelog,
        snapshot_envelopes,
    )

    feed = gen_feed(
        spark, n_convs=6, turns_per_conv=5, updates_per_key=2, delete_every=4
    ).persist()
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    apply_changes(feed.filter("pmod(lsn, 3) = 0"), src, batch_id="s0", mode="mor")
    apply_changes(feed.filter("pmod(lsn, 3) = 1"), src, batch_id="s1", mode="mor")

    # snapshot feed has only live rows, all op='r', real lsns
    env = snapshot_envelopes(src)
    assert env.filter("op <> 'r'").count() == 0
    assert env.filter("before is not null").count() == 0
    assert env.filter("source.lsn is null").count() == 0

    dst = SnapshotTable.create(
        spark, str(tmp_path / "dst"), TRANSCRIPTS_V1, "conv_id", num_buckets=4
    )
    res, snap_v = bootstrap_from_snapshot(src, dst)
    assert not res.skipped_replay and snap_v == src.current().version
    assert _state(dst) == _state(src)

    # source advances; tail increments from the bootstrap version
    apply_changes(feed.filter("pmod(lsn, 3) = 2"), src, batch_id="s2", mode="mor")
    replicate_changelog(src, dst, snap_v)
    assert _state(dst) == _state(src)

    # re-tailing an OVERLAPPING range (from before the bootstrap) is
    # absorbed by LWW idempotence, not a divergence
    replicate_changelog(src, dst, 0, batch_id="overlap")
    assert _state(dst) == _state(src)
    feed.unpersist()


def test_envelope_replication_propagates_evolution(spark, tmp_path):
    """Source evolves (tool column appears) AFTER the consumer
    bootstrapped at v1: envelope replication must carry the new column
    through (regression: projecting to the TARGET's schema dropped it)."""
    from orientdb_neo4j_importer_plugin_spark.sources.debezium import (
        bootstrap_from_snapshot,
        replicate_changelog,
    )

    feed = gen_feed(
        spark, n_convs=5, turns_per_conv=4, updates_per_key=1,
        delete_every=6, v2_from_lsn=40,
    ).persist()
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    apply_changes(feed.filter("lsn < 40").drop("tool"), src, batch_id="v1", mode="mor")
    dst = SnapshotTable.create(
        spark, str(tmp_path / "dst"), TRANSCRIPTS_V1, "conv_id", num_buckets=4
    )
    _, snap_v = bootstrap_from_snapshot(src, dst)
    assert "tool" not in dst.current().schema.fieldNames()

    apply_changes(feed.filter("lsn >= 40"), src, batch_id="v2", mode="mor")
    replicate_changelog(src, dst, snap_v)
    assert "tool" in dst.current().schema.fieldNames()
    out = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    a = [tuple(r) for r in src.read().orderBy(*out[:2]).select(*out).collect()]
    b = [tuple(r) for r in dst.read().orderBy(*out[:2]).select(*out).collect()]
    assert a == b
    feed.unpersist()


def test_replicate_changelog_custom_keys(spark, tmp_path):
    """Delete envelopes carry only a before-image; flattening must use the
    SOURCE TABLE's key set (not the transcripts default) or a custom-keyed
    table's deletes arrive with NULL keys and mis-apply on the target."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from orientdb_neo4j_importer_plugin_spark.sources.debezium import (
        replicate_changelog,
    )

    schema = StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("name", StringType(), True),
        ]
    )
    src = SnapshotTable.create(
        spark, str(tmp_path / "ksrc"), schema, "user_id",
        num_buckets=4, key_columns=["user_id"],
    )
    dst = SnapshotTable.create(
        spark, str(tmp_path / "kdst"), schema, "user_id",
        num_buckets=2, key_columns=["user_id"],
    )
    ins = spark.range(10).select(
        F.col("id").alias("lsn"), F.lit("I").alias("op"),
        F.col("id").alias("user_id"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("name"),
    )
    apply_changes(ins, src, batch_id="i", mode="mor")
    dels = spark.range(3).select(
        (F.col("id") + 100).alias("lsn"), F.lit("D").alias("op"),
        F.col("id").alias("user_id"),
        F.lit(None).cast("string").alias("name"),
    )
    apply_changes(dels, src, batch_id="d", mode="mor")
    replicate_changelog(src, dst, 0, mode="mor")
    a = [tuple(r) for r in src.read().orderBy("user_id").collect()]
    b = [tuple(r) for r in dst.read().orderBy("user_id").collect()]
    assert a == b
    assert len(a) == 7  # the three deletes really applied


def test_envelope_delete_after_tombstone_vacuum(spark, tmp_path):
    """A delete whose tombstone was vacuumed before the envelope range was
    read must still delete on a cascade target that holds the old row: the
    D row's lsn falls back to old-lsn + 1 (a lower bound on the vacuumed
    tombstone's lsn), not the old lsn itself, so the target's LWW is a
    strict win rather than an unordered equal-lsn tie."""
    import datetime

    from orientdb_neo4j_importer_plugin_spark.sources.debezium import (
        replicate_changelog,
    )

    ts = datetime.datetime(2026, 1, 1)
    schema_str = (
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, ts timestamp"
    )
    rows = [(i, "I", f"conv_{i % 3}", i, "user", f"t{i}", ts) for i in range(6)]
    ev = spark.createDataFrame(rows, schema_str)
    src = SnapshotTable.create(
        spark, str(tmp_path / "vsrc"), TRANSCRIPTS_V1, "conv_id", num_buckets=2
    )
    dst = SnapshotTable.create(
        spark, str(tmp_path / "vdst"), TRANSCRIPTS_V1, "conv_id", num_buckets=2
    )
    apply_changes(ev, src, batch_id="i", mode="mor")
    v1 = src.current().version
    replicate_changelog(src, dst, 0, v1, mode="mor")
    assert _state(dst) == _state(src)

    d = spark.createDataFrame(
        [(100, "D", "conv_0", 0, None, None, None)], schema_str
    )
    apply_changes(d, src, batch_id="d", mode="mor")
    src.vacuum_tombstones(101)  # tombstone gone before the range is read
    env = src.changelog_envelope(v1)
    drow = env.filter("op = 'D'").collect()
    assert len(drow) == 1
    assert drow[0]["lsn"] == 1  # old row's lsn 0 + 1, NOT the old lsn
    replicate_changelog(src, dst, v1, mode="mor")
    assert _state(dst) == _state(src)
    assert len(_state(dst)) == 5
