"""Streaming table-to-table mirroring: lake_cdf tail -> replica apply.

Convergence is composed from proven parts (cdf emission, idempotent LWW
apply, checkpoint+ledger exactly-once); these tests drive the composition
end-to-end: initial sync, incremental catch-up across restarts, replay
no-op, and replica equality under a different bucket layout.
"""

import pytest

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS_V1
from orientdb_neo4j_importer_plugin_spark.streaming import MirrorRunner

OUT = ["conv_id", "turn_idx", "role", "text", "ts"]


def _state(t):
    return [
        tuple(r)
        for r in t.read().orderBy("conv_id", "turn_idx").select(*OUT).collect()
    ]


@pytest.fixture
def tables(spark, tmp_path):
    feed = gen_feed(
        spark, n_convs=6, turns_per_conv=5, updates_per_key=2, delete_every=4
    ).persist()
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    dst = SnapshotTable.create(
        spark, str(tmp_path / "dst"), TRANSCRIPTS_V1, "conv_id", num_buckets=4
    )
    yield feed, src, dst
    feed.unpersist()


def _mirror(spark, src, dst, tmp_path, **kw):
    return MirrorRunner(
        spark, src, dst, checkpoint_dir=str(tmp_path / "ckpt"), **kw
    )


def test_mirror_initial_sync(spark, tmp_path, tables):
    feed, src, dst = tables
    apply_changes(feed.filter("pmod(lsn, 2) = 1"), src, batch_id="a", mode="mor")
    apply_changes(feed.filter("pmod(lsn, 2) = 0"), src, batch_id="b", mode="mor")
    m = _mirror(spark, src, dst, tmp_path)
    m.run_to_completion(timeout_sec=120)
    assert _state(dst) == _state(src)


def test_mirror_catchup_and_replay_noop(spark, tmp_path, tables):
    feed, src, dst = tables
    apply_changes(feed.filter("pmod(lsn, 3) = 0"), src, batch_id="a", mode="mor")
    _mirror(spark, src, dst, tmp_path).run_to_completion(timeout_sec=120)
    assert _state(dst) == _state(src)

    # source advances; a NEW runner on the SAME checkpoint catches up
    apply_changes(feed.filter("pmod(lsn, 3) = 1"), src, batch_id="b", mode="mor")
    apply_changes(feed.filter("pmod(lsn, 3) = 2"), src, batch_id="c", mode="mor")
    m2 = _mirror(spark, src, dst, tmp_path, compact_every=1)
    m2.run_to_completion(timeout_sec=120)
    assert _state(dst) == _state(src)
    assert m2.metrics.batches >= 1

    # nothing new: replica version must not advance
    v = dst.current().version
    _mirror(spark, src, dst, tmp_path).run_to_completion(timeout_sec=120)
    assert dst.current().version == v
    assert _state(dst) == _state(src)


def test_mirror_cow_source_converges(spark, tmp_path, tables):
    feed, src, dst = tables
    # COW source: rewritten buckets surface as changes; replica stays equal
    apply_changes(feed.filter("pmod(lsn, 2) = 1"), src, batch_id="a")
    apply_changes(feed.filter("pmod(lsn, 2) = 0"), src, batch_id="b")
    _mirror(spark, src, dst, tmp_path).run_to_completion(timeout_sec=120)
    assert _state(dst) == _state(src)


def test_mirror_catchup_bounded_windows(spark, tmp_path, tables):
    feed, src, dst = tables
    for i in range(4):
        apply_changes(
            feed.filter(f"pmod(lsn, 4) = {i}"), src, batch_id=f"b{i}", mode="mor"
        )
    m = _mirror(spark, src, dst, tmp_path, mode="mor")
    results = m.catch_up(window=1)
    # one bounded apply per source version, replica converged
    assert len(results) == src.current().version
    assert _state(dst) == _state(src)

    # resume position comes from replica lineage: nothing to do at head
    assert _mirror(spark, src, dst, tmp_path).catch_up(window=2) == []

    # source advances; a fresh runner resumes from the recorded position
    extra = feed.filter("pmod(lsn, 4) = 1")
    apply_changes(extra, src, batch_id="b5", mode="mor")  # replayed slice: no-op
    apply_changes(
        feed.filter("pmod(lsn, 2) = 0").limit(0), src, batch_id="b6", mode="mor"
    )  # empty commit window must not wedge the loop
    m3 = _mirror(spark, src, dst, tmp_path, mode="mor")
    m3.catch_up(window=2)
    assert _state(dst) == _state(src)
    assert m3._mirror_position() == src.current().version


def test_mirror_propagates_schema_evolution(spark, tmp_path):
    # v1 rows first; `tool` column appears mid-feed (v2_from_lsn) — the
    # replica must evolve on the next mirror pass like any CDC consumer
    feed = gen_feed(
        spark, n_convs=6, turns_per_conv=5, updates_per_key=2,
        delete_every=4, v2_from_lsn=60,
    ).persist()
    src = SnapshotTable.create(
        spark, str(tmp_path / "src"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    dst = SnapshotTable.create(
        spark, str(tmp_path / "dst"), TRANSCRIPTS_V1, "conv_id", num_buckets=4
    )
    apply_changes(feed.filter("lsn < 60").drop("tool"), src, batch_id="v1", mode="mor")
    _mirror(spark, src, dst, tmp_path).run_to_completion(timeout_sec=120)
    assert "tool" not in dst.current().schema.fieldNames()

    apply_changes(feed.filter("lsn >= 60"), src, batch_id="v2", mode="mor")
    # new runner = stream restart; the cdf source re-pins the evolved schema
    _mirror(spark, src, dst, tmp_path).run_to_completion(timeout_sec=120)
    assert "tool" in dst.current().schema.fieldNames()
    out = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    a = [tuple(r) for r in src.read().orderBy("conv_id", "turn_idx").select(*out).collect()]
    b = [tuple(r) for r in dst.read().orderBy("conv_id", "turn_idx").select(*out).collect()]
    assert a == b
    feed.unpersist()


def test_mirror_lag_metric(spark, tmp_path, tables):
    feed, src, dst = tables
    apply_changes(feed.filter("pmod(lsn, 2) = 1"), src, batch_id="a", mode="mor")
    m = _mirror(spark, src, dst, tmp_path, mode="mor")
    assert m.lag() == src.current().version  # nothing mirrored yet
    m.run_to_completion(timeout_sec=120)
    assert m.lag() == 0  # streamed path records the position too
    apply_changes(feed.filter("pmod(lsn, 2) = 0"), src, batch_id="b", mode="mor")
    assert m.lag() == 1
    m2 = _mirror(spark, src, dst, tmp_path, mode="mor")
    m2.catch_up(window=4)
    assert m2.lag() == 0
    assert _state(dst) == _state(src)


def test_mirror_cli_end_to_end(spark, tmp_path, tables):
    """Drive the mirror CLI as a subprocess (streaming drain), then a
    second windowed invocation after the source advances."""
    import json
    import subprocess
    import sys as _sys

    feed, src, _ = tables
    apply_changes(feed.filter("pmod(lsn, 2) = 1"), src, batch_id="a", mode="mor")
    replica_root = str(tmp_path / "replica_cli")

    def run(*extra):
        out = subprocess.run(
            [
                _sys.executable, "-m",
                "orientdb_neo4j_importer_plugin_spark.mirror_cli",
                "--source", src.root,
                "--replica", replica_root,
                "--checkpoint", str(tmp_path / "cli_ckpt"),
                "--master", "local[4]",
                *extra,
            ],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    m1 = run()
    assert m1["replication_lag"] == 0
    apply_changes(feed.filter("pmod(lsn, 2) = 0"), src, batch_id="b", mode="mor")
    m2 = run("--window", "1")
    assert m2["replication_lag"] == 0
    replica = SnapshotTable.load(spark, replica_root)
    assert [
        tuple(r) for r in replica.read().orderBy("conv_id", "turn_idx").select(*OUT).collect()
    ] == _state(src)


def test_verify_replica_report(spark, tmp_path, tables):
    from orientdb_neo4j_importer_plugin_spark.cdc.verify import verify_replica

    feed, src, dst = tables
    apply_changes(feed.filter("pmod(lsn, 2) = 1"), src, batch_id="a", mode="mor")
    apply_changes(feed.filter("pmod(lsn, 2) = 0"), src, batch_id="b", mode="mor")
    m = _mirror(spark, src, dst, tmp_path, mode="mor")
    m.catch_up(window=1)
    rep = verify_replica(src, dst)
    assert rep.ok and rep.content_match and rep.missing_rows == 0

    # poison the replica with one extra row: the report must catch it
    import datetime

    bad = spark.createDataFrame(
        [(10**15, "I", "conv_bogus", 0, "user", "intruder",
          datetime.datetime(2026, 1, 1))],
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, ts timestamp",
    )
    apply_changes(bad, dst, batch_id="poison", mode="mor")
    rep2 = verify_replica(src, dst)
    assert not rep2.ok and rep2.extra_rows == 1


def test_multi_hop_replication_chain(spark, tmp_path, tables):
    """A -> B -> C: a replica is itself a valid mirror source (the commit
    log is the same metadata either way), so cascade chains compose."""
    from orientdb_neo4j_importer_plugin_spark.cdc.verify import verify_replica

    feed, src, b = tables
    apply_changes(feed.filter("pmod(lsn, 2) = 1"), src, batch_id="a", mode="mor")
    apply_changes(feed.filter("pmod(lsn, 2) = 0"), src, batch_id="b", mode="mor")
    c = SnapshotTable.create(
        spark, str(tmp_path / "c"), TRANSCRIPTS_V1, "conv_id", num_buckets=2
    )
    MirrorRunner(
        spark, src, b, checkpoint_dir=str(tmp_path / "ck_ab"), mode="mor"
    ).run_to_completion(timeout_sec=120)
    MirrorRunner(
        spark, b, c, checkpoint_dir=str(tmp_path / "ck_bc"), mode="mor"
    ).run_to_completion(timeout_sec=120)
    assert verify_replica(src, c).ok
    assert _state(c) == _state(src)


def test_mirror_cli_bootstrap_then_stream(spark, tmp_path, tables):
    import json
    import subprocess
    import sys as _sys

    feed, src, _ = tables
    apply_changes(feed.filter("pmod(lsn, 2) = 1"), src, batch_id="a", mode="mor")
    apply_changes(feed.filter("pmod(lsn, 2) = 0"), src, batch_id="b", mode="mor")
    replica_root = str(tmp_path / "replica_boot")
    out = subprocess.run(
        [
            _sys.executable, "-m",
            "orientdb_neo4j_importer_plugin_spark.mirror_cli",
            "--source", src.root,
            "--replica", replica_root,
            "--checkpoint", str(tmp_path / "boot_ckpt"),
            "--master", "local[4]",
            "--mode", "mor",
            "--bootstrap",
        ],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    m = json.loads(out.stdout.strip().splitlines()[-1])
    assert m["replication_lag"] == 0
    replica = SnapshotTable.load(spark, replica_root)
    assert [
        tuple(r)
        for r in replica.read().orderBy("conv_id", "turn_idx").select(*OUT).collect()
    ] == _state(src)
    # the bootstrap position is durable: a fresh in-process runner sees it
    r2 = MirrorRunner(
        spark, src, replica, checkpoint_dir=str(tmp_path / "other_ckpt")
    )
    assert r2.lag() == 0
    assert r2.catch_up(window=4) == []


def test_mirror_stream_bounded_versions(spark, tmp_path, tables):
    """A multi-version backlog drains as N-version micro-batches through
    run_to_completion() alone — the lake_cdf reader self-caps latestOffset
    at position + maxVersionsPerTrigger and the runner loops availableNow
    passes (Spark pins each pass's target at its first latestOffset)."""
    feed, src, dst = tables
    for i in range(6):
        apply_changes(
            feed.filter(f"pmod(lsn, 6) = {i}"), src, batch_id=f"b{i}", mode="mor"
        )
    m = _mirror(
        spark, src, dst, tmp_path, mode="mor", max_versions_per_trigger=2
    )
    m.run_to_completion(timeout_sec=240)
    assert m.metrics.batches >= 3  # 6 source versions / 2 per trigger
    assert m.lag() == 0
    assert _state(dst) == _state(src)

    # resume on the SAME checkpoint after the source advances, ending in an
    # EMPTY commit (no rows -> no lineage record; the checkpoint offset is
    # the progress signal that keeps the drain loop from wedging there)
    apply_changes(feed.filter("pmod(lsn, 4) = 1"), src, batch_id="x", mode="mor")
    apply_changes(feed.limit(0), src, batch_id="empty", mode="mor")
    m2 = _mirror(
        spark, src, dst, tmp_path, mode="mor", max_versions_per_trigger=1
    )
    m2.run_to_completion(timeout_sec=240)
    assert _state(dst) == _state(src)
    assert m2._checkpoint_position() == src.current().version


def test_catch_up_pinned_head_terminates(spark, tmp_path, tables, monkeypatch):
    """catch_up drains to the head AT ENTRY: a source that commits at least
    one version per window drain must not keep the loop chasing forever (a
    mirror_cli --window run would otherwise never exit)."""
    import orientdb_neo4j_importer_plugin_spark.cdc.apply as apply_mod

    feed, src, dst = tables
    for i in range(3):
        apply_changes(
            feed.filter(f"pmod(lsn, 3) = {i}"), src, batch_id=f"b{i}", mode="mor"
        )
    real_apply = apply_mod.apply_changes
    racing = {"n": 0}

    def racing_apply(events, table, **kw):
        res = real_apply(events, table, **kw)
        if table is dst:  # every replica window -> one new source commit
            racing["n"] += 1
            real_apply(
                feed.filter(f"pmod(lsn, 5) = {racing['n'] % 5}"),
                src, batch_id=f"race{racing['n']}", mode="mor",
            )
        return res

    monkeypatch.setattr(apply_mod, "apply_changes", racing_apply)
    m = _mirror(spark, src, dst, tmp_path, mode="mor")
    results = m.catch_up(window=1)
    monkeypatch.undo()
    assert len(results) == 3  # pinned: only versions <= head-at-entry
    assert m.lag() == racing["n"]  # the racing commits are left for later
    m.catch_up(window=8)  # ...and the next call picks them up
    assert _state(dst) == _state(src)


def test_mirror_cli_custom_key_table(spark, tmp_path):
    """Auto-created replicas inherit the SOURCE's key_columns (an LWW merge
    grouping on different keys would silently diverge), and an existing
    replica keyed differently is refused."""
    import subprocess
    import sys as _sys

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

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
    ev = spark.range(8).select(
        F.col("id").alias("lsn"), F.lit("I").alias("op"),
        F.col("id").alias("user_id"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("name"),
    )
    apply_changes(ev, src, batch_id="i", mode="mor")
    replica_root = str(tmp_path / "krep")

    def run(replica, *extra):
        return subprocess.run(
            [
                _sys.executable, "-m",
                "orientdb_neo4j_importer_plugin_spark.mirror_cli",
                "--source", src.root, "--replica", replica,
                "--checkpoint", str(tmp_path / "kckpt"),
                "--master", "local[4]", "--mode", "mor", *extra,
            ],
            capture_output=True, text=True, timeout=300, cwd="/root/repo",
        )

    out = run(replica_root)
    assert out.returncode == 0, out.stderr[-2000:]
    replica = SnapshotTable.load(spark, replica_root)
    assert list(replica.current().keys) == ["user_id"]
    assert [
        tuple(r) for r in replica.read().orderBy("user_id").collect()
    ] == [tuple(r) for r in src.read().orderBy("user_id").collect()]

    # replica keyed differently from the source: refuse, don't diverge
    bad_root = str(tmp_path / "kbad")
    SnapshotTable.create(
        spark, bad_root, schema, "user_id",
        num_buckets=4, key_columns=["user_id", "name"],
    )
    out2 = run(bad_root)
    assert out2.returncode != 0
    assert "key columns" in (out2.stderr + out2.stdout)
