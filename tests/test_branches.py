"""Refs: tags, branches, and write-audit-publish.

Reference analogue: the importer's one-shot migration writes into a LIVE
OrientDB database with no staging step (`ONeo4jImporterVerticesAndEdgesMigrator.java`
commits straight to the target); a lake-native engine gets the safer
pattern — stage on a branch, audit, fast-forward publish — for free from
its immutable-snapshot commit protocol (Iceberg WAP analogue).
"""

import os

import pytest
from pyspark.sql import functions as F

from orientdb_neo4j_importer_plugin_spark.cdc import (
    apply_changes,
    delete_where,
    update_where,
)
from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.lake.table import ConcurrentCommitError
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS_V1


def _mk(spark, tmp_path, *, n_convs=12, name="t"):
    feed = gen_feed(
        spark, n_convs=n_convs, turns_per_conv=4, updates_per_key=1, delete_every=9
    )
    table = SnapshotTable.create(
        spark, str(tmp_path / name), TRANSCRIPTS_V1, "conv_id", num_buckets=4
    )
    apply_changes(feed, table, batch_id="seed", mode="mor")
    return table, feed


def _state(table, snap=None):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in table.read(snap).select("conv_id", "turn_idx", "text").collect()
    }


# -- tags ---------------------------------------------------------------------


def test_tag_pins_version_against_expire(spark, tmp_path):
    table, feed = _mk(spark, tmp_path)
    tagged = table.current()
    table.create_tag("audited")
    before = _state(table, tagged)
    # churn several COW rewrites so the tagged version leaves the keep-last window
    for i in range(4):
        update_where(table, "turn_idx = 0", {"text": f"'v{i}'"}, batch_id=f"u{i}")
    table.expire_snapshots(keep_last=1)
    snap = table.snapshot_at_tag("audited")
    assert snap.version == tagged.version
    assert _state(table, snap) == before  # files survived the expire
    table.drop_tag("audited")
    table.expire_snapshots(keep_last=1)
    assert not os.path.exists(
        os.path.join(table.meta_dir, f"v{tagged.version:08d}.json")
    )


def test_tag_immutable_and_named_read(spark, tmp_path):
    table, _ = _mk(spark, tmp_path)
    v = table.create_tag("cut")
    assert table.create_tag("cut") == v  # same-version re-create is a no-op
    update_where(table, "turn_idx = 0", {"text": "'x'"}, batch_id="u")
    with pytest.raises(ValueError, match="immutable"):
        table.create_tag("cut")
    with pytest.raises(KeyError):
        table.snapshot_at_tag("ghost")
    with pytest.raises(ValueError, match="ref name"):
        table.create_tag("bad/name")


# -- branches: write-audit-publish ---------------------------------------------


def test_wap_publish_fast_forward(spark, tmp_path):
    table, feed = _mk(spark, tmp_path)
    main_before = _state(table)
    base = table.current().version
    br = table.create_branch("wap")
    assert _state(br) == main_before  # fork sees base state, zero data IO
    # stage risky work on the branch: a CDC batch + DML
    apply_changes(
        feed.withColumn("lsn", F.col("lsn") + 10_000)
        .withColumn("text", F.upper("text"))
        .filter("turn_idx = 1"),
        br,
        batch_id="risky",
        mode="mor",
    )
    delete_where(br, "turn_idx = 3", batch_id="prune", mode="mor")
    staged = _state(br)
    assert _state(table) == main_before  # audit tier: main never saw it
    published = table.publish_branch("wap")
    assert _state(table) == staged
    assert published.parent == base and published.version == base + 1
    assert "wap" not in table.refs()["branches"]  # drop=True default
    # every published file is OWNED by main (hard-linked in), so the
    # dropped branch tree can't take data with it
    own = table.data_dir.rstrip(os.sep) + os.sep
    assert all(f.startswith(own) for f in table.current().all_files())
    assert all(os.path.exists(f) for f in table.current().all_files())


def test_publish_carries_exactly_once_ledger(spark, tmp_path):
    table, feed = _mk(spark, tmp_path)
    seed_v = table.current().ledger["seed"]
    br = table.create_branch("b")
    extra = feed.withColumn("lsn", F.col("lsn") + 10_000).filter("turn_idx = 0")
    apply_changes(extra, br, batch_id="br-batch", mode="mor")
    table.publish_branch("b")
    v = table.current().version
    # replaying the branch's batch id into MAIN is a ledgered no-op
    apply_changes(extra, table, batch_id="br-batch", mode="mor")
    assert table.current().version == v
    # and the pre-fork seed batch kept its original ledger stamp
    assert table.current().ledger["seed"] == seed_v
    assert table.current().ledger["br-batch"] == v


def test_publish_conflict_when_main_moved(spark, tmp_path):
    table, _ = _mk(spark, tmp_path)
    br = table.create_branch("b")
    update_where(br, "turn_idx = 0", {"text": "'branch'"}, batch_id="bu")
    update_where(table, "turn_idx = 1", {"text": "'main'"}, batch_id="mu")
    with pytest.raises(ConcurrentCommitError, match="fast-forward-only"):
        table.publish_branch("b")
    # the branch is intact for a changelog-replay merge or a re-branch
    assert _state(table.branch("b"))[
        next(k for k in _state(br) if k[1] == 0)
    ] == "branch"


def test_publish_schema_evolution_propagates(spark, tmp_path):
    table, feed = _mk(spark, tmp_path)
    br = table.create_branch("evo")
    evolved = feed.filter("turn_idx = 2").withColumn(
        "lsn", F.col("lsn") + 10_000
    ).withColumn("rating", F.lit(5).cast("int"))
    apply_changes(evolved, br, batch_id="evo", mode="mor")
    table.publish_branch("evo")
    out = table.read()
    assert "rating" in out.columns
    got = {r["turn_idx"]: r["rating"] for r in out.select("turn_idx", "rating").distinct().collect()}
    assert got[2] == 5
    assert all(v is None for t, v in got.items() if t != 2)  # null backfill


def test_branch_base_pinned_against_expire_until_drop(spark, tmp_path):
    table, _ = _mk(spark, tmp_path)
    br = table.create_branch("long-lived")
    base_files = set(table.current().all_files())
    for i in range(4):
        update_where(table, "turn_idx >= 0", {"text": f"'v{i}'"}, batch_id=f"u{i}")
    table.expire_snapshots(keep_last=1)
    assert all(os.path.exists(f) for f in base_files)  # borrowed files alive
    assert _state(br)  # branch still reads its base
    table.drop_branch("long-lived")
    table.expire_snapshots(keep_last=1)
    assert not any(os.path.exists(f) for f in base_files)  # unpinned -> expired


def test_fresh_branch_publish_is_noop_and_dup_branch_rejected(spark, tmp_path):
    table, _ = _mk(spark, tmp_path)
    table.create_branch("idle")
    with pytest.raises(ValueError, match="already exists"):
        table.create_branch("idle")
    v = table.current().version
    assert table.publish_branch("idle").version == v  # nothing staged
    assert "idle" not in table.refs()["branches"]


def test_published_changes_are_cdc_visible(spark, tmp_path):
    """Publish commits ONE snapshot, so downstream CDC consumers (changelog,
    mirrors, streamed views) replay the branch's net effect atomically."""
    table, _ = _mk(spark, tmp_path)
    v0 = table.current().version
    br = table.create_branch("b")
    update_where(br, "role = 'user'", {"text": "upper(text)"}, batch_id="bu", mode="mor")
    table.publish_branch("b")
    ch = table.changelog(v0, table.current().version)
    ops = {r["op"] for r in ch.select("op").distinct().collect()}
    assert ops == {"U"} and ch.count() > 0


def test_refs_cli_end_to_end(spark, tmp_path):
    """Drive the full WAP flow with refs_cli subprocesses for the refs
    steps (which start NO Spark — each must return in well under the JVM
    startup time) and the normal engine surface for the staging step."""
    import json
    import subprocess
    import sys as _sys
    import time as _time

    table, _ = _mk(spark, tmp_path, name="rc")

    def refs(*argv):
        t0 = _time.time()
        out = subprocess.run(
            [_sys.executable, "-m",
             "orientdb_neo4j_importer_plugin_spark.refs_cli",
             "--table", table.root, *argv],
            capture_output=True, text=True, timeout=60, cwd="/root/repo",
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert _time.time() - t0 < 15  # metadata-only: no JVM spin-up
        return json.loads(out.stdout.strip().splitlines()[-1])

    assert refs("tag", "pre")["pinned_version"] == table.current().version
    got = refs("branch", "wap")
    assert got["branch_root"].endswith("branches/wap")
    # stage on the branch through the normal engine surface
    br = table.branch("wap")
    update_where(br, "turn_idx = 0", {"text": "'published'"}, batch_id="s", mode="mor")
    staged = _state(br)
    pub = refs("publish", "wap")
    assert pub["published_version"] == table.current().version
    assert _state(table) == staged
    listed = refs("list")
    assert listed["tags"] == {"pre": 1} and listed["branches"] == {}
    refs("drop-tag", "pre")
    assert SnapshotTable.load(spark, table.root).refs()["tags"] == {}


def test_merge_branch_diverged_lww(spark, tmp_path):
    """Both sides edit since the fork: disjoint keys both land; the SAME
    key edited on both sides resolves by LWW on lsn — the branch's later
    write wins over main's earlier one, and vice versa."""
    table, feed = _mk(spark, tmp_path)
    br = table.create_branch("b")
    # branch edits turn 0 (high lsn) and turn 1 (low lsn)
    apply_changes(
        feed.filter("turn_idx = 0").withColumn("lsn", F.col("lsn") + 50_000)
        .withColumn("text", F.lit("branch-wins")),
        br, batch_id="b-hi", mode="mor",
    )
    apply_changes(
        feed.filter("turn_idx = 1").withColumn("lsn", F.col("lsn") + 10_000)
        .withColumn("text", F.lit("branch-loses")),
        br, batch_id="b-lo", mode="mor",
    )
    # main moves past the fork point: edits turn 1 (high) and turn 2
    apply_changes(
        feed.filter("turn_idx = 1").withColumn("lsn", F.col("lsn") + 50_000)
        .withColumn("text", F.lit("main-wins")),
        table, batch_id="m-hi", mode="mor",
    )
    apply_changes(
        feed.filter("turn_idx = 2").withColumn("lsn", F.col("lsn") + 10_000)
        .withColumn("text", F.lit("main-only")),
        table, batch_id="m2", mode="mor",
    )
    with pytest.raises(ConcurrentCommitError):
        table.publish_branch("b")
    res = table.merge_branch("b")
    assert res is not None and "b" not in table.refs()["branches"]
    texts = {t: set() for t in range(4)}
    for (c, t), txt in _state(table).items():
        texts.setdefault(t, set()).add(txt)
    assert texts[0] == {"branch-wins"}
    assert texts[1] == {"main-wins"}
    assert texts[2] == {"main-only"}


def test_merge_branch_equals_publish_when_not_diverged(spark, tmp_path):
    """On a non-diverged main, merge_branch and publish_branch converge to
    the same LWW state (merge rewrites data; publish links it)."""
    t1, f1 = _mk(spark, tmp_path, name="m1")
    t2, _ = _mk(spark, tmp_path, name="m2")
    for t in (t1, t2):
        br = t.create_branch("b")
        update_where(br, "turn_idx = 0", {"text": "'staged'"}, batch_id="s", mode="mor")
    t1.merge_branch("b")
    t2.publish_branch("b")
    assert _state(t1) == _state(t2)


def test_ref_name_traversal_rejected_and_drop_untracked_is_safe(spark, tmp_path):
    """'.'/'..' ref names would make the branch root escape root/branches/
    (drop_branch would rmtree the TABLE); dropping an untracked name must
    touch nothing."""
    table, _ = _mk(spark, tmp_path, name="sec")
    for bad in (".", "..", "...", "a/b", ""):
        with pytest.raises(ValueError):
            table.create_branch(bad)
        with pytest.raises(ValueError):
            table.create_tag(bad)
    with pytest.raises(ValueError):
        table.drop_branch("..")
    table.drop_branch("never-created")  # idempotent no-op
    assert os.path.exists(table.meta_dir) and _state(table)
