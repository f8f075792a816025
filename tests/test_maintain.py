"""maintain() orchestration + key-range scans over per-file key bounds."""

from pyspark.sql import functions as F

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable


def _long_key_table(spark, tmp_path, n=200, batches=4):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("name", StringType(), True),
        ]
    )
    table = SnapshotTable.create(
        spark, str(tmp_path / "mt"), schema, "user_id",
        num_buckets=8, key_columns=["user_id"],
    )
    events = spark.range(n).select(
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
        F.col("id").alias("user_id"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("name"),
    )
    per = n // batches
    for i in range(batches):
        apply_changes(
            events.filter(f"user_id >= {i * per} and user_id < {(i + 1) * per}"),
            table,
            batch_id=f"m{i}",
            mode="mor",
        )
    return table


def test_maintain_compacts_only_backlogged_buckets(spark, tmp_path):
    table = _long_key_table(spark, tmp_path, batches=4)
    before = {
        (r["user_id"], r["name"]) for r in table.read().collect()
    }
    snap = table.current()
    backlog = {b for b, fs in snap.deltas.items() if len(fs) >= 3}
    cold = {b for b, fs in snap.deltas.items() if 0 < len(fs) < 3}
    assert backlog, "fixture should have backlogged buckets"

    s = table.maintain(compact_if_deltas=3, changelog=True)
    after = table.current()
    # backlogged buckets folded; cold buckets untouched
    assert set(map(str, s["compacted_buckets"])) == backlog
    for b in backlog:
        assert b not in after.deltas
    for b in cold:
        assert b in after.deltas
    # changelogs materialized for every version incl. the compaction commit
    assert s["changelog_versions"] >= after.version - 1
    assert all(
        table.changelog_files(v) is not None
        for v in range(1, after.version + 1)
    )
    assert {(r["user_id"], r["name"]) for r in table.read().collect()} == before


def test_maintain_noop_below_threshold(spark, tmp_path):
    table = _long_key_table(spark, tmp_path, batches=2)
    v = table.current().version
    s = table.maintain(compact_if_deltas=100, changelog=False)
    assert s["compacted_buckets"] == []
    assert table.current().version == v


def test_maintain_expire_and_orphans(spark, tmp_path):
    table = _long_key_table(spark, tmp_path, batches=4)
    before = {(r["user_id"], r["name"]) for r in table.read().collect()}
    s = table.maintain(
        compact_if_deltas=1,
        changelog=True,
        expire_keep_last=1,
        orphans_older_than_sec=0.0,
    )
    assert "expired_files" in s and "orphan_files" in s
    assert {(r["user_id"], r["name"]) for r in table.read().collect()} == before


def test_read_keyrange_skips_files_and_matches_filter(spark, tmp_path):
    table = _long_key_table(spark, tmp_path, batches=4)
    table.compact(max_file_rows=10)  # tight disjoint per-file key ranges
    lo, hi = 40, 55
    df = table.read_keyrange(lo, hi)
    got = {(r["user_id"], r["name"]) for r in df.collect()}
    want = {
        (r["user_id"], r["name"])
        for r in table.read()
        .filter(f"user_id between {lo} and {hi}")
        .collect()
    }
    assert got == want and got
    snap = table.current()
    total = len(snap.base_files(None))
    assert len(df.inputFiles()) < total, "range scan read every file"


def test_read_keyrange_without_stats_is_correct(spark, tmp_path):
    table = _long_key_table(spark, tmp_path, batches=2)
    for f, s in table._stats_cache.items():
        s.pop("key_min", None)
        s.pop("key_max", None)
    got = {r["user_id"] for r in table.read_keyrange(10, 20).collect()}
    assert got == set(range(10, 21))
