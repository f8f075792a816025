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


def _ts_table(spark, tmp_path, n=200, batches=4):
    """Table whose ts correlates with the key (the time-series shape):
    compaction's key-clustering then gives tight per-file ts bounds."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("name", StringType(), True),
            StructField("ts", TimestampType(), True),
        ]
    )
    table = SnapshotTable.create(
        spark, str(tmp_path / "tsmt"), schema, "user_id",
        num_buckets=8, key_columns=["user_id"],
    )
    events = spark.range(n).select(
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
        F.col("id").alias("user_id"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("name"),
        F.expr(
            "timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,id,0,0)"
        ).alias("ts"),
    )
    per = n // batches
    for i in range(batches):
        apply_changes(
            events.filter(f"user_id >= {i * per} and user_id < {(i + 1) * per}"),
            table,
            batch_id=f"t{i}",
            mode="mor",
        )
    return table


def test_read_colrange_skips_files_and_matches_filter(spark, tmp_path):
    import datetime as dt

    table = _ts_table(spark, tmp_path)
    table.compact(max_file_rows=10)  # tight per-file bounds
    lo, hi = dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 3)
    df = table.read_colrange("ts", lo, hi)
    got = {(r["user_id"], r["name"], r["ts"]) for r in df.collect()}
    want = {
        (r["user_id"], r["name"], r["ts"])
        for r in table.read()
        .filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi)))
        .collect()
    }
    assert got == want and got
    total = len(table.current().base_files(None))
    assert len(df.inputFiles()) < total, "ts-range scan read every file"
    # string bounds accepted for timestamp columns
    df2 = table.read_colrange("ts", "2024-01-02 00:00:00", "2024-01-03 00:00:00")
    assert {(r["user_id"], r["name"], r["ts"]) for r in df2.collect()} == want


def test_read_colrange_without_stats_is_correct(spark, tmp_path):
    table = _ts_table(spark, tmp_path, batches=2)
    table.compact()
    for f, s in table._stats_cache.items():
        s.pop("cols", None)
    got = {r["user_id"] for r in table.read_colrange(
        "ts", "2024-01-02 00:00:00", "2024-01-03 00:00:00"
    ).collect()}
    assert got == set(range(24, 49))  # hours 24..48 inclusive


def test_read_colrange_mor_bucket_is_not_pruned(spark, tmp_path):
    """SOUNDNESS: with deltas present, a key's winner (ts OUT of range)
    may sit in a delta file while a stale base loser (ts IN range) sits in
    a base file whose bounds overlap the band. File pruning on a non-key
    column must not resurrect the loser — buckets with deltas are read in
    full and LWW-merged."""
    import datetime as dt

    table = _ts_table(spark, tmp_path, n=50, batches=1)
    table.compact(max_file_rows=5)  # losers now in base files
    updates = spark.range(50).select(
        (F.col("id") + 1000).alias("lsn"),
        F.lit("U").alias("op"),
        F.col("id").alias("user_id"),
        F.concat(F.lit("v2_"), F.col("id").cast("string")).alias("name"),
        # winners move OUT of the queried band
        F.lit(dt.datetime(2030, 1, 1)).alias("ts"),
    )
    apply_changes(updates, table, batch_id="mv", mode="mor")
    df = table.read_colrange("ts", "2024-01-01 00:00:00", "2024-01-09 00:00:00")
    assert df.count() == 0, "stale base rows surfaced past their delta winners"
    # and the winners are visible in their own band
    got = table.read_colrange("ts", "2029-12-31 00:00:00", "2030-01-02 00:00:00")
    assert got.count() == 50


def test_read_colrange_delegates_key_and_rejects_unknown(spark, tmp_path):
    table = _ts_table(spark, tmp_path, n=40, batches=1)
    got = {r["user_id"] for r in table.read_colrange("user_id", 5, 9).collect()}
    assert got == set(range(5, 10))
    try:
        table.read_colrange("nope", 0, 1)
        raise AssertionError("expected ValueError for unknown column")
    except ValueError:
        pass


def test_maintain_sequences_tombstone_vacuum(spark, tmp_path):
    from orientdb_neo4j_importer_plugin_spark.lake.table import (
        DELETED_COL,
        LSN_COL,
    )

    table = _long_key_table(spark, tmp_path, batches=2)
    deletes = spark.range(30).select(
        (F.col("id") + 10_000).alias("lsn"),
        F.lit("D").alias("op"),
        F.col("id").alias("user_id"),
        F.lit(None).cast("string").alias("name"),
    )
    apply_changes(deletes, table, batch_id="del", mode="mor")
    before = {(r["user_id"], r["name"]) for r in table.read().collect()}
    n_tombs = table.read(raw=True).filter(F.col(DELETED_COL)).count()
    assert n_tombs == 30
    s = table.maintain(
        compact_if_deltas=1, tombstone_below_lsn=20_000, changelog=True
    )
    assert s["tombstones_vacuumed"] is True
    assert table.read(raw=True).filter(F.col(DELETED_COL)).count() == 0
    assert {(r["user_id"], r["name"]) for r in table.read().collect()} == before
    # watermark respected: a second pass below every remaining lsn is a no-op
    v = table.current().version
    s2 = table.maintain(compact_if_deltas=100, tombstone_below_lsn=0)
    assert s2["tombstones_vacuumed"] is False
    assert table.current().version == v
    # replay invariant: the vacuumed-away delete batch is still in the ledger
    assert table.is_batch_committed("del")


def _scrambled_ts_table(spark, tmp_path, name, n=200):
    """ts DEcorrelated from the key (conversations updated at arbitrary
    times): key-clustered compaction gives every file ~full-range ts
    bounds, so colrange pruning needs cluster_by."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("name", StringType(), True),
            StructField("ts", TimestampType(), True),
        ]
    )
    table = SnapshotTable.create(
        spark, str(tmp_path / name), schema, "user_id",
        num_buckets=4, key_columns=["user_id"],
    )
    events = spark.range(n).select(
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
        F.col("id").alias("user_id"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("name"),
        F.expr(
            "timestamp'2024-01-01 00:00:00'"
            " + make_interval(0,0,0,0,cast(id * 37 % 200 as int),0,0)"
        ).alias("ts"),
    )
    apply_changes(events, table, batch_id="all", mode="mor")
    return table


def test_compact_cluster_by_enables_ts_pruning(spark, tmp_path):
    """Sort-order-on-rewrite: with ts decorrelated from the key,
    key-clustered files span the whole ts range (colrange skips ~nothing)
    while cluster_by=["ts"] files carry tight disjoint bounds (colrange
    skips most files). Results identical either way."""
    key_t = _scrambled_ts_table(spark, tmp_path, "bykey")
    ts_t = _scrambled_ts_table(spark, tmp_path, "byts")
    key_t.compact(max_file_rows=10)
    ts_t.compact(max_file_rows=10, cluster_by=["ts"])
    lo, hi = "2024-01-02 00:00:00", "2024-01-03 00:00:00"
    got_key = {tuple(r) for r in key_t.read_colrange("ts", lo, hi).collect()}
    got_ts = {tuple(r) for r in ts_t.read_colrange("ts", lo, hi).collect()}
    want = {
        tuple(r)
        for r in key_t.read()
        .filter("ts between timestamp'2024-01-02' and timestamp'2024-01-03'")
        .collect()
    }
    assert got_key == want and got_ts == want and want
    n_key = len(key_t.read_colrange("ts", lo, hi).inputFiles())
    n_ts = len(ts_t.read_colrange("ts", lo, hi).inputFiles())
    total = len(ts_t.current().base_files(None))
    # the band covers 25/200 hours -> ts-clustered scan should touch a
    # small fraction; key-clustered scan cannot skip (every file spans
    # nearly the full range)
    assert n_ts < n_key, (n_ts, n_key)
    assert n_ts <= total // 2, (n_ts, total)


def test_maintain_forwards_cluster_by(spark, tmp_path):
    table = _scrambled_ts_table(spark, tmp_path, "viam")
    table.maintain(compact_if_deltas=1, max_file_rows=10, cluster_by=["ts"],
                   changelog=False)
    lo, hi = "2024-01-02 00:00:00", "2024-01-03 00:00:00"
    df = table.read_colrange("ts", lo, hi)
    total = len(table.current().base_files(None))
    assert len(df.inputFiles()) <= total // 2
    assert df.count() == 25  # hours 24..48 step-37 scramble hits 25 ids


def test_compact_cluster_by_rejects_unknown_column(spark, tmp_path):
    table = _scrambled_ts_table(spark, tmp_path, "badcol", n=20)
    try:
        table.compact(cluster_by=["not_a_col"])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_maintain_cli_end_to_end(spark, tmp_path):
    """Drive the maintenance CLI as a subprocess over a MOR-backlogged
    table: deltas fold, state unchanged, summary JSON printed."""
    import json
    import subprocess
    import sys as _sys

    from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed
    from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS_V1

    feed = gen_feed(spark, n_convs=4, turns_per_conv=5, updates_per_key=1)
    table = SnapshotTable.create(
        spark, str(tmp_path / "mt"), TRANSCRIPTS_V1, "conv_id", num_buckets=4
    )
    for i in range(3):
        apply_changes(
            feed.filter(f"pmod(lsn, 3) = {i}"), table,
            batch_id=f"m{i}", mode="mor",
        )
    before = [
        tuple(r)
        for r in table.read().orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "role", "text", "ts").collect()
    ]
    out = subprocess.run(
        [
            _sys.executable, "-m",
            "orientdb_neo4j_importer_plugin_spark.maintain_cli",
            "--table", table.root,
            "--master", "local[4]",
            "--compact-if-deltas", "1",
            "--expire-keep", "50",
        ],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary.get("compacted_buckets") or summary.get("compact", summary)
    t2 = SnapshotTable.load(spark, table.root)
    assert not t2.current().deltas  # backlog folded
    after = [
        tuple(r)
        for r in t2.read().orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "role", "text", "ts").collect()
    ]
    assert after == before
