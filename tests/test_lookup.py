"""Point lookup (bucket-pruned key read) + compaction sort clustering."""

import pyarrow.parquet as pq
import pytest

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS_V1


def _table(spark, tmp_path, mode="mor"):
    feed = gen_feed(
        spark, n_convs=16, turns_per_conv=6, updates_per_key=2, delete_every=5
    )
    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    apply_changes(feed, table, batch_id="b0", mode=mode)
    return table


def test_lookup_matches_full_read(spark, tmp_path):
    table = _table(spark, tmp_path)
    full = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in table.read().collect()
    }
    # a live key: exact row back
    (conv, turn), text = next(iter(sorted(full.items())))
    got = table.lookup({"conv_id": conv, "turn_idx": turn}).collect()
    assert len(got) == 1
    assert got[0]["text"] == text
    # partition-key-only lookup: the whole conversation
    conv_rows = table.lookup({"conv_id": conv}).collect()
    assert {(r["conv_id"], r["turn_idx"]) for r in conv_rows} == {
        k for k in full if k[0] == conv
    }
    # a deleted key: no row (tombstones hidden)
    deleted = table.read(raw=True).filter("__deleted").first()
    if deleted is not None:
        assert (
            table.lookup(
                {"conv_id": deleted["conv_id"], "turn_idx": deleted["turn_idx"]}
            ).count()
            == 0
        )


def test_lookup_prunes_to_one_bucket(spark, tmp_path):
    table = _table(spark, tmp_path)
    conv = table.read().first()["conv_id"]
    pruned = set(table.lookup({"conv_id": conv}).inputFiles())
    all_files = set(table.read().inputFiles())
    assert pruned
    assert len(pruned) < len(all_files)
    # the pruned set is exactly one bucket's file lists
    snap = table.current()
    per_bucket = {
        b: set(snap.base_files([int(b)]) + snap.delta_files([int(b)]))
        for b in snap.buckets.keys() | snap.deltas.keys()
    }
    # inputFiles returns file:// URIs; compare by suffix
    def norm(fs):
        return {f.split("file:")[-1].lstrip("/") for f in fs}

    assert any(norm(pruned) == norm(fs) for fs in per_bucket.values())


def test_lookup_non_string_partition_key(spark, tmp_path):
    """Regression: the lookup literal must be hashed at the COLUMN's type.
    xxhash64 is width-sensitive (int 42 and long 42 hash differently), so
    an uncast python int against a LongType key would route to the wrong
    bucket and silently return empty."""
    from pyspark.sql import functions as F
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
        spark, str(tmp_path / "by_long"), schema, "user_id",
        num_buckets=16, key_columns=["user_id"],
    )
    events = spark.range(200).select(
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
        F.col("id").alias("user_id"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("name"),
    )
    apply_changes(events, table, batch_id="b0", mode="mor")
    for probe in (0, 42, 137):
        got = table.lookup({"user_id": probe}).collect()
        assert len(got) == 1, f"user_id={probe} not found"
        assert got[0]["name"] == f"u{probe}"


def test_lookup_requires_partition_key(spark, tmp_path):
    table = _table(spark, tmp_path)
    with pytest.raises(ValueError, match="partition key"):
        table.lookup({"turn_idx": 1})
    with pytest.raises(ValueError, match="not key columns"):
        table.lookup({"conv_id": "conv_000001", "text": "x"})


def _long_key_table(spark, tmp_path):
    from pyspark.sql import functions as F
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
        spark, str(tmp_path / "skip_t"), schema, "user_id",
        num_buckets=16, key_columns=["user_id"],
    )
    events = spark.range(200).select(
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
        F.col("id").alias("user_id"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("name"),
    )
    return table, events


def test_lookup_skips_delta_files_within_bucket(spark, tmp_path):
    """Two MOR batches with disjoint key ranges land two delta files per
    bucket; a point lookup must read only the file whose footer key range
    covers the probe, not every delta in the bucket."""
    table, events = _long_key_table(spark, tmp_path)
    apply_changes(events.filter("user_id < 100"), table, batch_id="lo", mode="mor")
    apply_changes(events.filter("user_id >= 100"), table, batch_id="hi", mode="mor")
    snap = table.current()

    for probe in (5, 42, 150):
        import orientdb_neo4j_importer_plugin_spark.functions.xxhash as xx

        bucket = xx.spark_xxhash64(probe, snap.schema["user_id"].dataType) % 16
        total = len(snap.base_files([bucket])) + len(snap.delta_files([bucket]))
        kept_base, kept_deltas, skipped = table._lookup_files(bucket, probe, snap)
        assert skipped >= 1, f"probe {probe}: nothing skipped of {total}"
        assert len(kept_base) + len(kept_deltas) < total
        got = table.lookup({"user_id": probe}).collect()
        assert len(got) == 1 and got[0]["name"] == f"u{probe}"


def test_post_compaction_lookup_reads_fewer_files_than_bucket(spark, tmp_path):
    """VERDICT r2 item 5: compaction sort-clusters and (with max_file_rows)
    splits each bucket into tight disjoint key-range files; a lookup then
    reads fewer files than the bucket holds, with unchanged results."""
    table, events = _long_key_table(spark, tmp_path)
    apply_changes(events, table, batch_id="b0", mode="mor")
    table.compact(max_file_rows=4)
    snap = table.current()
    assert not snap.deltas

    skipped_any = False
    for probe in (0, 42, 137, 199):
        import orientdb_neo4j_importer_plugin_spark.functions.xxhash as xx

        bucket = xx.spark_xxhash64(probe, snap.schema["user_id"].dataType) % 16
        total = len(snap.base_files([bucket]))
        df = table.lookup({"user_id": probe})
        read = len(df.inputFiles())
        got = df.collect()
        assert len(got) == 1 and got[0]["name"] == f"u{probe}"
        if total > 1:
            assert read < total, f"probe {probe}: read {read}/{total} files"
            skipped_any = True
    assert skipped_any, "no bucket had >1 base file; fixture broken"


def test_lookup_skip_keeps_files_without_key_stats(spark, tmp_path):
    """Conservative fallback: a file with no recorded key bounds is always
    read (pre-stats manifests must not lose rows)."""
    table, events = _long_key_table(spark, tmp_path)
    apply_changes(events, table, batch_id="b0", mode="mor")
    snap = table.current()
    # blow away the stats cache entries' key bounds
    for f, s in table._stats_cache.items():
        s.pop("key_min", None)
        s.pop("key_max", None)
    for probe in (7, 123):
        import orientdb_neo4j_importer_plugin_spark.functions.xxhash as xx

        bucket = xx.spark_xxhash64(probe, snap.schema["user_id"].dataType) % 16
        kept_base, kept_deltas, skipped = table._lookup_files(bucket, probe, snap)
        assert skipped == 0
        got = table.lookup({"user_id": probe}).collect()
        assert len(got) == 1 and got[0]["name"] == f"u{probe}"


def test_compact_clusters_by_key(spark, tmp_path):
    table = _table(spark, tmp_path, mode="mor")
    assert table.current().deltas
    table.compact()
    snap = table.current()
    assert not snap.deltas
    checked = 0
    for f in snap.base_files():
        t = pq.read_table(f, columns=["conv_id", "turn_idx"])
        rows = list(zip(t.column("conv_id").to_pylist(), t.column("turn_idx").to_pylist()))
        assert rows == sorted(rows), f"{f} not key-clustered"
        checked += 1
    assert checked > 0


def test_lookup_many_matches_individual_lookups(spark, tmp_path):
    """Batched point read: one job, union-of-covering-files IO, results
    identical to N single lookups."""
    table, events = _long_key_table(spark, tmp_path)
    apply_changes(events.filter("user_id < 100"), table, batch_id="lo", mode="mor")
    apply_changes(events.filter("user_id >= 100"), table, batch_id="hi", mode="mor")
    probes = [3, 42, 150, 199]
    df = table.lookup_many([{"user_id": p} for p in probes])
    got = {(r["user_id"], r["name"]) for r in df.collect()}
    want = set()
    for p in probes:
        want |= {
            (r["user_id"], r["name"]) for r in table.lookup({"user_id": p}).collect()
        }
    assert got == want == {(p, f"u{p}") for p in probes}
    # IO bound: only covering files are read, fewer than the table total
    snap = table.current()
    total = len(snap.base_files(None)) + len(snap.delta_files(None))
    assert len(df.inputFiles()) < total


def test_lookup_many_validation_and_empty(spark, tmp_path):
    import pytest

    table, events = _long_key_table(spark, tmp_path)
    apply_changes(events, table, batch_id="b0", mode="mor")
    assert table.lookup_many([]).count() == 0
    with pytest.raises(ValueError, match="partition key"):
        table.lookup_many([{"name": "u1"}])
    with pytest.raises(ValueError, match="same key columns"):
        table.lookup_many([{"user_id": 1}, {"user_id": 2, "name": "x"}])
    # missing keys simply return no rows
    assert table.lookup_many([{"user_id": 10_000}]).count() == 0


def test_key_type_widening_cannot_reroute_buckets(spark, tmp_path):
    """xxhash64 is width-sensitive: if an upstream widens the key column
    int->long, (a) the table's stored key type must NOT evolve (bucket
    layout is defined by hashes of the storage type) and (b) the wider
    batch's rows must be routed at the storage type. Before the fix, an
    unrelated long-keyed batch widened the schema and every bucket-pruned
    path went blind: lookup() returned [] for live rows and a
    cross-lane tombstone could be vacuumed into resurrecting its row."""
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from orientdb_neo4j_importer_plugin_spark.functions.xxhash import (
        spark_xxhash64,
    )

    # a key whose int-lane and long-lane buckets differ (id=1 at 8 buckets)
    key = next(
        k
        for k in range(1, 200)
        if spark_xxhash64(k, IntegerType()) % 8 != spark_xxhash64(k, LongType()) % 8
    )
    schema = StructType(
        [
            StructField("id", IntegerType(), False),
            StructField("v", StringType(), True),
        ]
    )
    table = SnapshotTable.create(
        spark, str(tmp_path / "kw"), schema, "id", num_buckets=8, key_columns=["id"]
    )

    def feed(rows, id_type):
        s = StructType(
            [
                StructField("id", id_type, False),
                StructField("v", StringType(), True),
                StructField("op", StringType(), False),
                StructField("lsn", LongType(), False),
            ]
        )
        return spark.createDataFrame(rows, s)

    apply_changes(feed([(key, "orig", "I", 1)], IntegerType()), table, batch_id="b1", mode="mor")
    # unrelated batch arrives with a WIDER key type
    apply_changes(feed([(999, "other", "I", 2)], LongType()), table, batch_id="b2", mode="mor")
    # (a) storage key type pinned
    assert isinstance(table.current().schema["id"].dataType, IntegerType)
    # (b) bucket-pruned lookup still finds the pre-widening row
    got = table.lookup({"id": key}).collect()
    assert [(r["id"], r["v"]) for r in got] == [(key, "orig")]
    # wider-typed row itself is readable and findable
    assert table.lookup({"id": 999}).collect()[0]["v"] == "other"
    # a delete arriving at the wider type lands in the SAME bucket as the
    # live row (compaction folds them; the tombstone can never be stranded)
    apply_changes(feed([(key, None, "D", 3)], LongType()), table, batch_id="b3", mode="mor")
    table.compact()
    assert table.lookup({"id": key}).collect() == []
    assert sorted((r["id"], r["v"]) for r in table.read().collect()) == [(999, "other")]
