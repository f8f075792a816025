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
