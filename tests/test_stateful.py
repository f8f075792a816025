"""Custom stateful streaming operator (applyInPandasWithState)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed, write_feed_chunks
from orientdb_neo4j_importer_plugin_spark.schema import CHANGE_EVENT_V1
from orientdb_neo4j_importer_plugin_spark.streaming.stateful import (
    conversation_progress_batch,
    run_progress_stream,
)


def test_stateful_progress_matches_batch(spark, tmp_path):
    feed = gen_feed(
        spark, n_convs=5, turns_per_conv=6, updates_per_key=2, delete_every=7
    )
    feed_dir = str(tmp_path / "feed")
    write_feed_chunks(feed, feed_dir, chunk_size=40)
    out_dir = str(tmp_path / "out")
    run_progress_stream(
        spark,
        feed_dir,
        str(tmp_path / "ckpt"),
        CHANGE_EVENT_V1,
        out_dir,
        max_files_per_trigger=1,
    )
    updates = spark.read.parquet(out_dir)
    # multiple updates per conv across batches -> streaming state really ran
    assert updates.count() > updates.select("conv_id").distinct().count()
    # final state per conv (the update with the highest n_events) == batch agg
    w = Window.partitionBy("conv_id").orderBy(F.desc("n_events"))
    final = (
        updates.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
        .orderBy("conv_id")
    )
    expected = conversation_progress_batch(feed).orderBy("conv_id")
    got = [tuple(r) for r in final.collect()]
    want = [tuple(r) for r in expected.collect()]
    assert got == want
