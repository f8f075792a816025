"""Job-control lifecycle through the CdcJob wrapper — the HTTP job-handle
analogue (ONeo4jImporterJob.java:74,102,118-136): STARTED -> RUNNING ->
FINISHED, poll-able status JSON with cfg + metrics + captured log.
"""

import pytest

from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed, write_feed_chunks
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.schema import CHANGE_EVENT_V1, TRANSCRIPTS_V1
from orientdb_neo4j_importer_plugin_spark.streaming import CdcJob, CdcStreamRunner


def test_job_lifecycle(spark, tmp_path):
    feed = gen_feed(spark, n_convs=4, turns_per_conv=6, updates_per_key=1)
    feed_dir = str(tmp_path / "feed")
    write_feed_chunks(feed, feed_dir, chunk_size=48)
    table = SnapshotTable.create(
        spark, str(tmp_path / "table"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    runner = CdcStreamRunner(
        spark,
        feed_dir,
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        event_schema=CHANGE_EVENT_V1,
    )
    job = CdcJob(runner)
    assert job.status()["status"] == "STARTED"

    job.start()
    mid = job.status()
    assert mid["status"] in ("STARTED", "RUNNING")
    assert mid["cfg"]["feed_dir"] == feed_dir

    final = job.await_completion(timeout_sec=300)
    assert final["status"] == "FINISHED"
    assert final["metrics"]["batches"] >= 1
    assert final["metrics"]["events_in"] > 0
    assert "job STARTED" in final["log"]
    assert "job FINISHED" in final["log"]
    assert "batch " in final["log"]  # per-batch progress captured
    assert table.read().count() > 0

    with pytest.raises(RuntimeError):
        job.start()  # a job handle is single-use, like the reference's


def test_job_stop_is_idempotent(spark, tmp_path):
    feed = gen_feed(spark, n_convs=2, turns_per_conv=4, updates_per_key=0)
    feed_dir = str(tmp_path / "feed2")
    write_feed_chunks(feed, feed_dir, chunk_size=100)
    table = SnapshotTable.create(
        spark, str(tmp_path / "table2"), TRANSCRIPTS_V1, "conv_id", num_buckets=4
    )
    runner = CdcStreamRunner(
        spark,
        feed_dir,
        table,
        checkpoint_dir=str(tmp_path / "ckpt2"),
        event_schema=CHANGE_EVENT_V1,
    )
    job = CdcJob(runner).start()
    job.await_completion(timeout_sec=300)
    job.stop()
    job.stop()
    assert job.status()["status"] == "FINISHED"
