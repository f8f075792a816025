"""Feed sources (parquet/json), multimodal plumbing, normalization hook, CLI."""

import json
import subprocess
import sys

from pyspark.sql import functions as F

from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed, write_feed_chunks
from orientdb_neo4j_importer_plugin_spark.functions.normalize import (
    normalize_text_expr,
    normalize_text_udf,
)
from orientdb_neo4j_importer_plugin_spark.schema import CHANGE_EVENT_V1
from orientdb_neo4j_importer_plugin_spark.sources.feed import open_feed_stream, read_feed
from orientdb_neo4j_importer_plugin_spark.sources.multimodal import (
    MEDIA_FEATURES,
    extract_features,
    synth_media,
)


def test_read_feed_json_schema_evolution(spark, tmp_path):
    """v1 json events then v2 json events with `tool`: explicit schema
    null-fills v1 rows (reader-side schema evolution)."""
    feed_v2 = gen_feed(spark, n_convs=2, turns_per_conv=4, v2_from_lsn=4)
    d = str(tmp_path / "jfeed")
    feed_v2.coalesce(1).write.json(d)
    from orientdb_neo4j_importer_plugin_spark.schema import CHANGE_EVENT

    df = read_feed(spark, d, schema=CHANGE_EVENT, fmt="json")
    assert df.count() == 8
    assert df.filter("tool is not null").count() > 0
    assert df.filter("tool is null and lsn < 4").count() == 4


def test_stream_source_parquet(spark, tmp_path):
    feed = gen_feed(spark, n_convs=2, turns_per_conv=4)
    d = str(tmp_path / "pfeed")
    write_feed_chunks(feed, d)
    s = open_feed_stream(spark, d, schema=CHANGE_EVENT_V1, max_files_per_trigger=1)
    assert s.isStreaming


def test_multimodal_feature_extraction(spark):
    media = synth_media(spark, n=48).repartition(4)
    feats = extract_features(media)
    assert feats.schema == MEDIA_FEATURES
    rows = feats.orderBy("media_id").collect()
    assert len(rows) == 48
    # deterministic fake decode: same content -> same dims, within bounds
    assert all(1 <= r["width"] <= 1920 and 1 <= r["height"] <= 1080 for r in rows)
    assert all(r["decoder"] == "stub-sha1" for r in rows)
    again = extract_features(synth_media(spark, n=48)).orderBy("media_id").collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_normalize_udf_matches_expr(spark):
    df = spark.createDataFrame(
        [("  Hello   WORLD  ",), ("a\tb\nc",), (None,), ("Ünïcode  TEXT",)],
        ["t"],
    )
    got = df.select(
        normalize_text_expr("t").alias("a"), normalize_text_udf("t").alias("b")
    ).collect()
    for r in got:
        assert r["a"] == r["b"]


def test_cli_end_to_end(spark, tmp_path):
    """Drive the CLI as a subprocess — the user-facing entry point."""
    feed = gen_feed(spark, n_convs=3, turns_per_conv=5, updates_per_key=1)
    feed_dir = str(tmp_path / "feed")
    write_feed_chunks(feed, feed_dir)
    table_root = str(tmp_path / "table")
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "orientdb_neo4j_importer_plugin_spark.cli",
            "--feed-dir", feed_dir,
            "--table", table_root,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--master", "local[4]",
            "--schema", "v1",
            "--mode", "mor",
            "--compact-every", "2",
            "--status-path", str(tmp_path / "status.json"),
            "--overwrite",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    metrics = json.loads(out.stdout.strip().splitlines()[-1])
    assert metrics["status"] == "FINISHED"
    assert metrics["events_in"] == feed.count()
    # the produced table is readable in-process
    from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable

    t = SnapshotTable.load(spark, table_root)
    assert t.read().count() == 15


# --- JSON-lines WAL source with schema inference -----------------------------


def test_jsonl_feed_inference_and_apply(spark, tmp_path):
    """infer_feed_schema: sample-one-value typing (lsn pinned LONG, op
    STRING, ints LONG, temporal stays STRING), and the inferred-schema read
    converges to the same table state as the parquet feed."""
    import json as _json
    import os

    from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
    from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed
    from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
    from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS_V1
    from orientdb_neo4j_importer_plugin_spark.sources.feed import (
        infer_feed_schema,
        read_feed,
    )

    feed = gen_feed(spark, n_convs=6, turns_per_conv=4, updates_per_key=1)
    rows = [r.asDict() for r in feed.collect()]
    jdir = tmp_path / "jsonl"
    os.makedirs(jdir)
    half = len(rows) // 2
    for name, chunk in [("a.jsonl", rows[:half]), ("b.jsonl", rows[half:])]:
        with open(jdir / name, "w") as fh:
            for r in chunk:
                r = dict(r)
                r["ts"] = r["ts"].isoformat()
                fh.write(_json.dumps(r) + "\n")

    schema = infer_feed_schema(spark, str(jdir))
    by_name = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert by_name["lsn"] == "bigint" and by_name["op"] == "string"
    assert by_name["turn_idx"] == "bigint"  # JSON int -> LONG
    assert by_name["ts"] == "string"  # ISO string stays STRING (cast at apply)

    jfeed = read_feed(spark, str(jdir), schema=None, fmt="jsonl")
    t_json = SnapshotTable.create(
        spark, str(tmp_path / "tj"), TRANSCRIPTS_V1, "conv_id", num_buckets=4
    )
    t_parq = SnapshotTable.create(
        spark, str(tmp_path / "tp"), TRANSCRIPTS_V1, "conv_id", num_buckets=4
    )
    apply_changes(jfeed, t_json, batch_id="j0")
    apply_changes(feed, t_parq, batch_id="p0")
    cols = ["conv_id", "turn_idx", "role", "text", "ts"]
    a = [tuple(r) for r in t_json.read().orderBy(*cols[:2]).select(*cols).collect()]
    b = [tuple(r) for r in t_parq.read().orderBy(*cols[:2]).select(*cols).collect()]
    assert a == b and len(a) > 0


def test_cli_jsonl_inferred_schema(spark, tmp_path):
    """CLI end-to-end on a JSONL WAL with --schema infer: the stream reads
    through the sampled schema and converges to the same state as the
    typed parquet path."""
    import json as _json
    import os

    from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable

    feed = gen_feed(spark, n_convs=3, turns_per_conv=5, updates_per_key=1)
    jdir = tmp_path / "jsonl"
    os.makedirs(jdir)
    with open(jdir / "wal.jsonl", "w") as fh:
        for r in feed.collect():
            d = r.asDict()
            d["ts"] = d["ts"].isoformat()
            fh.write(_json.dumps(d) + "\n")
    table_root = str(tmp_path / "table")
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "orientdb_neo4j_importer_plugin_spark.cli",
            "--feed-dir", str(jdir),
            "--table", table_root,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--master", "local[4]",
            "--format", "jsonl",
            "--schema", "infer",
            "--mode", "mor",
            "--overwrite",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    metrics = json.loads(out.stdout.strip().splitlines()[-1])
    assert metrics["status"] == "FINISHED"
    assert metrics["events_in"] == feed.count()
    table = SnapshotTable.load(spark, table_root)
    got = {(r.conv_id, r.turn_idx) for r in table.read().collect()}
    assert len(got) > 0
