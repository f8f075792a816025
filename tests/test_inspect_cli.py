"""inspect_cli: JVM-free metadata reads must agree with the DataFrame
inspect surface and return in well under JVM startup time."""

import json
import subprocess
import sys
import time

from pyspark.sql import functions as F

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS


def _mk(spark, tmp_path):
    table = SnapshotTable.create(
        spark, str(tmp_path / "ic"), TRANSCRIPTS, "conv_id", num_buckets=4
    )
    events = spark.range(90).select(
        F.col("id").alias("lsn"),
        F.lit("I").alias("op"),
        F.concat(F.lit("c"), (F.col("id") % 30).cast("string")).alias("conv_id"),
        (F.col("id") % 3).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.current_timestamp().alias("ts"),
    )
    for i in range(3):
        apply_changes(
            events.filter(f"lsn >= {i * 30} and lsn < {(i + 1) * 30}"),
            table, batch_id=f"b{i}", mode="mor",
        )
    return table


def _cli(root, *argv):
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-m",
         "orientdb_neo4j_importer_plugin_spark.inspect_cli",
         "--table", root, *argv],
        capture_output=True, text=True, timeout=60, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert time.time() - t0 < 15  # metadata-only: no JVM spin-up
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_inspect_cli_matches_dataframe_surface(spark, tmp_path):
    table = _mk(spark, tmp_path)
    table.create_tag("rc")
    head = table.current().version

    snaps = _cli(table.root, "snapshots")["snapshots"]
    df_snaps = {r["version"]: r for r in table.snapshots().collect()}
    assert {s["version"] for s in snaps} == set(df_snaps)
    for s in snaps:
        d = df_snaps[s["version"]]
        assert s["is_current"] == d["is_current"]
        assert s["n_batches"] == d["n_batches"]
        assert s["last_batch_id"] == d["last_batch_id"]
    cur = next(s for s in snaps if s["is_current"])
    assert cur["version"] == head and cur["pinned_by"] == ["tag:rc"]

    parts = _cli(table.root, "partitions")["partitions"]
    df_parts = {r["bucket"]: r for r in table.partitions().collect()}
    assert {p["bucket"] for p in parts} == set(df_parts)
    for p in parts:
        d = df_parts[p["bucket"]]
        assert p["n_base_files"] == d["n_base_files"]
        assert p["n_delta_files"] == d["n_delta_files"]
        assert p["rows"] == d["rows"]
        assert p["size_bytes"] == d["size_bytes"]

    b = parts[0]["bucket"]
    files = _cli(table.root, "files", "--bucket", str(b))["files"]
    df_files = [
        r for r in table.files().collect() if r["bucket"] == b
    ]
    assert {f["path"] for f in files} == {r["path"] for r in df_files}
    by_path = {r["path"]: r for r in df_files}
    for f in files:
        d = by_path[f["path"]]
        assert f["rows"] == d["rows"] and f["kind"] == d["kind"]
        assert f["lsn_min"] == d["lsn_min"] and f["lsn_max"] == d["lsn_max"]


def test_inspect_cli_time_travel(spark, tmp_path):
    table = _mk(spark, tmp_path)
    v1 = table.current().version
    table.compact()
    old = _cli(table.root, "partitions", "--version", str(v1))
    assert old["version"] == v1
    assert any(p["n_delta_files"] > 0 for p in old["partitions"])
    new = _cli(table.root, "partitions")
    assert all(p["n_delta_files"] == 0 for p in new["partitions"])
