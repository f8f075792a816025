"""North-rule packaging evidence: the engine runs under real
``spark-submit --py-files engine.zip`` — a fresh JVM + fresh Python,
package shipped as a zip exactly as a cluster deploy would, CLI driver,
final table state verified against the DuckDB oracle from the outside.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed, write_feed_chunks
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.oracle import (
    reduce_events_duckdb,
    table_matches_oracle,
)

PKG = "orientdb_neo4j_importer_plugin_spark"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """\
import sys
from orientdb_neo4j_importer_plugin_spark.cli import main
sys.exit(main())
"""


def _build_zip(path: str) -> str:
    """Package the engine the way a deploy pipeline would: one zip with the
    package at its root (importable when Spark adds it to sys.path)."""
    src = os.path.join(REPO, PKG)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(src):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.join(PKG, os.path.relpath(full, src))
                zf.write(full, rel)
    return path


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    feed_dir = str(tmp_path / "feed")
    feed = gen_feed(
        spark, n_convs=12, turns_per_conv=8, updates_per_key=2, delete_every=6,
        v2_from_lsn=0,
    )
    write_feed_chunks(feed, feed_dir, chunk_size=150)

    zip_path = _build_zip(str(tmp_path / "engine.zip"))
    driver_path = str(tmp_path / "driver.py")
    with open(driver_path, "w") as fh:
        fh.write(DRIVER)

    table_root = str(tmp_path / "table")
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    # a clean cwd proves the zip (not the repo checkout) provides the package
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            driver_path,
            "--feed-dir", feed_dir,
            "--table", table_root,
            "--checkpoint", str(tmp_path / "ckpt"),
            "--mode", "mor",
            "--num-buckets", "8",
            "--log-level", "ERROR",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),
        env=env,
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-3000:]}"
    metrics_line = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ][-1]
    metrics = json.loads(metrics_line)
    assert metrics["events_in"] > 0
    assert metrics["status"] == "FINISHED"

    # outside-in verification: read what the submitted job wrote
    table = SnapshotTable.load(spark, table_root)
    got = [
        tuple(r)
        for r in table.read()
        .orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
        .collect()
    ]
    want = [
        tuple(r)
        for r in reduce_events_duckdb(f"{feed_dir}/*.parquet", has_tool=True).fetchall()
    ]
    ok, msg = table_matches_oracle(got, want)
    assert ok, msg
