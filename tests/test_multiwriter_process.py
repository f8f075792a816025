"""TWO OS PROCESSES writing the same table concurrently — proves the
exclusive-link version claim and the metadata rebase arbitrate real
processes, not just interleaved calls in one interpreter (which
tests/test_concurrency.py covers). Each writer applies its half of the
feed as MOR batches; retries happen inside _commit_retry wherever the
pointer races. Afterwards: every batch id is in the ledger exactly once,
versions form an unbroken parent chain, and the merged state equals the
independent DuckDB oracle over the whole feed."""

import os
import subprocess
import sys
import textwrap

from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed, write_feed_chunks
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.oracle import (
    reduce_events_duckdb,
    table_matches_oracle,
)
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS_V1

WRITER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, "/root/repo")
    from orientdb_neo4j_importer_plugin_spark.session import get_spark
    from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
    from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes

    root, feed_dir, tag, lo, hi, n_batches = (
        sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]),
        int(sys.argv[5]), int(sys.argv[6]),
    )
    spark = get_spark(master="local[2]", app_name=f"writer-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    table = SnapshotTable.load(spark, root)
    full = spark.read.parquet(feed_dir).filter(f"lsn >= {lo} and lsn < {hi}")
    step = max((hi - lo) // n_batches, 1)
    for i in range(n_batches):
        b_lo, b_hi = lo + i * step, (lo + (i + 1) * step) if i < n_batches - 1 else hi
        res = apply_changes(
            full.filter(f"lsn >= {b_lo} and lsn < {b_hi}"),
            table, batch_id=f"{tag}-{i}", mode="mor",
        )
        print(f"{tag}-{i} -> v{res.snapshot_version}", flush=True)
    spark.stop()
    """
)


def test_two_process_writers_converge(spark, tmp_path):
    feed = gen_feed(
        spark, n_convs=12, turns_per_conv=6, updates_per_key=2, delete_every=7
    )
    feed_dir = str(tmp_path / "feed")
    write_feed_chunks(feed, feed_dir)
    # lsn is NOT a dense row index (updates/deletes ride higher lsns):
    # split by the actual span so every event lands in exactly one writer
    n = feed.agg({"lsn": "max"}).collect()[0][0] + 1
    mid = n // 2
    root = str(tmp_path / "table")
    SnapshotTable.create(spark, root, TRANSCRIPTS_V1, "conv_id", num_buckets=8)
    script = str(tmp_path / "writer.py")
    with open(script, "w") as fh:
        fh.write(WRITER)
    procs = [
        subprocess.Popen(
            [sys.executable, script, root, feed_dir, tag, str(lo), str(hi), "4"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd="/root/repo",
        )
        for tag, lo, hi in [("wa", 0, mid), ("wb", mid, n)]
    ]
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]

    table = SnapshotTable.load(spark, root)
    snap = table.current()
    # every batch committed exactly once
    expect = {f"wa-{i}" for i in range(4)} | {f"wb-{i}" for i in range(4)}
    assert set(snap.ledger) == expect
    assert snap.version == 8  # 8 commits, no version skipped or clobbered
    # unbroken parent chain back to v0
    v, seen = snap.version, []
    while v is not None and v > 0:
        s = table.snapshot_at(v)
        seen.append(v)
        v = s.parent
    assert seen == list(range(8, 0, -1))
    # merged state equals the independent oracle over the whole feed
    got = [
        tuple(r)
        for r in table.read().orderBy("conv_id", "turn_idx")
        .select("conv_id", "turn_idx", "role", "text", "ts").collect()
    ]
    ora = [
        tuple(r)
        for r in reduce_events_duckdb(f"{feed_dir}/*.parquet", has_tool=False).fetchall()
    ]
    ok, msg = table_matches_oracle(got, ora)
    assert ok, msg
