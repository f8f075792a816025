"""The deployment story end-to-end: the three CLIs (`cli` ingest,
`mirror_cli` replication, `maintain_cli` maintenance) interleaved as
subprocesses against the same table pair, under replication lag.

Each CLI is e2e-tested alone elsewhere; this drives their INTERLEAVING —
specifically the SCALE.md tombstone low-watermark policy: tombstones are
vacuumable only below the lsn every consumer has passed, so a vacuum
issued while the replica lags must retain the tombstones the replica has
not yet applied (or the deletes would be lost to it), and a vacuum issued
after catch-up must never resurrect deleted rows on the replica when the
rewrite flows through the mirror tail.
"""

import json
import subprocess
import sys

from pyspark.sql import functions as F

from orientdb_neo4j_importer_plugin_spark.cdc.verify import verify_replica
from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed, write_feed_chunks
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable

PKG = "orientdb_neo4j_importer_plugin_spark"


def _run(module: str, *args: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-m", f"{PKG}.{module}", *args],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )
    assert out.returncode == 0, f"{module} failed:\n{out.stderr[-3000:]}"
    return json.loads(out.stdout.strip().splitlines()[-1])


def _tombstones(table: SnapshotTable) -> int:
    return (
        table.read(raw=True)
        .filter(F.coalesce(F.col("__deleted"), F.lit(False)))
        .count()
    )


def _live(table: SnapshotTable):
    return {
        (r["conv_id"], r["turn_idx"]) for r in table.read().collect()
    }


def test_ops_trio_interleaved_with_lagged_replica(spark, tmp_path):
    feed = gen_feed(
        spark, n_convs=6, turns_per_conv=5, updates_per_key=2, delete_every=4
    ).persist()
    max_lsn = feed.agg(F.max("lsn")).first()[0]
    deleted_keys = {
        (r["conv_id"], r["turn_idx"])
        for r in feed.filter("op = 'D'").select("conv_id", "turn_idx").collect()
    }
    assert deleted_keys, "fixture must contain deletes"
    feed_dir = str(tmp_path / "feed")
    primary_root = str(tmp_path / "primary")
    replica_root = str(tmp_path / "replica")
    ck_ingest = str(tmp_path / "ck_ingest")
    ck_mirror = str(tmp_path / "ck_mirror")

    def ingest():
        return _run(
            "cli", "--feed-dir", feed_dir, "--table", primary_root,
            "--checkpoint", ck_ingest, "--master", "local[4]",
            "--mode", "mor", "--num-buckets", "8", "--schema", "v1",
        )

    def mirror():
        return _run(
            "mirror_cli", "--source", primary_root, "--replica", replica_root,
            "--checkpoint", ck_mirror, "--master", "local[4]", "--mode", "mor",
        )

    def maintain(root: str, *extra: str):
        return _run(
            "maintain_cli", "--table", root, "--master", "local[4]", *extra
        )

    # phase 1: ingest the insert prefix (lsn < 30), replicate it
    write_feed_chunks(feed.filter("lsn < 30"), feed_dir, chunk_size=30)
    ingest()
    assert mirror()["replication_lag"] == 0
    primary = SnapshotTable.load(spark, primary_root)
    replica = SnapshotTable.load(spark, replica_root)
    assert verify_replica(primary, replica).ok

    # phase 2: the rest of the feed (updates + deletes, lsn >= 30) lands on
    # the primary while the replica LAGS
    write_feed_chunks(feed.filter("lsn >= 30"), feed_dir, chunk_size=30)
    ingest()
    assert _tombstones(primary) == len(deleted_keys)
    assert deleted_keys <= _live(replica)  # replica hasn't seen the deletes

    # phase 3: maintenance on the lagged pair — the low-watermark is the
    # replica's consumed position (lsn 30), so the new tombstones
    # (lsn > 30) must all be RETAINED by this vacuum
    s = maintain(primary_root, "--compact-if-deltas", "1",
                 "--tombstone-below-lsn", "30")
    assert not s.get("tombstones_vacuumed")
    assert _tombstones(primary) == len(deleted_keys)

    # phase 4: the replica catches up across ingest + compaction commits;
    # the retained tombstones deliver the deletes
    assert mirror()["replication_lag"] == 0
    assert verify_replica(primary, replica).ok
    assert _live(replica).isdisjoint(deleted_keys)

    # phase 5: every consumer has passed max_lsn — tombstones are now
    # expirable on the primary; the vacuum rewrite flows through the
    # mirror tail WITHOUT resurrecting deleted rows on the replica
    s = maintain(primary_root, "--tombstone-below-lsn", str(max_lsn + 1))
    assert s.get("tombstones_vacuumed")
    assert _tombstones(primary) == 0
    assert mirror()["replication_lag"] == 0
    assert verify_replica(primary, replica).ok
    assert _live(replica).isdisjoint(deleted_keys)

    # phase 6: replica-side maintenance completes the trio; content stable
    maintain(replica_root, "--tombstone-below-lsn", str(max_lsn + 1))
    assert _tombstones(replica) == 0
    rep = verify_replica(primary, replica)
    assert rep.ok and rep.content_match
    feed.unpersist()
