"""Within-run A/B + profile of the MOR commit path (VERDICT r2 items 2/3).

Answers two questions with numbers from ONE process (this host drifts
25-35% across runs, so only within-run comparisons are meaningful):

1. How much of a MOR apply's wall time is the per-commit METADATA path —
   parquet footer stats, manifest shard writes, snapshot claim/CAS — that
   round-2's protocol hardening (fencing, manifest shards, conflict
   anchoring) and round-3's key-stats collection added to? If that share
   is small, the r1->r2 bench drift on the MOR family is bounded as host
   noise, not a real regression.
2. What does parallelizing materialize_changelog buy at the same version
   count (max_workers=1 vs 8, fresh tables, same input)?

Usage: python bench_commit_profile.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.feedgen import feed_from_tpch
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.lake import table as table_mod
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS
from orientdb_neo4j_importer_plugin_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_BATCHES = 8


class MetaTimer:
    """Times the driver-side metadata sections of every commit by wrapping
    the three methods that constitute them. Wall, not CPU: these sections
    serialize the commit, so wall is what the apply pays."""

    def __init__(self):
        self.spent = {"footer_stats": 0.0, "write_manifests": 0.0, "write_snapshot": 0.0}
        self._orig = {}

    def _wrap(self, owner, name, bucket, static=False):
        orig = getattr(owner, name)
        # keep the ORIGINAL descriptor (staticmethod wrapper included) for
        # uninstall — getattr unwraps it, and restoring the bare function
        # would turn later instance calls into self-passing ones
        self._orig[(owner, name)] = owner.__dict__[name]
        timer = self

        if static:
            fn = orig  # class-level access to a staticmethod is the bare fn

            def timed(*a, **kw):
                t0 = time.perf_counter()
                try:
                    return fn(*a, **kw)
                finally:
                    timer.spent[bucket] += time.perf_counter() - t0

            setattr(owner, name, staticmethod(timed))
        else:

            def timed(*a, **kw):
                t0 = time.perf_counter()
                try:
                    return orig(*a, **kw)
                finally:
                    timer.spent[bucket] += time.perf_counter() - t0

            setattr(owner, name, timed)

    def install(self):
        self._wrap(table_mod.SnapshotTable, "_footer_stats", "footer_stats", static=True)
        self._wrap(table_mod.SnapshotTable, "_write_manifests", "write_manifests")
        self._wrap(table_mod.SnapshotTable, "_write_snapshot", "write_snapshot")
        return self

    def uninstall(self):
        for (owner, name), orig in self._orig.items():
            setattr(owner, name, orig)


def mor_apply(spark, wal, root):
    feed = spark.read.parquet(wal)
    table = SnapshotTable.create(
        spark, root, TRANSCRIPTS, "conv_id", num_buckets=64, overwrite=True
    )
    splits = [
        feed.filter(f"pmod(lsn, {N_BATCHES}) = {i}") for i in range(N_BATCHES)
    ]
    t0 = time.perf_counter()
    for i, b in enumerate(splits):
        apply_changes(b, table, batch_id=f"p-{i}", mode="mor", collect_stats=False)
    return time.perf_counter() - t0, table


def main():
    spark = get_spark(master=f"local[{CPUS}]", app_name="commit-profile")
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="bench_profile_")
    wal = os.path.join(d, "wal")
    feed_from_tpch(spark, SF_DIR, parallelism=CPUS * 2).write.parquet(wal)
    n_events = spark.read.parquet(wal).count()

    # warmup apply (codegen, JVM) — untimed
    mor_apply(spark, wal, os.path.join(d, "warm"))

    # A: plain apply, B: apply with metadata sections timed (same run)
    wall_a, _ = mor_apply(spark, wal, os.path.join(d, "ta"))
    timer = MetaTimer().install()
    try:
        wall_b, table_b = mor_apply(spark, wal, os.path.join(d, "tb"))
    finally:
        timer.uninstall()
    meta = {k: round(v, 3) for k, v in timer.spent.items()}
    meta_total = round(sum(timer.spent.values()), 3)

    # materialize_changelog: serial vs thread-parallel vs single-union-job
    # on IDENTICAL fresh tables (strategies pinned explicitly; 'auto'
    # resolves to threads — union measured slower, see BENCH/BASELINE.md)
    _, t_serial = mor_apply(spark, wal, os.path.join(d, "ms"))
    _, t_par = mor_apply(spark, wal, os.path.join(d, "mp"))
    _, t_uni = mor_apply(spark, wal, os.path.join(d, "mu"))
    t0 = time.perf_counter()
    n1 = t_serial.materialize_changelog(max_workers=1, strategy="threads")
    serial_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    n8 = t_par.materialize_changelog(max_workers=8, strategy="threads")
    par_sec = time.perf_counter() - t0
    t0 = time.perf_counter()
    nu = t_uni.materialize_changelog(max_workers=8, strategy="union")
    union_sec = time.perf_counter() - t0
    assert n1 == n8 == nu, (n1, n8, nu)

    out = {
        "metric": "MOR commit-path profile (within-run)",
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "events": n_events,
        "mor_apply_wall_plain_sec": round(wall_a, 3),
        "mor_apply_wall_instrumented_sec": round(wall_b, 3),
        "commit_metadata_sec": meta_total,
        "commit_metadata_breakdown": meta,
        "commit_metadata_share_pct": round(100 * meta_total / wall_b, 1),
        "materialize_versions": n1,
        "materialize_serial_sec": round(serial_sec, 3),
        "materialize_parallel8_sec": round(par_sec, 3),
        "materialize_union_sec": round(union_sec, 3),
        "materialize_speedup": round(serial_sec / par_sec, 2),
        "materialize_union_speedup": round(serial_sec / union_sec, 2),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
