"""Incremental materialized-view maintenance: keep a derived per-key
aggregate table in sync with a source `SnapshotTable` at O(changed keys)
per refresh — never O(source).

The pattern is delta-driven recompute: a refresh diffs the source's
immutable file set since the last processed version (pure metadata + a
key-column scan of the files added AND removed in the window — removal-only
commits like rollbacks and tombstone vacuums change state too), reduces it
to the set of AFFECTED keys, recomputes the
aggregate for exactly those keys from a bucket-pruned read of the source,
and MERGEs the results into the target (keys whose live rows vanished
become deletes). Recomputing affected keys — rather than algebraically
patching the old aggregate — is what makes the view correct under
updates, deletes, out-of-order arrival, and COW rewrite noise: the
refresh is a pure function of source state, so replaying it is idempotent
(and the target's batch ledger makes re-refresh of the same source
version a committed no-op).

Cost model at 10^10 rows: candidates = O(files committed since last
refresh); recompute = O(touched source buckets) read + one aggregate;
target MERGE = O(affected keys). Lineage records the source version, so
`refresh()` resumes from wherever the last one left off — the same
contract as the CDC apply path itself.

Reference analogue: the plugin derives secondary structures (indexes)
from the imported data in a post-pass (``ONeo4jImporter.java`` import
phases); here the derived structure stays continuously consistent.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .table import SnapshotTable, bucket_expr_for


class IncrementalView:
    """Maintains `target` = agg_fn(live rows of `source`), keyed by
    `key_col`, refreshed incrementally from the source's commit log.

    agg_fn: DataFrame (source live rows, possibly a pruned subset) ->
    DataFrame with exactly one row per `key_col` value present, whose
    columns match the target schema's payload. It must be a PER-KEY
    function: the rows for one key fully determine that key's output
    (true for any groupBy(key) aggregate).
    """

    def __init__(
        self,
        source: SnapshotTable,
        target: SnapshotTable,
        key_col: str,
        agg_fn: Callable[[DataFrame], DataFrame],
    ):
        if target.current().partition_key != key_col:
            raise ValueError(
                f"target must be partitioned by {key_col!r} "
                f"(got {target.current().partition_key!r})"
            )
        src_pk = source.current().partition_key
        if src_pk != key_col:
            # refresh prunes source buckets by hashing key_col with the
            # SOURCE's bucket expression, which is defined on its partition
            # key — a mismatch would fail deep inside the first refresh
            # with an unresolved-column error, so reject it here instead
            raise ValueError(
                f"view key {key_col!r} must equal the source's partition "
                f"key (got {src_pk!r}) — per-key aggregates over a "
                "non-partition key cannot be bucket-pruned"
            )
        self.source = source
        self.target = target
        self.key_col = key_col
        self.agg_fn = agg_fn

    def last_refreshed_version(self) -> int:
        """Source version covered by the newest refresh commit (0 = never).
        Rides target lineage, so it survives restarts and is committed
        atomically with the refreshed data."""
        for entry in reversed(self.target.current().lineage):
            v = entry.get("mv_source_version")
            if v is not None:
                return int(v)
        return 0

    def refresh(self, mode: str = "cow") -> dict[str, Any]:
        """Advance the view to the source's current version. Returns a
        summary dict (source_version, affected_keys, skipped)."""
        from_v = self.last_refreshed_version()
        src_snap = self.source.current()
        cur_v = src_snap.version
        if cur_v <= from_v:
            return {"source_version": from_v, "affected_keys": 0, "skipped": True}

        # 1. affected keys: keys of files ADDED since from_v (writes, COW
        #    rewrites — tombstones included: a delete must retract from the
        #    view) UNIONED with keys of files REMOVED (rollbacks, tombstone
        #    vacuums): a removal-only commit adds no files, so an
        #    added-files-only diff (changes_since) would silently keep the
        #    vanished keys' stale aggregates while the watermark advances
        #    past the commit — permanently. changed_keys_since sees both
        #    sides, exactly like SnapshotTable.changelog's candidate set.
        #    Persisted: reused by the bucket collect, the left_semi prune,
        #    and the events join — without the cache each action would
        #    re-scan and re-distinct the whole changed-file set.
        affected = (
            self.source.changed_keys_since(from_v)
            .select(self.key_col)
            .distinct()
            .persist()
        )

        # 2. bucket-pruned recompute of exactly those keys' live state
        buckets = [
            r.b
            for r in affected.select(
                bucket_expr_for(src_snap).alias("b")
            ).distinct().collect()
        ]
        live = self.source.read_buckets(buckets, snapshot=src_snap)
        pruned = live.join(F.broadcast(affected), on=self.key_col, how="left_semi")
        aggs = self.agg_fn(pruned)

        # 3. MERGE: recomputed rows upsert; affected keys with no live rows
        #    any more are deletes. lsn = source version: monotone across
        #    refreshes, so target LWW orders refreshes correctly.
        payload = [c for c in self.target.current().schema.names if c != self.key_col]
        missing = [c for c in payload if c not in aggs.columns]
        if missing:
            raise ValueError(f"agg_fn output lacks target columns {missing}")
        present = aggs.withColumn("__present", F.lit(True))
        events = (
            affected.join(present, on=self.key_col, how="left")
            .select(
                F.lit(cur_v).cast("long").alias("lsn"),
                F.when(F.col("__present").isNull(), F.lit("D"))
                .otherwise(F.lit("U"))
                .alias("op"),
                F.col(self.key_col),
                *[F.col(c) for c in payload],
            )
        )
        # imported here, not at module top: cdc.apply itself imports the
        # lake package, so a module-level import would cycle whichever
        # package loads first
        from ..cdc.apply import apply_changes

        try:
            res = apply_changes(
                events,
                self.target,
                batch_id=f"mv-refresh-{cur_v}",
                mode=mode,
                lineage_extra={"mv_source_version": cur_v},
            )
        finally:
            # apply_changes ran every job that reads `affected`
            affected.unpersist(blocking=False)
        return {
            "source_version": cur_v,
            "affected_keys": res.keys_changed,
            "skipped": res.skipped_replay,
        }

    def stream(self, checkpoint_dir: str, mode: str = "cow", available_now: bool = True):
        """Continuous maintenance: subscribe to the source's commit log via
        the `lake_cdf` data source and refresh on every micro-batch of new
        versions. Returns the StreamingQuery.

        The cdf stream is used as the *wake-up signal* (its offsets are
        source versions, checkpointed by Spark); each trigger calls
        `refresh()`, which re-reads its own high-watermark from target
        lineage — so duplicate triggers and checkpoint replays are
        harmless (per-version ledger no-ops), and a missed trigger is
        caught up by the next one. Exactly-once composes from both ends.
        """
        from ..streaming.cdf_source import LakeCdfDataSource

        spark = self.target.spark
        spark.dataSource.register(LakeCdfDataSource)
        stream = (
            spark.readStream.format("lake_cdf")
            .option("path", self.source.root)
            .option("startingVersion", self.last_refreshed_version())
            .load()
        )

        def on_batch(batch: DataFrame, batch_id: int) -> None:
            self.refresh(mode=mode)

        writer = (
            stream.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
