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

from .table import Snapshot, SnapshotTable, bucket_expr_for


def _pruned_live(
    source: SnapshotTable, snap: Snapshot, affected: DataFrame, key_col: str
) -> DataFrame:
    """Live rows of `source` (at `snap`) restricted to the affected keys:
    a bucket-pruned read (only buckets the affected keys hash into) then a
    broadcast left-semi down to exactly those keys. Cost is O(touched
    buckets) I/O regardless of table size."""
    buckets = [
        r.b
        for r in affected.select(bucket_expr_for(snap).alias("b"))
        .distinct()
        .collect()
    ]
    live = source.read_buckets(buckets, snapshot=snap)
    return live.join(F.broadcast(affected), on=key_col, how="left_semi")


def _merge_affected(
    target: SnapshotTable,
    affected: DataFrame,
    out_rows: DataFrame,
    key_col: str,
    lsn: int,
    batch_id: str,
    lineage_extra: dict[str, Any],
    mode: str,
):
    """MERGE a refresh's recomputed per-key rows into the view target:
    affected keys present in `out_rows` upsert, affected keys absent become
    deletes (their live contribution vanished). `lsn` must be monotone
    across refreshes so target LWW orders them correctly."""
    payload = [c for c in target.current().schema.names if c != key_col]
    missing = [c for c in payload if c not in out_rows.columns]
    if missing:
        raise ValueError(f"view output lacks target columns {missing}")
    present = out_rows.withColumn("__present", F.lit(True))
    events = affected.join(present, on=key_col, how="left").select(
        F.lit(lsn).cast("long").alias("lsn"),
        F.when(F.col("__present").isNull(), F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col(key_col),
        *[F.col(c) for c in payload],
    )
    # imported here, not at module top: cdc.apply itself imports the lake
    # package, so a module-level import would cycle whichever loads first
    from ..cdc.apply import apply_changes

    return apply_changes(
        events,
        target,
        batch_id=batch_id,
        mode=mode,
        lineage_extra=lineage_extra,
    )


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
        pruned = _pruned_live(self.source, src_snap, affected, self.key_col)
        aggs = self.agg_fn(pruned)

        # 3. MERGE: recomputed rows upsert; affected keys with no live rows
        #    any more are deletes. lsn = source version: monotone across
        #    refreshes, so target LWW orders refreshes correctly.
        try:
            res = _merge_affected(
                self.target,
                affected,
                aggs,
                self.key_col,
                lsn=cur_v,
                batch_id=f"mv-refresh-{cur_v}",
                lineage_extra={"mv_source_version": cur_v},
                mode=mode,
            )
        finally:
            # apply_changes ran every job that reads `affected`
            affected.unpersist(blocking=False)
        return {
            "source_version": cur_v,
            "affected_keys": res.keys_changed,
            "skipped": res.skipped_replay,
        }

    def refresh_from_changes(
        self,
        changes: DataFrame,
        batch_tag: str,
        mode: str = "cow",
        processed_version: int | None = None,
    ) -> dict[str, Any]:
        """Refresh exactly the keys present in a row-level change batch
        (lake_cdf mode=rowlevel): the batch's key column IS the affected
        set — no file-diff planning, no candidate key-scan, no COW-rewrite
        noise — so the consumer does ZERO join/diff work to learn what
        changed. The recompute itself stays a pure function of current
        source state (bucket-pruned to the batch's keys), which keeps it
        correct under out-of-order delivery and concurrent source commits.

        Idempotence rides the target ledger via `batch_tag` (callers
        derive it from the batch's version range, which is deterministic
        across checkpoint replays AND checkpoint resets).

        lsn = the source version the recompute READ. Two batches may
        observe the same version; the resulting LWW tie is harmless
        because both then recomputed identical values from the identical
        state. When the state advanced between batches, the lsn advanced
        with it — monotone where it matters.

        The lineage watermark (`mv_source_version`) advances only to
        `processed_version` — the batch's own max version, NOT the
        (possibly newer) snapshot the recompute read: the read state may
        include versions whose changed keys are outside this batch, and a
        later stream start from the watermark must still deliver them."""
        affected = changes.select(self.key_col).distinct().persist()
        src_snap = self.source.current()
        watermark = (
            src_snap.version
            if processed_version is None
            else min(int(processed_version), src_snap.version)
        )
        pruned = _pruned_live(self.source, src_snap, affected, self.key_col)
        aggs = self.agg_fn(pruned)
        try:
            res = _merge_affected(
                self.target,
                affected,
                aggs,
                self.key_col,
                lsn=src_snap.version,
                batch_id=batch_tag,
                lineage_extra={"mv_source_version": watermark},
                mode=mode,
            )
        finally:
            affected.unpersist(blocking=False)
        return {
            "source_version": watermark,
            "affected_keys": res.keys_changed,
            "skipped": res.skipped_replay,
        }

    def stream(
        self,
        checkpoint_dir: str,
        mode: str = "cow",
        available_now: bool = True,
        rowlevel: bool = False,
    ):
        """Continuous maintenance: subscribe to the source's commit log via
        the `lake_cdf` data source and refresh on every micro-batch of new
        versions. Returns the StreamingQuery.

        rowlevel=False (default): the file-level cdf stream is purely the
        *wake-up signal* (its offsets are source versions, checkpointed by
        Spark); each trigger calls `refresh()`, which re-reads its own
        high-watermark from target lineage — so duplicate triggers and
        checkpoint replays are harmless (per-version ledger no-ops), and a
        missed trigger is caught up by the next one.

        rowlevel=True: subscribes to the MATERIALIZED row-level changelog
        (mode=rowlevel; requires the maintenance job to run
        `materialize_changelog` — the stream waits for it) and derives the
        affected keys directly from the batch rows via
        `refresh_from_changes` — zero consumer-side diff/join work, exact
        keys (no COW-rewrite candidates). Exactly-once composes from the
        checkpoint (version offsets) and the target ledger (version-range
        batch tags), so kill-and-resume converges to the batch-refreshed
        state.
        """
        from ..streaming.cdf_source import LakeCdfDataSource

        spark = self.target.spark
        spark.dataSource.register(LakeCdfDataSource)
        reader = (
            spark.readStream.format("lake_cdf")
            .option("path", self.source.root)
            .option("startingVersion", self.last_refreshed_version())
        )
        if rowlevel:
            reader = reader.option("mode", "rowlevel")
        stream = reader.load()

        if rowlevel:

            def on_batch(batch: DataFrame, batch_id: int) -> None:
                vr = batch.agg(
                    F.min("_commit_version"), F.max("_commit_version")
                ).first()
                if vr[0] is None:
                    return  # empty trigger
                self.refresh_from_changes(
                    batch,
                    batch_tag=f"mv-rl-{vr[0]}-{vr[1]}",
                    mode=mode,
                    processed_version=vr[1],
                )

        else:

            def on_batch(batch: DataFrame, batch_id: int) -> None:
                self.refresh(mode=mode)

        writer = (
            stream.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


class IncrementalJoinView:
    """Maintains `target` = view_fn(live rows of `source_a`, live rows of
    `source_b`), keyed by the equi-join key `key_col`, refreshed
    incrementally from BOTH sources' commit logs — the two-source join
    view (fact x changing dimension, or fact x fact).

    view_fn: (a_rows, b_rows) -> DataFrame with AT MOST one row per
    `key_col` value, whose columns cover the target schema's payload. It
    must be per-key: the two sources' rows for one key fully determine
    that key's output (true for any equi-join on `key_col` followed by a
    groupBy(key_col) aggregate, whatever the join type). A key in the
    affected set that view_fn emits no row for is DELETED from the view —
    which is how inner-join semantics retract keys that lost their match.

    Affected-key propagation: a commit to either source changes the view
    only at the join keys its changed files touch, so
    affected = changed_keys(a since watermark_a) ∪ changed_keys(b since
    watermark_b). Both sources must be partitioned by `key_col`: the
    recompute then reads only the affected keys' buckets on EACH side and
    the join itself co-locates per bucket — refresh cost is O(changed
    keys' data), never O(either table). (A join key that is not both
    sources' partition key would force a full-table scan per refresh to
    find matching rows — rejected up front.)

    Each source carries its own high-watermark in target lineage
    (`mv_src_a_version` / `mv_src_b_version`), committed atomically with
    the refreshed data, so refresh resumes per-source after restarts and
    replays are ledger no-ops.

    Reference analogue: the plugin's only join is the per-edge endpoint
    index lookup joining the relationship feed to imported vertices
    (``OGraphCommands.java:109-119``, getVertexFromKey); here the joined
    derivation is a continuously-maintained table rather than a per-record
    probe loop.
    """

    def __init__(
        self,
        source_a: SnapshotTable,
        source_b: SnapshotTable,
        target: SnapshotTable,
        key_col: str,
        view_fn: Callable[[DataFrame, DataFrame], DataFrame],
    ):
        if target.current().partition_key != key_col:
            raise ValueError(
                f"target must be partitioned by {key_col!r} "
                f"(got {target.current().partition_key!r})"
            )
        for name, src in (("source_a", source_a), ("source_b", source_b)):
            pk = src.current().partition_key
            if pk != key_col:
                raise ValueError(
                    f"join key {key_col!r} must equal {name}'s partition "
                    f"key (got {pk!r}) — a non-co-partitioned join side "
                    "cannot be bucket-pruned to the affected keys"
                )
        self.source_a = source_a
        self.source_b = source_b
        self.target = target
        self.key_col = key_col
        self.view_fn = view_fn

    def last_refreshed_versions(self) -> tuple[int, int]:
        """(source_a version, source_b version) covered by the newest
        refresh commit; (0, 0) = never refreshed."""
        for entry in reversed(self.target.current().lineage):
            va = entry.get("mv_src_a_version")
            vb = entry.get("mv_src_b_version")
            if va is not None and vb is not None:
                return int(va), int(vb)
        return 0, 0

    def refresh(self, mode: str = "cow") -> dict[str, Any]:
        """Advance the view to both sources' current versions. Returns a
        summary dict (src_a_version, src_b_version, affected_keys,
        skipped)."""
        from_a, from_b = self.last_refreshed_versions()
        snap_a = self.source_a.current()
        snap_b = self.source_b.current()
        cur_a, cur_b = snap_a.version, snap_b.version
        if cur_a <= from_a and cur_b <= from_b:
            return {
                "src_a_version": from_a,
                "src_b_version": from_b,
                "affected_keys": 0,
                "skipped": True,
            }

        # 1. affected join keys = keys of files added OR removed in either
        #    source's window (changed_keys_since sees both sides; see
        #    IncrementalView.refresh step 1 for why removed files matter).
        parts = []
        if cur_a > from_a:
            parts.append(
                self.source_a.changed_keys_since(from_a, cur_a).select(self.key_col)
            )
        if cur_b > from_b:
            parts.append(
                self.source_b.changed_keys_since(from_b, cur_b).select(self.key_col)
            )
        affected = parts[0]
        for p in parts[1:]:
            affected = affected.unionByName(p)
        affected = affected.distinct().persist()

        # 2. bucket-pruned recompute of those keys' joined live state: each
        #    side reads only the buckets the affected keys hash into
        a_rows = _pruned_live(self.source_a, snap_a, affected, self.key_col)
        b_rows = _pruned_live(self.source_b, snap_b, affected, self.key_col)
        out = self.view_fn(a_rows, b_rows)

        # 3. MERGE. lsn = cur_a + cur_b: strictly increasing across
        #    refreshes (each refresh advances at least one source), so
        #    target LWW orders them correctly.
        try:
            res = _merge_affected(
                self.target,
                affected,
                out,
                self.key_col,
                lsn=cur_a + cur_b,
                batch_id=f"mvj-refresh-{cur_a}-{cur_b}",
                lineage_extra={
                    "mv_src_a_version": cur_a,
                    "mv_src_b_version": cur_b,
                },
                mode=mode,
            )
        finally:
            affected.unpersist(blocking=False)
        return {
            "src_a_version": cur_a,
            "src_b_version": cur_b,
            "affected_keys": res.keys_changed,
            "skipped": res.skipped_replay,
        }

    def refresh_from_changes(
        self, changes: DataFrame, batch_tag: str, mode: str = "cow"
    ) -> dict[str, Any]:
        """Refresh exactly the join keys present in a row-level change
        batch from EITHER source (see IncrementalView.refresh_from_changes
        for the contract: exact keys from the batch rows, recompute as a
        pure function of both sources' current state, ledger idempotence
        via `batch_tag`). Watermarks are NOT advanced here — the rowlevel
        stream's checkpoints own delivery progress per source; a later
        batch refresh() will re-derive anything it needs from its own
        watermarks, and re-refreshing a key is idempotent."""
        affected = changes.select(self.key_col).distinct().persist()
        snap_a = self.source_a.current()
        snap_b = self.source_b.current()
        a_rows = _pruned_live(self.source_a, snap_a, affected, self.key_col)
        b_rows = _pruned_live(self.source_b, snap_b, affected, self.key_col)
        out = self.view_fn(a_rows, b_rows)
        try:
            res = _merge_affected(
                self.target,
                affected,
                out,
                self.key_col,
                lsn=snap_a.version + snap_b.version,
                batch_id=batch_tag,
                lineage_extra={},
                mode=mode,
            )
        finally:
            affected.unpersist(blocking=False)
        return {
            "src_a_version": snap_a.version,
            "src_b_version": snap_b.version,
            "affected_keys": res.keys_changed,
            "skipped": res.skipped_replay,
        }

    def stream(
        self,
        checkpoint_dir: str,
        mode: str = "cow",
        available_now: bool = True,
        rowlevel: bool = False,
    ):
        """Continuous maintenance off BOTH commit logs: one streaming query
        over the union of the two sources' `lake_cdf` feeds (Spark
        checkpoints each source's offset independently), each micro-batch
        triggering a refresh.

        rowlevel=False (default): the file-level streams are purely the
        wake-up signal — the batch data is never acted on, so no file
        contents are read by the trigger path; refresh() re-reads its own
        per-source watermarks from target lineage, making duplicate
        triggers and checkpoint replays harmless ledger no-ops.

        rowlevel=True: subscribes to both MATERIALIZED row-level
        changelogs (each source's maintenance job must run
        materialize_changelog — the stream waits) and refreshes the batch
        rows' join keys directly via `refresh_from_changes` — zero
        consumer-side diff work. Each source's batch is tagged with its
        own version range plus a source discriminator, so replays/resets
        are ledger no-ops per source."""
        from ..streaming.cdf_source import LakeCdfDataSource

        spark = self.target.spark
        spark.dataSource.register(LakeCdfDataSource)
        from_a, from_b = self.last_refreshed_versions()

        def feed(src: SnapshotTable, from_v: int, tag: str) -> DataFrame:
            reader = (
                spark.readStream.format("lake_cdf")
                .option("path", src.root)
                .option("startingVersion", from_v)
            )
            if rowlevel:
                # both sources expose the join key under the same name;
                # the union needs only (source, version, key) — payloads
                # differ. The source discriminator keeps the batch tag
                # (below) content-identifying: version numbers from the
                # two commit logs are incomparable.
                return (
                    reader.option("mode", "rowlevel")
                    .load()
                    .select(
                        F.lit(tag).alias("__src"),
                        "_commit_version",
                        F.col(self.key_col),
                    )
                )
            return reader.load().select("_commit_version")

        stream = feed(self.source_a, from_a, "a").unionByName(
            feed(self.source_b, from_b, "b")
        )

        if rowlevel:

            def on_batch(batch: DataFrame, batch_id: int) -> None:
                # tag = each source's delivered version range: changelogs
                # are immutable and a microbatch carries whole versions,
                # so equal tags imply identical batch content — making the
                # ledger skip safe across checkpoint replays AND resets
                # (an epoch batch_id restarts at 0 after a reset and would
                # collide across DIFFERENT content)
                vr = sorted(
                    (r[0], r[1], r[2])
                    for r in batch.groupBy("__src")
                    .agg(F.min("_commit_version"), F.max("_commit_version"))
                    .collect()
                )
                if not vr:
                    return
                tag = "mvj-rl-" + "-".join(f"{s}{lo}.{hi}" for s, lo, hi in vr)
                self.refresh_from_changes(batch, batch_tag=tag, mode=mode)

        else:

            def on_batch(batch: DataFrame, batch_id: int) -> None:
                self.refresh(mode=mode)

        writer = (
            stream.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
