"""Streamed maintenance of the histogram-CDF quantile sketch
(`operators.temporal.value_quantiles_hist`) as an incrementally-updated
state table — the sketch-family analogue of `materialize.IncrementalView`.

Why not maintain the bin cells directly? The sketch's bins are defined by
the group's global (min, max), so a single out-of-range insert — or any
delete — invalidates every cell. The smallest DELETE-ALGEBRAIC sufficient
statistic is the exact value MULTISET: per (group, value) a count, which

  * merges under inserts (+1) and deletes (-1) — a commutative group, so
    maintenance is one map-side-combinable aggregate per refresh,
  * is O(distinct values) state, not O(rows) — bounded for measurement /
    monetary columns and shardable by value hash when not,
  * reproduces the batch sketch BIT-identically: the sketch is a pure
    function of the multiset (`temporal.hist_from_cells`).

Deletes require PRE-IMAGES — the consumer must learn the value that
vanished — which is exactly why Delta Lake's CDF emits
`update_preimage`/`delete` rows with old payloads. The source side here is
`SnapshotTable.changelog_delta` (same diff join as `changelog()`, old
payload kept instead of discarded).

Exactly-once composes the same way as IncrementalView: the refresh's
source-version range is its ledger batch tag and the watermark
(`hist_source_version`) rides target lineage, committed atomically with
the state delta — kill-and-resume replays are committed no-ops.

Cost per refresh at 10^10 rows/day: changelog_delta is O(that window's
changed data) (bucket-pruned candidates), the delta aggregate is one
combinable shuffle of O(distinct changed values), and the state MERGE
touches only those cells' buckets. Reading the histogram costs
O(distinct values) — never a source scan.

Reference analogue: the plugin's import summary keeps running counters
updated per record (``ONeo4jImporterCounters.java``); this maintains a
full distribution sketch, not just counts, under the same
keep-it-current-as-data-flows contract.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.temporal import HIST_BINS, hist_from_cells
from ..operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    _cms_addresses,
    cms_estimate_from_cells,
)
from .table import SnapshotTable, bucket_expr_for


def cells_schema(group_col: str) -> StructType:
    """State-table schema: one row per (group, value) cell. `cell_id` is
    the routing key (xxhash64 of group+value — high-cardinality, uniform,
    so the state table never skews); the real identity is the full
    (cell_id, group, value) key, which keeps a hash collision two distinct
    rows instead of silent corruption."""
    return StructType(
        [
            StructField("cell_id", LongType(), False),
            StructField(group_col, StringType(), True),
            StructField("value", DoubleType(), True),
            StructField("cnt", LongType(), True),
        ]
    )


class StreamedHistView:
    """Maintains `state` = per-(group, value) live-row counts of `source`,
    from which `hist()` reads the quantile sketch bit-identically to
    `value_quantiles_hist` over the source's live rows."""

    def __init__(
        self,
        source: SnapshotTable,
        state: SnapshotTable,
        group_col: str = "event_type",
        value_col: str = "value",
        bins: int = HIST_BINS,
    ):
        expected = [f.name for f in cells_schema(group_col).fields]
        got = state.current().schema.names
        if list(got) != expected:
            raise ValueError(
                f"state table schema {list(got)} != expected {expected} "
                "(create it with StreamedHistView.create_state)"
            )
        self.source = source
        self.state = state
        self.group_col = group_col
        self.value_col = value_col
        self.bins = bins

    @classmethod
    def create_state(
        cls,
        spark: SparkSession,
        root: str,
        group_col: str = "event_type",
        num_buckets: int = 16,
        overwrite: bool = False,
    ) -> SnapshotTable:
        return SnapshotTable.create(
            spark,
            root,
            cells_schema(group_col),
            partition_key="cell_id",
            num_buckets=num_buckets,
            key_columns=["cell_id", group_col, "value"],
            overwrite=overwrite,
        )

    def last_refreshed_version(self) -> int:
        """Source version covered by the newest refresh (0 = never);
        rides state lineage so it survives restarts and is committed
        atomically with the cell deltas."""
        for entry in reversed(self.state.current().lineage):
            v = entry.get("hist_source_version")
            if v is not None:
                return int(v)
        return 0

    def refresh(self, mode: str = "mor") -> dict[str, Any]:
        """Fold the source's commits in (watermark, current] into the cell
        counts: pre-image rows decrement, post-image/insert rows increment,
        cells reaching zero are deleted. One combinable aggregate over the
        window's changed rows + a bucket-pruned MERGE of the touched cells."""
        from ..cdc.apply import apply_changes

        from_v = self.last_refreshed_version()
        snap = self.source.current()
        if snap.version <= from_v:
            return {
                "source_version": from_v,
                "cells_changed": 0,
                "skipped": True,
            }
        changes, cand = self.source._changelog_delta_with_cache(
            from_v, snap.version
        )
        add = F.col("_change_type").isin("insert", "update_postimage")
        delta = (
            changes.filter(F.col(self.value_col).isNotNull())
            .select(
                F.col(self.group_col).alias("g"),
                F.col(self.value_col).cast("double").alias("v"),
                F.when(add, F.lit(1)).otherwise(F.lit(-1)).alias("w"),
            )
            .groupBy("g", "v")
            .agg(F.sum("w").cast("long").alias("d"))
            # an update that kept the value (or changed another column)
            # cancels its own pre/post pair here — no state touch at all
            .filter(F.col("d") != 0)
            .withColumn("cell_id", F.xxhash64(F.col("g"), F.col("v")))
            .persist()
        )
        try:
            st_snap = self.state.current()
            touched = [
                r.b
                for r in delta.select(bucket_expr_for(st_snap).alias("b"))
                .distinct()
                .collect()
            ]
            cur = self.state.read_buckets(touched, snapshot=st_snap).select(
                "cell_id",
                F.col(self.group_col).alias("g"),
                F.col("value").alias("v"),
                F.col("cnt").alias("__old"),
            )
            on = ["cell_id", "g", "v"]
            # prune current cells to the delta's keys first (broadcast
            # semi), so the read-modify-write joins two delta-sized frames
            cur = cur.join(
                F.broadcast(delta.select(*on)), on=on, how="left_semi"
            )
            new_cnt = F.coalesce(F.col("__old"), F.lit(0)) + F.col("d")
            events = delta.join(cur, on=on, how="left").select(
                F.lit(snap.version).cast("long").alias("lsn"),
                F.when(new_cnt == 0, F.lit("D"))
                .otherwise(F.lit("U"))
                .alias("op"),
                F.col("cell_id"),
                F.col("g").alias(self.group_col),
                F.col("v").alias("value"),
                F.when(new_cnt != 0, new_cnt).cast("long").alias("cnt"),
            )
            res = apply_changes(
                events,
                self.state,
                batch_id=f"hist-{from_v}-{snap.version}",
                mode=mode,
                lineage_extra={"hist_source_version": snap.version},
                stats_via_observation=False,
            )
        finally:
            delta.unpersist(blocking=False)
            cand.unpersist(blocking=False)
        return {
            "source_version": snap.version,
            "cells_changed": res.keys_changed,
            "skipped": res.skipped_replay,
        }

    def hist(self) -> DataFrame:
        """The quantile sketch read off the maintained cells — identical
        rows to `value_quantiles_hist(source live rows)` (tested exact)."""
        cells = self.state.read().select(
            F.col(self.group_col).alias("event_type"), "value", "cnt"
        )
        return hist_from_cells(cells, self.bins)

    def stream(
        self,
        checkpoint_dir: str,
        mode: str = "mor",
        available_now: bool = True,
    ):
        """Continuous maintenance: the file-level `lake_cdf` feed is the
        wake-up signal (offsets = source versions, checkpointed by Spark);
        each trigger calls `refresh()`, which re-reads its own watermark
        from state lineage — duplicate triggers and checkpoint replays are
        ledger no-ops, a missed trigger is absorbed by the next (same
        trigger contract as IncrementalView.stream rowlevel=False)."""
        from ..streaming.cdf_source import LakeCdfDataSource

        spark = self.state.spark
        spark.dataSource.register(LakeCdfDataSource)
        stream = (
            spark.readStream.format("lake_cdf")
            .option("path", self.source.root)
            .option("startingVersion", self.last_refreshed_version())
            .load()
        )

        def on_batch(batch: DataFrame, batch_id: int) -> None:
            self.refresh(mode=mode)

        writer = stream.writeStream.foreachBatch(on_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def cms_cells_schema() -> StructType:
    """CMS state-table schema: one row per non-zero sketch counter.
    `cell_id` = r * (width + 1) + c (the +1 stride reserves a per-row
    sentinel slot for the null-hash cell so it cannot collide with the
    next row's column 0)."""
    return StructType(
        [
            StructField("cell_id", LongType(), False),
            StructField("r", LongType(), True),
            StructField("c", LongType(), True),
            StructField("cnt", LongType(), True),
        ]
    )


class StreamedCmsView:
    """Incrementally-maintained count-min sketch of `value_col`'s
    frequency distribution over the live rows of `source` — the second
    member of the streamed-sketch family (same maintenance contract as
    `StreamedHistView`; see the module docstring).

    CMS counters are a commutative group under insert(+1)/delete(-1), so
    unlike the histogram no multiset detour is needed: the cells ARE the
    delete-algebraic sufficient statistic. Each changed row touches
    exactly `depth` cells; a refresh is one combinable aggregate over the
    window's pre-image changelog plus a bucket-pruned MERGE of the (at
    most depth x width) touched cells. `estimate()` reads probes against
    the maintained cells bit-identically to a fresh `cms_build` over the
    live rows (counters are exact longs)."""

    def __init__(
        self,
        source: SnapshotTable,
        state: SnapshotTable,
        value_col: str,
        depth: int = CMS_DEPTH,
        width: int = CMS_WIDTH,
    ):
        expected = [f.name for f in cms_cells_schema().fields]
        got = state.current().schema.names
        if list(got) != expected:
            raise ValueError(
                f"state table schema {list(got)} != expected {expected} "
                "(create it with StreamedCmsView.create_state)"
            )
        self.source = source
        self.state = state
        self.value_col = value_col
        self.depth = depth
        self.width = width

    @classmethod
    def create_state(
        cls,
        spark: SparkSession,
        root: str,
        num_buckets: int = 4,
        overwrite: bool = False,
    ) -> SnapshotTable:
        return SnapshotTable.create(
            spark,
            root,
            cms_cells_schema(),
            partition_key="cell_id",
            num_buckets=num_buckets,
            key_columns=["cell_id"],
            overwrite=overwrite,
        )

    def last_refreshed_version(self) -> int:
        for entry in reversed(self.state.current().lineage):
            v = entry.get("cms_source_version")
            if v is not None:
                return int(v)
        return 0

    def refresh(self, mode: str = "mor") -> dict[str, Any]:
        from ..cdc.apply import apply_changes

        from_v = self.last_refreshed_version()
        snap = self.source.current()
        if snap.version <= from_v:
            return {
                "source_version": from_v,
                "cells_changed": 0,
                "skipped": True,
            }
        changes, cand = self.source._changelog_delta_with_cache(
            from_v, snap.version
        )
        add = F.col("_change_type").isin("insert", "update_postimage")
        addr = F.explode(
            _cms_addresses(F.col(self.value_col), self.depth, self.width)
        )
        delta = (
            changes.select(
                addr.alias("__cell"),
                F.when(add, F.lit(1)).otherwise(F.lit(-1)).alias("w"),
            )
            .select(
                F.col("__cell.__cms_r").cast("long").alias("r"),
                F.col("__cell.__cms_c").cast("long").alias("c"),
                "w",
            )
            .groupBy("r", "c")
            .agg(F.sum("w").cast("long").alias("d"))
            .filter(F.col("d") != 0)
            .withColumn(
                "cell_id",
                F.col("r") * (self.width + 1)
                + F.coalesce(F.col("c"), F.lit(self.width)),
            )
            .persist()
        )
        try:
            st_snap = self.state.current()
            touched = [
                row.b
                for row in delta.select(bucket_expr_for(st_snap).alias("b"))
                .distinct()
                .collect()
            ]
            cur = self.state.read_buckets(touched, snapshot=st_snap).select(
                "cell_id", F.col("cnt").alias("__old")
            )
            cur = cur.join(
                F.broadcast(delta.select("cell_id")),
                on="cell_id",
                how="left_semi",
            )
            new_cnt = F.coalesce(F.col("__old"), F.lit(0)) + F.col("d")
            events = delta.join(cur, on="cell_id", how="left").select(
                F.lit(snap.version).cast("long").alias("lsn"),
                F.when(new_cnt == 0, F.lit("D"))
                .otherwise(F.lit("U"))
                .alias("op"),
                F.col("cell_id"),
                F.col("r"),
                F.col("c"),
                F.when(new_cnt != 0, new_cnt).cast("long").alias("cnt"),
            )
            res = apply_changes(
                events,
                self.state,
                batch_id=f"cms-{from_v}-{snap.version}",
                mode=mode,
                lineage_extra={"cms_source_version": snap.version},
                stats_via_observation=False,
            )
        finally:
            delta.unpersist(blocking=False)
            cand.unpersist(blocking=False)
        return {
            "source_version": snap.version,
            "cells_changed": res.keys_changed,
            "skipped": res.skipped_replay,
        }

    def cells(self) -> DataFrame:
        """Maintained sketch cells (r, c, cnt) — same shape `cms_build`
        emits over the live rows."""
        return self.state.read().select("r", "c", "cnt")

    def estimate(self, probes: DataFrame, probe_value) -> DataFrame:
        """Estimated frequency of each probe row's value against the
        maintained cells — bit-identical to `cms_estimate` over the
        source's live rows (tested exact)."""
        return cms_estimate_from_cells(
            self.cells(), probes, probe_value, self.depth, self.width
        )

    def stream(
        self,
        checkpoint_dir: str,
        mode: str = "mor",
        available_now: bool = True,
    ):
        """Continuous maintenance off the source's `lake_cdf` wake-up feed
        (same trigger contract as StreamedHistView.stream)."""
        from ..streaming.cdf_source import LakeCdfDataSource

        spark = self.state.spark
        spark.dataSource.register(LakeCdfDataSource)
        stream = (
            spark.readStream.format("lake_cdf")
            .option("path", self.source.root)
            .option("startingVersion", self.last_refreshed_version())
            .load()
        )

        def on_batch(batch: DataFrame, batch_id: int) -> None:
            self.refresh(mode=mode)

        writer = stream.writeStream.foreachBatch(on_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def vocab_cells_schema() -> StructType:
    """Vocabulary state-table schema: one row per live token. `occ` =
    total occurrences across live rows, `docs` = live rows containing the
    token — the two counters `repetition.vocab_topk` ranks on, each a
    commutative group under insert/delete."""
    return StructType(
        [
            StructField("cell_id", LongType(), False),
            StructField("token", StringType(), True),
            StructField("occ", LongType(), True),
            StructField("docs", LongType(), True),
        ]
    )


class StreamedVocabView:
    """Incrementally-maintained corpus vocabulary over the live rows of
    `source` (a table with a text payload column) — the third member of
    the streamed-sketch family (same maintenance contract as
    `StreamedHistView`; see the module docstring). The training-data use
    is vocabulary drift monitoring: the token head of a continuously-
    ingested transcript corpus stays current without corpus rescans.

    Sufficient statistic per token: (total occurrences, containing-row
    count). Both are delete-algebraic given pre-images — a vanished or
    rewritten row contributes its OLD text's token counts with weight -1,
    the post-image with +1, and an update that kept the text cancels to
    zero state touches. `topk(k)` reads back bit-identically to
    `repetition.vocab_topk` over the source's live rows (tested exact):
    the vocabulary head is a pure function of the maintained counters.

    Cost per refresh: one explode + two combinable aggregates over the
    window's changed rows (never the corpus), then a bucket-pruned MERGE
    of O(changed tokens) cells. State is O(live vocabulary), sharded by
    token hash — natural-language vocabularies grow sublinearly in corpus
    size (Heaps' law), so the state table stays far smaller than the
    corpus it summarizes."""

    def __init__(
        self,
        source: SnapshotTable,
        state: SnapshotTable,
        text_col: str = "text",
    ):
        expected = [f.name for f in vocab_cells_schema().fields]
        got = state.current().schema.names
        if list(got) != expected:
            raise ValueError(
                f"state table schema {list(got)} != expected {expected} "
                "(create it with StreamedVocabView.create_state)"
            )
        self.source = source
        self.state = state
        self.text_col = text_col

    @classmethod
    def create_state(
        cls,
        spark: SparkSession,
        root: str,
        num_buckets: int = 16,
        overwrite: bool = False,
    ) -> SnapshotTable:
        return SnapshotTable.create(
            spark,
            root,
            vocab_cells_schema(),
            partition_key="cell_id",
            num_buckets=num_buckets,
            key_columns=["cell_id", "token"],
            overwrite=overwrite,
        )

    def last_refreshed_version(self) -> int:
        for entry in reversed(self.state.current().lineage):
            v = entry.get("vocab_source_version")
            if v is not None:
                return int(v)
        return 0

    def refresh(self, mode: str = "mor") -> dict[str, Any]:
        """Fold the source's commits in (watermark, current] into the
        token counters. Two-level aggregate mirroring `vocab_topk`'s
        shape: per (token, image) occurrence counts first — an image is
        one side of one changed row, identified by the source key columns
        plus `_change_type` — then per-token (occ_delta, docs_delta)."""
        from ..cdc.apply import apply_changes
        from ..functions.hashes import tokens

        from_v = self.last_refreshed_version()
        snap = self.source.current()
        if snap.version <= from_v:
            return {
                "source_version": from_v,
                "cells_changed": 0,
                "skipped": True,
            }
        changes, cand = self.source._changelog_delta_with_cache(
            from_v, snap.version
        )
        add = F.col("_change_type").isin("insert", "update_postimage")
        keys = self.source.current().keys
        per_img = (
            changes.filter(F.col(self.text_col).isNotNull())
            .select(
                *keys,
                F.when(add, F.lit(1)).otherwise(F.lit(-1)).alias("w"),
                F.explode(tokens(F.col(self.text_col))).alias("token"),
            )
            .groupBy("token", "w", *keys)
            .agg(F.count("*").alias("c"))
        )
        delta = (
            per_img.groupBy("token")
            .agg(
                F.sum(F.col("w") * F.col("c")).cast("long").alias("d_occ"),
                F.sum("w").cast("long").alias("d_docs"),
            )
            # an update that kept the text cancels its own pre/post pair
            .filter((F.col("d_occ") != 0) | (F.col("d_docs") != 0))
            .withColumn("cell_id", F.xxhash64(F.col("token")))
            .persist()
        )
        try:
            st_snap = self.state.current()
            touched = [
                row.b
                for row in delta.select(bucket_expr_for(st_snap).alias("b"))
                .distinct()
                .collect()
            ]
            on = ["cell_id", "token"]
            cur = self.state.read_buckets(touched, snapshot=st_snap).select(
                "cell_id",
                "token",
                F.col("occ").alias("__old_occ"),
                F.col("docs").alias("__old_docs"),
            )
            cur = cur.join(
                F.broadcast(delta.select(*on)), on=on, how="left_semi"
            )
            new_occ = F.coalesce(F.col("__old_occ"), F.lit(0)) + F.col("d_occ")
            new_docs = F.coalesce(F.col("__old_docs"), F.lit(0)) + F.col(
                "d_docs"
            )
            events = delta.join(cur, on=on, how="left").select(
                F.lit(snap.version).cast("long").alias("lsn"),
                F.when(new_occ == 0, F.lit("D"))
                .otherwise(F.lit("U"))
                .alias("op"),
                F.col("cell_id"),
                F.col("token"),
                F.when(new_occ != 0, new_occ).cast("long").alias("occ"),
                F.when(new_occ != 0, new_docs).cast("long").alias("docs"),
            )
            res = apply_changes(
                events,
                self.state,
                batch_id=f"vocab-{from_v}-{snap.version}",
                mode=mode,
                lineage_extra={"vocab_source_version": snap.version},
                stats_via_observation=False,
            )
        finally:
            delta.unpersist(blocking=False)
            cand.unpersist(blocking=False)
        return {
            "source_version": snap.version,
            "cells_changed": res.keys_changed,
            "skipped": res.skipped_replay,
        }

    def topk(self, k: int = 50) -> DataFrame:
        """The vocabulary head off the maintained counters — identical
        rows to `vocab_topk(live rows)` (count desc, token asc: a total
        order, so the cut is deterministic in both engines)."""
        return (
            self.state.read()
            .select(
                "token",
                F.col("occ").alias("n_occurrences"),
                F.col("docs").alias("n_docs"),
            )
            .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
            .limit(k)
        )

    def stream(
        self,
        checkpoint_dir: str,
        mode: str = "mor",
        available_now: bool = True,
    ):
        """Continuous maintenance off the source's `lake_cdf` wake-up feed
        (same trigger contract as StreamedHistView.stream)."""
        from ..streaming.cdf_source import LakeCdfDataSource

        spark = self.state.spark
        spark.dataSource.register(LakeCdfDataSource)
        stream = (
            spark.readStream.format("lake_cdf")
            .option("path", self.source.root)
            .option("startingVersion", self.last_refreshed_version())
            .load()
        )

        def on_batch(batch: DataFrame, batch_id: int) -> None:
            self.refresh(mode=mode)

        writer = stream.writeStream.foreachBatch(on_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


def tool_usage_cells_schema() -> StructType:
    """Tool-usage state-table schema: one row per live (tool, conv_id)
    incidence. `calls` / `tok` are the per-incidence call and token
    counters — each a commutative group under insert/delete, which is
    what makes the per-tool rollup (incl. the DISTINCT-conversation
    count: live incidence rows per tool) exactly maintainable."""
    return StructType(
        [
            StructField("cell_id", LongType(), False),
            StructField("tool", StringType(), True),
            StructField("conv_id", StringType(), True),
            StructField("calls", LongType(), True),
            StructField("tok", LongType(), True),
        ]
    )


class StreamedToolUsageView:
    """Incrementally-maintained per-tool usage counters over the live
    rows of a transcripts `source` — the fourth member of the
    streamed-sketch family (same maintenance contract as
    `StreamedHistView`). The agent-ops use: tool-adoption dashboards over
    a continuously-ingested corpus without rescans.

    Sufficient statistic per (tool, conv_id): (call count, token count).
    Both are delete-algebraic given pre-images — a retooled or deleted
    turn contributes its OLD image with weight -1 and its new image with
    +1, so a turn that switches tools decrements one cell and increments
    another inside the same combinable aggregate. `usage()` reads back
    the ALGEBRAIC columns of `transcripts.tool_usage_stats` (n_calls,
    n_convs, n_tokens) bit-identically over live rows; the turn-position
    envelope (min/max turn_idx) is deliberately absent — min/max are not
    delete-algebraic, so a streamed view could only approximate them
    (monotone under inserts, stale under deletes), which this family's
    bit-identical contract forbids.

    State is O(live (tool, conv) incidences) — bounded by conversations
    times the tiny tool vocabulary, far smaller than the corpus."""

    def __init__(self, source: SnapshotTable, state: SnapshotTable):
        expected = [f.name for f in tool_usage_cells_schema().fields]
        got = state.current().schema.names
        if list(got) != expected:
            raise ValueError(
                f"state table schema {list(got)} != expected {expected} "
                "(create it with StreamedToolUsageView.create_state)"
            )
        self.source = source
        self.state = state

    @classmethod
    def create_state(
        cls,
        spark: SparkSession,
        root: str,
        num_buckets: int = 16,
        overwrite: bool = False,
    ) -> SnapshotTable:
        return SnapshotTable.create(
            spark,
            root,
            tool_usage_cells_schema(),
            partition_key="cell_id",
            num_buckets=num_buckets,
            key_columns=["cell_id", "tool", "conv_id"],
            overwrite=overwrite,
        )

    def last_refreshed_version(self) -> int:
        for entry in reversed(self.state.current().lineage):
            v = entry.get("toolusage_source_version")
            if v is not None:
                return int(v)
        return 0

    def refresh(self, mode: str = "mor") -> dict[str, Any]:
        """Fold the source's commits in (watermark, current] into the
        (tool, conv) cells: signed per-image weights, one combinable
        aggregate, bucket-pruned MERGE of O(changed cells)."""
        from ..cdc.apply import apply_changes
        from ..operators.transcripts import _ws_tokens

        from_v = self.last_refreshed_version()
        snap = self.source.current()
        if snap.version <= from_v:
            return {
                "source_version": from_v,
                "cells_changed": 0,
                "skipped": True,
            }
        changes, cand = self.source._changelog_delta_with_cache(
            from_v, snap.version
        )
        add = F.col("_change_type").isin("insert", "update_postimage")
        delta = (
            changes.filter(F.col("tool").isNotNull())
            .select(
                "tool",
                "conv_id",
                F.when(add, F.lit(1)).otherwise(F.lit(-1)).alias("w"),
                _ws_tokens(F.coalesce(F.col("text"), F.lit(""))).alias("t"),
            )
            .groupBy("tool", "conv_id")
            .agg(
                F.sum("w").cast("long").alias("d_calls"),
                F.sum(F.col("w") * F.col("t")).cast("long").alias("d_tok"),
            )
            # an update that kept (tool, text) cancels its own pre/post pair
            .filter((F.col("d_calls") != 0) | (F.col("d_tok") != 0))
            .withColumn(
                "cell_id",
                F.xxhash64(F.concat_ws("|", F.col("tool"), F.col("conv_id"))),
            )
            .persist()
        )
        try:
            st_snap = self.state.current()
            touched = [
                row.b
                for row in delta.select(bucket_expr_for(st_snap).alias("b"))
                .distinct()
                .collect()
            ]
            on = ["cell_id", "tool", "conv_id"]
            cur = self.state.read_buckets(touched, snapshot=st_snap).select(
                *on,
                F.col("calls").alias("__old_calls"),
                F.col("tok").alias("__old_tok"),
            )
            cur = cur.join(
                F.broadcast(delta.select(*on)), on=on, how="left_semi"
            )
            new_calls = F.coalesce(F.col("__old_calls"), F.lit(0)) + F.col(
                "d_calls"
            )
            new_tok = F.coalesce(F.col("__old_tok"), F.lit(0)) + F.col("d_tok")
            events = delta.join(cur, on=on, how="left").select(
                F.lit(snap.version).cast("long").alias("lsn"),
                F.when(new_calls == 0, F.lit("D"))
                .otherwise(F.lit("U"))
                .alias("op"),
                *[F.col(c) for c in on],
                F.when(new_calls != 0, new_calls).cast("long").alias("calls"),
                F.when(new_calls != 0, new_tok).cast("long").alias("tok"),
            )
            res = apply_changes(
                events,
                self.state,
                batch_id=f"toolusage-{from_v}-{snap.version}",
                mode=mode,
                lineage_extra={"toolusage_source_version": snap.version},
                stats_via_observation=False,
            )
        finally:
            delta.unpersist(blocking=False)
            cand.unpersist(blocking=False)
        return {
            "source_version": snap.version,
            "cells_changed": res.keys_changed,
            "skipped": res.skipped_replay,
        }

    def usage(self) -> DataFrame:
        """Per-tool rollup off the maintained cells — identical rows to
        the algebraic columns of `transcripts.tool_usage_stats` over the
        source's live rows."""
        return (
            self.state.read()
            .groupBy("tool")
            .agg(
                F.sum("calls").cast("long").alias("n_calls"),
                F.count("*").cast("long").alias("n_convs"),
                F.sum("tok").cast("long").alias("n_tokens"),
            )
            .orderBy("tool")
        )

    def stream(
        self,
        checkpoint_dir: str,
        mode: str = "mor",
        available_now: bool = True,
    ):
        """Continuous maintenance off the source's `lake_cdf` wake-up feed
        (same trigger contract as StreamedHistView.stream)."""
        from ..streaming.cdf_source import LakeCdfDataSource

        spark = self.state.spark
        spark.dataSource.register(LakeCdfDataSource)
        stream = (
            spark.readStream.format("lake_cdf")
            .option("path", self.source.root)
            .option("startingVersion", self.last_refreshed_version())
            .load()
        )

        def on_batch(batch: DataFrame, batch_id: int) -> None:
            self.refresh(mode=mode)

        writer = stream.writeStream.foreachBatch(on_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
