"""Final-state verification + summary — the reference's correctness ritual.

Analogues:
* count-based verification per class (``ONeo4jImporterTest.java:146-148``,
  ``:296-297``) -> per-bucket/total row counts vs an independently computed
  expected state;
* deep content equality (``OFunctionsHandler.haveDocumentsSameContent``,
  ``OFunctionsHandler.java:65-109``) -> full-row exceptAll in both
  directions;
* the import summary with ratios and throughput
  (``ONeo4jImporter.printSummary``, ``ONeo4jImporter.java:218-508``,
  ratios ``:303-393``, throughput ``:432-501``) -> ``summarize``.

The expected state is computed from the raw feed with the WINDOW LWW
formulation (``lww_resolve_window``) while the engine applies the algebraic
formulation — two different plans must agree, on top of the external DuckDB
oracle used in tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lake.table import SnapshotTable, bucket_expr_for
from ..schema import KEY_COLUMNS
from .lww import lww_resolve_window


@dataclass
class VerificationReport:
    row_count_match: bool
    content_match: bool
    table_rows: int
    expected_rows: int
    missing_rows: int  # expected but absent
    extra_rows: int  # present but unexpected
    per_bucket: dict[int, int] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return self.row_count_match and self.content_match


def expected_state(feed: DataFrame, payload_cols: list[str]) -> DataFrame:
    """Golden state from the raw feed via the window-LWW formulation."""
    winners = lww_resolve_window(feed, keys=KEY_COLUMNS)
    live = winners.filter(F.col("op") != "D")
    return live.select(*[c for c in payload_cols if c in live.columns])


def verify_replay(table: SnapshotTable, feed: DataFrame) -> VerificationReport:
    """Replay-equivalence check: table state == LWW reduction of the feed."""
    snap = table.current()
    payload_cols = [f.name for f in snap.schema.fields]
    actual = table.read().select(
        *[c for c in payload_cols if c is not None]
    )
    expected = expected_state(feed, payload_cols)
    # align columns (feed may lack late-added table columns -> null-fill)
    for c in payload_cols:
        if c not in expected.columns:
            expected = expected.withColumn(c, F.lit(None).cast(dict(
                (f.name, f.dataType) for f in snap.schema.fields)[c]))
    expected = expected.select(*payload_cols)
    missing = expected.exceptAll(actual).count()
    extra = actual.exceptAll(expected).count()
    t_rows = actual.count()
    e_rows = expected.count()
    per_bucket = {
        r["b"]: r["n"]
        for r in table.read()
        .select(bucket_expr_for(snap).alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    return VerificationReport(
        row_count_match=(t_rows == e_rows),
        content_match=(missing == 0 and extra == 0),
        table_rows=t_rows,
        expected_rows=e_rows,
        missing_rows=missing,
        extra_rows=extra,
        per_bucket=per_bucket,
    )


def summarize(table: SnapshotTable) -> dict[str, Any]:
    """Import-summary analogue: totals, ratios, per-commit throughput."""
    snap = table.current()
    rows = table.read().count()
    events_in = sum(
        lin.get("events_in", 0) or 0 for lin in snap.lineage if "events_in" in lin
    )
    keys_changed = sum(
        lin.get("keys_changed", 0) or 0
        for lin in snap.lineage
        if "keys_changed" in lin
    )
    deletes = sum(
        lin.get("deletes", 0) or 0 for lin in snap.lineage if "deletes" in lin
    )
    # throughput per commit from commit epochs (A4 analogue)
    commits = [lin for lin in snap.lineage if lin.get("events_in")]
    throughput = []
    prev_epoch = None
    for lin in commits:
        epoch = lin.get("commit_epoch")
        if prev_epoch is not None and epoch and lin.get("events_in", 0) > 0:
            dt = epoch - prev_epoch
            if dt > 0:
                throughput.append(lin["events_in"] / dt)
        prev_epoch = epoch
    return {
        "version": snap.version,
        "rows": rows,
        "num_buckets": snap.num_buckets,
        "schema_columns": [f.name for f in snap.schema.fields],
        "committed_batches": len(snap.ledger),
        "events_in_total": events_in,
        "keys_changed_total": keys_changed,
        "deletes_total": deletes,
        "dedup_ratio_pct": round(100.0 * keys_changed / events_in, 2)
        if events_in
        else None,
        "events_per_sec_recent": round(sum(throughput) / len(throughput), 1)
        if throughput
        else None,
        "delta_buckets": len(snap.deltas),
    }


def verify_replica(
    source: SnapshotTable, replica: SnapshotTable
) -> VerificationReport:
    """Deep-equality check of a mirrored replica against its source —
    the reference's ``haveDocumentsSameContent`` ritual
    (``OFunctionsHandler.java:65-109``) applied to cascade replication:
    identical live-row multisets (full-row exceptAll both directions over
    the shared column set) and identical counts. Layout-independent —
    the tables may differ in bucket count, COW/MOR state, or compaction
    history; only LWW-resolved content is compared.

    Returns the same `VerificationReport` shape as `verify_replay`, so
    operational tooling can gate promotion of a replica on `report.ok`.
    """
    cols = [
        f.name
        for f in source.current().schema.fields
        if f.name in set(replica.current().schema.fieldNames())
    ]
    s = source.read().select(*cols)
    r = replica.read().select(*cols)
    n_s = s.count()
    n_r = r.count()
    missing = s.exceptAll(r).count()
    extra = r.exceptAll(s).count()
    return VerificationReport(
        row_count_match=(n_s == n_r),
        content_match=(missing == 0 and extra == 0),
        table_rows=n_r,
        expected_rows=n_s,
        missing_rows=missing,
        extra_rows=extra,
    )


def key_hotness(feed: DataFrame) -> DataFrame:
    """Write-hotness profile of the raw change feed, per conversation:
    how many events / of which ops hit each key, how many distinct turns
    they touch, and the lsn span — the diagnostic that tells an operator
    WHICH keys need the salted LWW variant (`lww_resolve_salted`) before
    throughput collapses, rather than discovering skew from a straggler
    task. The reference's per-type counters
    (``ONeo4jImporterStatistics.java:30-63``) sliced per key instead of
    globally.

    Columns: conv_id, n_events, n_inserts, n_updates, n_deletes,
    n_turns_touched, lsn_span (exact BIGINTs).

    Scale shape: two-phase aggregate — per-(conv, turn) partials combine
    map-side, then the per-conversation rollup; no distinct expand, no
    window, no join. Runs on the feed BEFORE any apply, so it can gate
    admission config per batch.
    """
    per_turn = feed.groupBy("conv_id", "turn_idx").agg(
        F.count("*").alias("n"),
        F.sum((F.col("op") == "I").cast("long")).alias("i"),
        F.sum((F.col("op") == "U").cast("long")).alias("u"),
        F.sum((F.col("op") == "D").cast("long")).alias("d"),
        F.min("lsn").alias("lo"),
        F.max("lsn").alias("hi"),
    )
    return (
        per_turn.groupBy("conv_id")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            F.sum("i").cast("long").alias("n_inserts"),
            F.sum("u").cast("long").alias("n_updates"),
            F.sum("d").cast("long").alias("n_deletes"),
            F.count("*").cast("long").alias("n_turns_touched"),
            (F.max("hi") - F.min("lo")).cast("long").alias("lsn_span"),
        )
        .orderBy("conv_id")
    )
