"""Quarantine replay: re-inject corrected dead-letter rows.

Reference analogue: the reference's per-record error isolation logs poison
records and continues (``ONeo4jImporterVerticesAndEdgesMigrator.java:
274-283,585-594``); the operator's fix is a manual edit-and-rerun. Here the
loop closes programmatically:

1. parse each quarantined row's ``event_json`` back into CDC event columns —
   with an ALL-STRING schema, so the apply path's ``try_cast`` poison checks
   re-evaluate against the ORIGINAL lexical values (a typed parse would
   silently null the uncastable field and apply a wrong row);
2. optionally repair via ``transform`` (a DataFrame -> DataFrame hook, e.g.
   remap a bad op code or backfill a key);
3. apply as a normal batch with quarantine still armed — rows that are
   STILL poison return to quarantine under the new batch id (no poison row
   is ever silently dropped or half-applied);
4. purge the replayed source rows from the quarantine side table.

Scale notes: the quarantine table is small by construction (poison rate),
so the extra parse/apply is O(quarantine); the purge rewrite is a full
quarantine-dir rewrite — fine for a dead-letter table, and atomic enough
for a maintenance tool (two renames; documented crash window).
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..lake import SnapshotTable
from .apply import ApplyResult, apply_changes


def replay_quarantine(
    table: SnapshotTable,
    batch_ids: list[str] | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    mode: str = "mor",
    batch_id: str | None = None,
    purge: bool = True,
) -> ApplyResult | None:
    """Re-apply quarantined events (optionally only those from `batch_ids`),
    after an optional `transform` repair hook. Returns the ApplyResult of
    the replay batch, or None if the selection is empty.

    Still-poison rows re-enter quarantine under the replay batch id; with
    purge=True the replayed SOURCE rows are removed from the quarantine dir
    (the net quarantine content is exactly the still-poison survivors).
    """
    q = table.read_quarantine()
    if batch_ids is not None:
        q = q.filter(F.col("batch_id").isin([str(b) for b in batch_ids]))
    # quarantine is small by construction — a count/collect here is metadata
    # traffic, not data movement
    replayed_src = sorted(
        r.batch_id for r in q.select("batch_id").distinct().collect()
    )
    if not replayed_src:
        return None
    payload_cols = [f.name for f in table.current().schema.fields]
    str_schema = StructType(
        [
            StructField("op", StringType(), True),
            StructField("lsn", StringType(), True),
        ]
        + [StructField(c, StringType(), True) for c in payload_cols]
    )
    events = (
        q.select(F.from_json("event_json", str_schema).alias("e"))
        .select("e.*")
        .withColumn("lsn", F.col("lsn").try_cast("long"))
    )
    if transform is not None:
        events = transform(events)
    bid = batch_id or f"replay-{uuid.uuid4().hex[:8]}"
    res = apply_changes(
        events,
        table,
        batch_id=bid,
        mode=mode,
        quarantine=True,
        lineage_extra={"replayed_from": replayed_src},
    )
    if purge:
        _purge_batches(table, replayed_src)
    return res


def _purge_batches(table: SnapshotTable, batch_ids: list[str]) -> None:
    """Rewrite the quarantine dir without the given batch ids (the replay's
    own re-quarantined rows carry the NEW batch id and survive)."""
    qdir = table.quarantine_dir()
    if not os.path.isdir(qdir):
        return
    keep = table.read_quarantine().filter(~F.col("batch_id").isin(batch_ids))
    tmp = qdir + f".rewrite-{uuid.uuid4().hex[:8]}"
    keep.write.mode("overwrite").parquet(tmp)
    old = qdir + f".old-{uuid.uuid4().hex[:8]}"
    os.rename(qdir, old)
    os.rename(tmp, qdir)
    shutil.rmtree(old, ignore_errors=True)
