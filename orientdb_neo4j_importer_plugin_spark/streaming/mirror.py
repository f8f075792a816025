"""Continuous table-to-table mirroring: tail a SnapshotTable's change feed
and apply it onto a replica table, exactly-once.

This is the streaming form of `sources.debezium.replicate_changelog`: where
that drains a version RANGE in one batch, `MirrorRunner` subscribes to the
source's commit log through the ``lake_cdf`` Python Data Source and keeps a
downstream replica converged as the source advances — the fan-out stage a
multi-cluster pipeline needs after ingest (upstream WAL -> primary lake ->
N replicas), without re-reading the upstream WAL.

Reference analogue: the importer's one-shot copy (``ONeo4jImporter.java:
66-188``) is source-database -> target-database; the mirror closes the same
loop target -> further targets, which the one-shot design simply cannot
express (a re-run is a full drop-and-rebuild, ``ONeo4jImporter.java:
105-112`` — here resume is a checkpoint offset).

Correctness composition (each link proven by its own tests):

* the ``lake_cdf`` source emits every committed winner row with its
  ORIGINAL lsn (version offsets in the checkpoint),
* the replica apply is the ordinary idempotent LWW merge — original lsns
  mean the replica resolves ties exactly like the source did,
* ledger keys are scoped to the checkpoint lineage (inherited from
  `CdcStreamRunner`), so a replayed micro-batch is a no-op and
  kill-and-resume converges.

Scale notes: per trigger the work is O(source data committed since the
last trigger) — file-level change emission, no state store, no diff join.
A COW source (or a compaction commit on a MOR source) surfaces whole
rewritten buckets as changes; the replica apply stays convergent (LWW
idempotence) but pays O(rewritten bucket) IO for those commits — mirror
MOR-mode sources and run replica-side compaction locally
(``compact_every``) for the sustained configuration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..lake.table import SnapshotTable
from .cdf_source import LSN_OUT_COL, VERSION_COL, LakeCdfDataSource
from .runner import CdcStreamRunner


class MirrorRunner(CdcStreamRunner):
    """One streaming query source-table -> replica-table.

    Inherits the exactly-once sink, metrics, status JSON, and replica-side
    compaction cadence from `CdcStreamRunner`; only the source differs —
    the table's own commit log instead of a WAL directory. The WAL-side
    policy knobs (late-drop, stream dedup, patches) are deliberately not
    exposed: they belong at ingest, and applying them again at the mirror
    would make replicas diverge from the primary.
    """

    def __init__(
        self,
        spark: SparkSession,
        source: SnapshotTable,
        table: SnapshotTable,
        checkpoint_dir: str,
        starting_version: int = 0,
        status_path: str | None = None,
        batch_id_prefix: str | None = None,
        mode: str = "cow",
        compact_every: int = 0,
    ):
        super().__init__(
            spark,
            feed_dir=source.root,
            table=table,
            checkpoint_dir=checkpoint_dir,
            status_path=status_path,
            batch_id_prefix=batch_id_prefix,
            mode=mode,
            compact_every=compact_every,
        )
        self.source = source
        self.starting_version = starting_version

    def _source(self) -> DataFrame:
        self.spark.dataSource.register(LakeCdfDataSource)
        df = (
            self.spark.readStream.format("lake_cdf")
            .option("path", self.source.root)
            .option("startingVersion", self.starting_version)
            .load()
        )
        payload = [
            c for c in df.columns if c not in (VERSION_COL, LSN_OUT_COL, "op")
        ]
        return df.select(
            F.col(LSN_OUT_COL).alias("lsn"), F.col("op"), *payload
        )
