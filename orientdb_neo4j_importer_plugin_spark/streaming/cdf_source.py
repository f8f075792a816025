"""`lake_cdf` — a PySpark 4 Python Data Source that turns the snapshot
table's commit log into a real ``spark.readStream`` source (the push-based
companion to the pull-based ``SnapshotTable.iter_changelogs``).

Reference analogue: the plugin's one-shot import has no change feed at all;
this is the "keep the copy live" capability the north rule asks for — a
downstream consumer subscribes to the lake table exactly like Delta CDF /
Iceberg's changelog scan, with Spark's own streaming machinery (offsets,
checkpoints, exactly-once) doing the bookkeeping.

Scale shape
-----------
* **Planning is metadata-only and driver-side**: offsets are snapshot
  versions (one integer), and ``partitions(start, end)`` diffs per-version
  manifest file lists — O(files committed in the window), never O(table).
* **Reads are executor-side and Arrow-vectorized**: each input partition is
  ONE data file; the executor reads it with pyarrow and yields
  ``pyarrow.RecordBatch``es (the Python Data Source vectorized path — no
  per-row Python anywhere).
* **Exactly-once**: the offset is the committed version number; Spark's
  checkpoint replays a half-processed window deterministically because
  data files are immutable and the version diff is a pure function.

Semantics (file-level CDF — same contract as ``changes_since``)
---------------------------------------------------------------
Rows emitted for version ``v`` are the storage rows in files ADDED by
commit ``v``: for MOR commits that is exactly the batch's LWW winner rows
(including tombstones → ``op = 'D'``); for COW commits it is the rewritten
buckets (unchanged neighbor rows surface as upserts — honest file-level
contract; run CDC consumers against MOR tables). Rollbacks remove files
without adding any, so they emit nothing here — use
``SnapshotTable.changelog`` for row-level I/U/D between arbitrary versions.

Output schema: payload columns (at the CURRENT snapshot's schema when the
stream starts; older files null-fill evolved columns) + ``op`` ('U'
upsert / 'D' delete) + ``_commit_version`` + ``_lsn``. A schema evolution
committed mid-stream applies after a stream restart, like Delta.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OP_COL = "op"
VERSION_COL = "_commit_version"
LSN_OUT_COL = "_lsn"
_LSN = "__lsn"
_DELETED = "__deleted"


# -- metadata access: the storage-format readers live in lake.table (one
# source of truth, pure python, no SparkSession) -----------------------------

from ..lake.table import (
    changelog_data_files as _changelog_files,
    manifest_file_set as _manifest_file_set,
    read_snapshot_dict as _snapshot_dict,
    read_table_pointer as _read_pointer,
    snapshot_file_set as _snapshot_files,
    snapshot_manifest_paths as _manifest_paths,
)


def _payload_schema(root: str, version: int) -> StructType:
    d = _snapshot_dict(root, version)
    return StructType.fromJson(d["schema"])


def _rowlevel_payload_schema(root: str, version: int) -> StructType:
    """Declared columns of a materialized changelog file: keys, op, then
    the non-key payload (matching SnapshotTable.changelog's output)."""
    d = _snapshot_dict(root, version)
    table_schema = StructType.fromJson(d["schema"])
    keys = d.get("key_columns")
    if not keys:  # pre-v2 metadata: the transcripts default
        from ..schema import KEY_COLUMNS

        keys = list(KEY_COLUMNS)
    by_name = {f.name: f for f in table_schema.fields}
    fields = [StructField(k, by_name[k].dataType, False) for k in keys]
    fields.append(StructField(OP_COL, StringType(), False))
    fields += [f for f in table_schema.fields if f.name not in keys]
    return StructType(fields)


# -- arrow bridge ------------------------------------------------------------


def _arrow_type(dt: DataType):
    import pyarrow as pa

    if isinstance(dt, StringType):
        return pa.string()
    if isinstance(dt, LongType):
        return pa.int64()
    if isinstance(dt, IntegerType):
        return pa.int32()
    if isinstance(dt, ShortType):
        return pa.int16()
    if isinstance(dt, DoubleType):
        return pa.float64()
    if isinstance(dt, FloatType):
        return pa.float32()
    if isinstance(dt, BooleanType):
        return pa.bool_()
    if isinstance(dt, TimestampType):
        return pa.timestamp("us")
    if isinstance(dt, DateType):
        return pa.date32()
    if isinstance(dt, BinaryType):
        return pa.binary()
    if isinstance(dt, ArrayType):
        return pa.list_(_arrow_type(dt.elementType))
    raise TypeError(f"lake_cdf: unsupported column type {dt}")


def _output_schema(payload: StructType) -> StructType:
    return StructType(
        list(payload.fields)
        + [
            StructField(OP_COL, StringType(), False),
            StructField(VERSION_COL, LongType(), False),
            StructField(LSN_OUT_COL, LongType(), False),
        ]
    )


@dataclass
class CdfFilePartition(InputPartition):
    """One immutable data file + the commit version that added it. Carries
    the declared payload schema as JSON so the executor-side read needs no
    driver state. rowlevel=True marks a materialized-changelog file (op is
    a stored column; no __lsn/__deleted metadata)."""

    path: str
    commit_version: int
    payload_schema_json: str
    rowlevel: bool = False


def _read_partition_batches(part: CdfFilePartition):
    """Executor-side: one parquet file -> arrow RecordBatches shaped to the
    declared output schema. Vectorized end to end (pyarrow compute only)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    payload = StructType.fromJson(json.loads(part.payload_schema_json))
    table = pq.read_table(part.path)
    n = table.num_rows
    if n == 0:
        return
    cols = []
    names = []
    for f in payload.fields:
        target = _arrow_type(f.dataType)
        if f.name in table.column_names:
            col = table.column(f.name)
            if col.type != target:
                # evolved/widened types and timestamp units normalize here;
                # tz-aware parquet timestamps drop to naive us (Spark stores
                # session-tz-normalized instants)
                col = col.cast(target)
        else:
            # pre-evolution file: null-fill the evolved column
            col = pa.nulls(n, type=target)
        cols.append(col)
        names.append(f.name)
    if not part.rowlevel:
        deleted = table.column(_DELETED)
        op = pc.if_else(deleted, pa.scalar("D"), pa.scalar("U"))
        cols.append(op)
        names.append(OP_COL)
    # constant column without an n-element python list (stays vectorized)
    cols.append(
        pa.chunked_array(
            [pa.repeat(pa.scalar(part.commit_version, pa.int64()), n)]
        )
    )
    names.append(VERSION_COL)
    if not part.rowlevel:
        cols.append(table.column(_LSN).cast(pa.int64()))
        names.append(LSN_OUT_COL)
    out = pa.table(cols, names=names)
    yield from out.to_batches()


def _plan_partitions(
    root: str, start_version: int, end_version: int, payload_schema_json: str
) -> list[CdfFilePartition]:
    """Files added per version in (start, end], tagged with their commit
    version.

    Planning cost is O(changed buckets in the window), independent of
    table size: unchanged buckets carry their manifest forward BY PATH
    across commits, so diffing the bucket->manifest-path maps of two
    consecutive versions names exactly the buckets a commit touched, and
    only those few manifests are opened (memoized — manifests are
    immutable). Falls back to a full file-set diff for pre-manifest roots.
    """
    parts: list[CdfFilePartition] = []
    manifest_cache: dict[str, set[str]] = {}

    def files_of(path: str) -> set[str]:
        got = manifest_cache.get(path)
        if got is None:
            got = manifest_cache[path] = _manifest_file_set(path)
        return got

    prev_m = _manifest_paths(root, start_version)
    prev_full: set[str] | None = (
        _snapshot_files(root, start_version) if prev_m is None else None
    )
    for v in range(start_version + 1, end_version + 1):
        cur_m = _manifest_paths(root, v)
        if cur_m is None or prev_m is None:
            # pre-manifest root on either side: full-set diff for this step
            cur_full = _snapshot_files(root, v)
            if prev_full is None:
                prev_full = _snapshot_files(root, v - 1)
            added = cur_full - prev_full
            prev_full = cur_full
        else:
            added = set()
            for b, path in cur_m.items():
                if prev_m.get(b) == path:
                    continue  # bucket untouched by this commit
                old = files_of(prev_m[b]) if b in prev_m else set()
                added |= files_of(path) - old
            prev_full = None
        for path in sorted(added):
            parts.append(CdfFilePartition(path, v, payload_schema_json))
        prev_m = cur_m
    return parts


def _plan_rowlevel_partitions(
    root: str, start_version: int, end_version: int, payload_schema_json: str
) -> list[CdfFilePartition]:
    """Materialized-changelog files per version in (start, end]. Pure
    directory metadata; fails loudly for a version that was committed but
    never materialized (the consumer contract requires running
    SnapshotTable.materialize_changelog up to its read horizon first)."""
    parts: list[CdfFilePartition] = []
    for v in range(start_version + 1, end_version + 1):
        files = _changelog_files(root, v)
        if files is None:
            raise RuntimeError(
                f"lake_cdf mode=rowlevel: changelog for version {v} is not "
                "materialized — run SnapshotTable.materialize_changelog() "
                "up to the read horizon first"
            )
        for path in files:
            parts.append(
                CdfFilePartition(path, v, payload_schema_json, rowlevel=True)
            )
    return parts


# -- the data source ---------------------------------------------------------


class LakeCdfStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        root: str,
        starting_version: int,
        payload_json: str,
        rowlevel: bool = False,
        max_versions_per_trigger: int | None = None,
    ):
        self.root = root
        self.starting_version = starting_version
        self.payload_json = payload_json
        self.rowlevel = rowlevel
        if max_versions_per_trigger is not None and max_versions_per_trigger < 1:
            raise ValueError(
                "maxVersionsPerTrigger must be >= 1, got "
                f"{max_versions_per_trigger}"
            )
        self.max_versions_per_trigger = max_versions_per_trigger
        # rowlevel read horizon: highest version known contiguous-materialized
        # (monotone; re-checks start here, not at starting_version, so the
        # _DONE probe stays O(new versions) per trigger)
        self._rowlevel_watermark = starting_version
        # admission-control position: highest version this reader has
        # offered, planned, or committed. The Python DataSourceStreamReader
        # API has no ReadLimit hook, so maxVersionsPerTrigger is implemented
        # exactly like rowlevel's materialization horizon: latestOffset
        # self-caps at min(head, position + N) (the reference's bounded sink
        # batches, ONeo4jImporterVerticesAndEdgesMigrator.java:58-59,268-272,
        # exist for the same reason — an unbounded catch-up transaction).
        # The position also advances from partitions()/commit() so a resumed
        # query re-learns the checkpointed offset from its first planned
        # batch; the one uncovered case (restart whose FIRST call is
        # latestOffset) makes the offer ramp restart from starting_version,
        # which costs at most one empty batch + an idempotent re-cover of
        # already-applied versions — never a correctness issue (LWW replays
        # to the same state).
        self._position = starting_version

    def initialOffset(self) -> dict:
        return {"version": self.starting_version}

    def latestOffset(self) -> dict:
        cur = _read_pointer(self.root)
        if self.rowlevel:
            # rowlevel mode reads materialized changelog files, which a
            # writer produces AFTER the commit itself
            # (materialize_changelog). Offering the raw table pointer would
            # make the next microbatch's partitions() throw for a
            # committed-but-unmaterialized version and kill the stream — a
            # crash race against every writer. Cap the offset at the highest
            # CONTIGUOUS materialized version instead: the stream simply
            # waits for the maintenance job to catch up. Contiguity
            # matters — if v5 is materialized but v4 is not, the horizon
            # stays at 3 (offsets ranges must be gap-free).
            v = self._rowlevel_watermark
            while v < cur and _changelog_files(self.root, v + 1) is not None:
                v += 1
            self._rowlevel_watermark = v
            cur = v
        if self.max_versions_per_trigger is not None:
            cur = min(cur, self._position + self.max_versions_per_trigger)
        self._position = max(self._position, cur)
        return {"version": cur}

    def partitions(self, start: dict, end: dict):
        self._position = max(self._position, start["version"], end["version"])
        plan = _plan_rowlevel_partitions if self.rowlevel else _plan_partitions
        parts = plan(
            self.root, start["version"], end["version"], self.payload_json
        )
        # Spark requires >=1 partition per microbatch even when empty
        return parts or [CdfFilePartition("", end["version"], self.payload_json)]

    def read(self, partition: CdfFilePartition):
        if not partition.path:
            return iter(())
        return _read_partition_batches(partition)

    def commit(self, end: dict) -> None:
        # offsets live in Spark's checkpoint; data files are immutable.
        # Tracking the committed position here keeps the admission-control
        # ramp anchored to real progress.
        self._position = max(self._position, end["version"])


class LakeCdfBatchReader(DataSourceReader):
    """Batch incremental read through the same planner:
    ``spark.read.format("lake_cdf").option("fromVersion", v)`` — the
    DataFrame-API twin of ``SnapshotTable.changes_since``."""

    def __init__(
        self,
        root: str,
        from_v: int,
        to_v: int,
        payload_json: str,
        rowlevel: bool = False,
    ):
        self.root = root
        self.from_v = from_v
        self.to_v = to_v
        self.payload_json = payload_json
        self.rowlevel = rowlevel

    def partitions(self):
        plan = _plan_rowlevel_partitions if self.rowlevel else _plan_partitions
        parts = plan(self.root, self.from_v, self.to_v, self.payload_json)
        return parts or [CdfFilePartition("", self.to_v, self.payload_json)]

    def read(self, partition: CdfFilePartition):
        if not partition.path:
            return iter(())
        return _read_partition_batches(partition)


class LakeCdfDataSource(DataSource):
    """Register once per session, then read the table's change feed:

        spark.dataSource.register(LakeCdfDataSource)
        (spark.readStream.format("lake_cdf")
              .option("path", table_root)
              .option("startingVersion", 0)   # default: 0 = full history
              .load())

    Batch mode: ``spark.read.format("lake_cdf").option("path", root)
    .option("fromVersion", v)[.option("toVersion", w)].load()``.
    """

    @classmethod
    def name(cls) -> str:
        return "lake_cdf"

    def _root(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError("lake_cdf requires .option('path', <table root>)")
        return root

    def _rowlevel(self) -> bool:
        mode = str(self.options.get("mode", "filelevel")).lower()
        if mode not in ("filelevel", "rowlevel"):
            raise ValueError(f"lake_cdf: unknown mode {mode!r}")
        return mode == "rowlevel"

    def _payload(self, root: str) -> StructType:
        cur = _read_pointer(root)
        if self._rowlevel():
            return _rowlevel_payload_schema(root, cur)
        return _payload_schema(root, cur)

    def schema(self) -> StructType:
        root = self._root()
        payload = self._payload(root)
        if self._rowlevel():
            # op is already a payload column; no row lsn in changelog files
            return StructType(
                list(payload.fields)
                + [StructField(VERSION_COL, LongType(), False)]
            )
        return _output_schema(payload)

    def streamReader(self, schema: StructType) -> LakeCdfStreamReader:
        root = self._root()
        max_v = self.options.get("maxVersionsPerTrigger")
        return LakeCdfStreamReader(
            root,
            int(self.options.get("startingVersion", 0)),
            self._payload(root).json(),
            rowlevel=self._rowlevel(),
            max_versions_per_trigger=None if max_v is None else int(max_v),
        )

    def reader(self, schema: StructType) -> LakeCdfBatchReader:
        root = self._root()
        cur = _read_pointer(root)
        to_v = int(self.options.get("toVersion", cur))
        return LakeCdfBatchReader(
            root,
            int(self.options.get("fromVersion", 0)),
            to_v,
            self._payload(root).json(),
            rowlevel=self._rowlevel(),
        )
