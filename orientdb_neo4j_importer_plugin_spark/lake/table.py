"""Snapshot-versioned, bucket-partitioned lake table (mini-Iceberg).

The north-rule target is an Iceberg sink; this sandbox has no Iceberg runtime
jar and no network, so the engine ships a self-contained table format with the
Iceberg semantics the CDC pipeline needs, behind one class. On a cluster with
the Iceberg runtime, `SnapshotTable` is swappable for `MERGE INTO` on a real
Iceberg table — the pipeline code (`cdc/apply.py`) only talks to this
interface.

Semantics provided (and their reference analogues):

* **Atomic snapshot commits** — data files are immutable; a commit writes new
  files then atomically swaps a metadata pointer (`os.replace`). Readers see
  either the old or the new snapshot, never a torn state. Reference analogue:
  per-batch transactional commit/rollback
  (``ONeo4jImporterVerticesAndEdgesMigrator.java:268-283``).
* **Exactly-once batch ledger** — each snapshot records the `batch_id`s it
  contains; re-applying a committed batch is a no-op. Reference analogue:
  UNIQUE_HASH_INDEX rejecting duplicate ``neo4jNodeID`` (``:363-370``).
* **Copy-on-write MERGE at bucket granularity** — the table is hash-bucketed
  on the primary key's partition column (``bucket(conv_id)``); a MERGE only
  rewrites buckets that contain changed keys, carrying every untouched
  bucket's files forward by reference. At 10^10 rows with (say) 4096 buckets,
  a batch touching 1% of conversations rewrites ~1% of the data — the same
  cost profile as Iceberg copy-on-write with partition/file pruning.
  Reference analogue: point-lookup by unique index instead of full scan
  (``OGraphCommands.java:109-119``).
* **Schema evolution** — the snapshot carries the authoritative schema; new
  columns append on first occurrence, and old data files are read through the
  new schema (missing columns null-fill). Reference analogue: lazy
  class/property creation (``ONeo4jImporterUtils.java:124-285``).
* **Per-partition lineage** — every snapshot records source offset (lsn)
  ranges, per-bucket row counts and commit epoch. Reference analogue: the
  ``neo4jLabelList``/``neo4jNodeID`` provenance columns plus the running
  statistics object (``ONeo4jImporterStatistics.java:30-63``).

Scale notes: metadata is O(num_buckets + num_files) JSON on the driver —
at 4096 buckets and a few files per bucket this is a few MB, comparable to an
Iceberg manifest list. Data paths use only `spark.read/write.parquet`, so the
physical layer is whatever the cluster's FileSystem is; the driver-side
`os.*` calls are isolated in `_fs` helpers for a future HDFS/S3 port.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid

import numpy as np
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..schema import merge_schemas

DEFAULT_NUM_BUCKETS = 64
BUCKET_COL = "__bucket"
# Exactly-once ledger horizon: entries older than this many committed
# batches are pruned from snapshot metadata (it would otherwise grow one
# entry per batch forever — ~500k/year at 1 batch/min). A batch replayed
# from BEYOND the horizon re-applies, and the LWW merge converges to the
# same state (idempotent); the horizon only needs to exceed the streaming
# checkpoint's possible replay window, which is a handful of batches.
LEDGER_HORIZON = 100_000
# Row-level metadata persisted in every data file: the source position that
# produced the row (per-row lineage, the neo4jNodeID provenance analogue) and
# a tombstone flag. Tombstones make MERGE correct under out-of-order batch
# arrival: a delete at lsn L must beat a later-arriving update at lsn < L.
LSN_COL = "__lsn"
DELETED_COL = "__deleted"
# Per-column version vector for PATCH-enabled tables (cdc/lww.py column-level
# LWW): a JSON map {"__anchor": lsn of the last full I/U/D write, "<col>":
# setter lsn for columns patched above the anchor}. NULL on rows never
# touched by a patch. Present in storage ONLY once a table has applied
# partial updates (Snapshot.patch_cols) — non-patch tables' files are
# byte-identical to before this column existed.
COL_LSNS_COL = "__col_lsns"
META_COLS = [LSN_COL, DELETED_COL, COL_LSNS_COL]


_STAT_STR_LIMIT = 64  # manifest string bounds are truncated to this length


class _ts_micros:
    """Write parquet timestamps as TIMESTAMP_MICROS for the duration of a
    data-file write. Spark's default INT96 encoding carries NO parquet
    min/max statistics, which would leave every timestamp column boundless
    in the manifests and defeat time-range file skipping (read_colrange).
    Micros is also what Iceberg mandates; INT96 is deprecated. Set/restore
    so the caller's session conf is untouched."""

    KEY = "spark.sql.parquet.outputTimestampType"

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get(self.KEY, None)
        self.spark.conf.set(self.KEY, "TIMESTAMP_MICROS")

    def __exit__(self, *exc):
        if self.prev is None:
            self.spark.conf.unset(self.KEY)
        else:
            self.spark.conf.set(self.KEY, self.prev)


def _stat_norm(v):
    """Normalize a parquet footer stat into a JSON-safe, order-preserving
    python value: timestamps -> epoch micros (int, exact), dates -> ISO
    strings (lexicographic == chronological), str/int/float as-is.
    None = not representable (bytes, bools, ...) — the column stays
    boundless (conservative)."""
    import datetime as _dt

    if isinstance(v, bool):
        return None
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return (v - _dt.datetime(1970, 1, 1)) // _dt.timedelta(microseconds=1)
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (str, int, float)):
        return v
    return None


def _trunc_lo(v):
    """Truncate a LOWER string bound: a prefix sorts <= the original, so it
    stays a valid lower bound."""
    if isinstance(v, str) and len(v) > _STAT_STR_LIMIT:
        return v[:_STAT_STR_LIMIT]
    return v


def _trunc_hi(v):
    """Truncate an UPPER string bound Iceberg-style: cut to the limit, then
    increment the last incrementable code point so the result sorts >= any
    string with the cut prefix. None when every char is at the max code
    point (no valid short upper bound exists — caller drops the bound)."""
    if not (isinstance(v, str) and len(v) > _STAT_STR_LIMIT):
        return v
    t = v[:_STAT_STR_LIMIT]
    for i in range(len(t) - 1, -1, -1):
        c = ord(t[i])
        if c >= 0x10FFFF:
            continue
        nxt = c + 1
        if 0xD800 <= nxt <= 0xDFFF:
            nxt = 0xE000  # skip the surrogate gap (unencodable)
        return t[:i] + chr(nxt)
    return None


def bucket_expr(key_col: str, num_buckets: int, dtype=None):
    """Deterministic hash bucket of the partition key.

    xxhash64 is a stable Spark built-in (same value across sessions/versions),
    so bucket assignment is reproducible — required for replay equivalence.

    `dtype` (the TABLE's partition-key type) must be passed when the input
    rows may carry a different-but-castable key type (e.g. an upstream that
    widened int->long): xxhash64 is width-sensitive (hashInt vs hashLong
    lanes), so hashing at the batch's own type would route rows to a bucket
    the table's readers never probe. The cast is a Catalyst no-op when the
    types already match.
    """
    col = F.col(key_col) if dtype is None else F.col(key_col).cast(dtype)
    return F.pmod(F.xxhash64(col), F.lit(num_buckets)).cast("int")


def bucket_expr_for(snap: "Snapshot"):
    return bucket_expr(snap.partition_key, snap.num_buckets)


@dataclass
class Snapshot:
    version: int
    schema_json: str
    num_buckets: int
    partition_key: str
    buckets: dict[str, list[str]]  # bucket id (str for JSON) -> base data files
    ledger: dict[str, int]  # batch_id -> version that committed it
    lineage: list[dict[str, Any]] = field(default_factory=list)
    parent: int | None = None
    committed_at: float = 0.0
    # merge-on-read delta files per bucket: winner rows (incl. tombstones)
    # appended by MOR commits, folded into base files by compact().
    # Iceberg v2 equality-delete analogue generalized to upsert deltas.
    deltas: dict[str, list[str]] = field(default_factory=dict)
    # full primary-key column list (partition_key is its routing prefix);
    # None only in pre-v2 metadata, where the transcripts default applies.
    key_columns: list[str] | None = None
    # bucket id -> manifest file holding that bucket's base/delta file lists
    # (Iceberg manifest-list analogue). Populated by the table's IO layer;
    # the root snapshot JSON stores ONLY these references, so its size is
    # O(num_buckets), independent of data-file count. Unchanged buckets
    # carry their manifest forward by reference across commits.
    manifest_paths: dict[str, str] = field(default_factory=dict)
    # True once the table has applied partial-update (op='P') events: data
    # files may then carry the __col_lsns per-column version vector and the
    # storage read schema includes it (older files null-fill). Never set on
    # tables that only see full-row events — their storage is unchanged.
    patch_cols: bool = False

    @property
    def keys(self) -> list[str]:
        if self.key_columns:
            return self.key_columns
        from ..schema import KEY_COLUMNS  # pre-v2 metadata back-compat

        return KEY_COLUMNS

    @property
    def schema(self) -> StructType:
        return StructType.fromJson(json.loads(self.schema_json))

    def all_files(self) -> list[str]:
        return [f for files in self.buckets.values() for f in files] + [
            f for files in self.deltas.values() for f in files
        ]

    def base_files(self, bucket_ids: list[int] | None = None) -> list[str]:
        keys = (
            [str(b) for b in bucket_ids] if bucket_ids is not None else list(self.buckets)
        )
        return [f for b in keys for f in self.buckets.get(b, [])]

    def delta_files(self, bucket_ids: list[int] | None = None) -> list[str]:
        keys = (
            [str(b) for b in bucket_ids] if bucket_ids is not None else list(self.deltas)
        )
        return [f for b in keys for f in self.deltas.get(b, [])]

    def to_json(self) -> str:
        """Root metadata: per-bucket MANIFEST REFERENCES, never file lists —
        root size stays O(num_buckets) however many data files exist."""
        return json.dumps(
            {
                "version": self.version,
                "schema": json.loads(self.schema_json),
                "num_buckets": self.num_buckets,
                "partition_key": self.partition_key,
                "manifests": self.manifest_paths,
                "ledger": self.ledger,
                "lineage": self.lineage,
                "parent": self.parent,
                "committed_at": self.committed_at,
                "key_columns": self.key_columns,
                "patch_cols": self.patch_cols,
            }
        )

    @staticmethod
    def from_json(s: str) -> "Snapshot":
        """Parse root metadata. buckets/deltas stay empty until the table's
        IO layer resolves the manifests (pre-manifest roots inline them)."""
        d = json.loads(s)
        return Snapshot(
            version=d["version"],
            schema_json=json.dumps(d["schema"]),
            num_buckets=d["num_buckets"],
            partition_key=d["partition_key"],
            buckets=d.get("buckets", {}),
            ledger=d["ledger"],
            lineage=d.get("lineage", []),
            parent=d.get("parent"),
            committed_at=d.get("committed_at", 0.0),
            deltas=d.get("deltas", {}),
            key_columns=d.get("key_columns"),
            manifest_paths=d.get("manifests", {}),
            patch_cols=d.get("patch_cols", False),
        )


# -- pure-python metadata readers (no SparkSession) ---------------------------
# Single source of truth for the on-disk layout, shared by SnapshotTable and
# session-free consumers (the lake_cdf data source plans from these on the
# driver): metadata/_current pointer, v{N:08d}.json roots, manifest JSONs,
# _changelog/v{N:08d}/_DONE markers.


def read_table_pointer(root: str) -> int:
    with open(os.path.join(root, "metadata", "_current")) as fh:
        return int(fh.read().strip())


def read_snapshot_dict(root: str, version: int) -> dict:
    with open(os.path.join(root, "metadata", f"v{version:08d}.json")) as fh:
        return json.load(fh)


def snapshot_manifest_paths(root: str, version: int) -> dict[str, str] | None:
    """bucket id -> manifest path, or None for pre-manifest roots (whose
    file lists are inlined in the snapshot JSON)."""
    d = read_snapshot_dict(root, version)
    m = d.get("manifests")
    return dict(m) if m else None


def manifest_file_set(path: str) -> set[str]:
    """All data files (base + deltas) named by one manifest."""
    with open(path) as fh:
        d = json.load(fh)
    return set(d.get("base", [])) | set(d.get("deltas", []))


def snapshot_file_set(root: str, version: int) -> set[str]:
    """Every data file of a snapshot, resolved through its manifests."""
    d = read_snapshot_dict(root, version)
    manifests = d.get("manifests") or {}
    if manifests:
        files: set[str] = set()
        for path in manifests.values():
            files |= manifest_file_set(path)
        return files
    files = set()
    for lst in (d.get("buckets") or {}).values():
        files.update(lst)
    for lst in (d.get("deltas") or {}).values():
        files.update(lst)
    return files


def changelog_data_dir(root: str, version: int) -> str:
    return os.path.join(root, "_changelog", f"v{version:08d}")


def changelog_data_files(root: str, version: int) -> list[str] | None:
    """Files of a materialized per-version changelog; None if that version
    was never materialized (distinct from [], a real empty changelog)."""
    d = changelog_data_dir(root, version)
    if not os.path.exists(os.path.join(d, "_DONE")):
        return None
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )


class ConcurrentCommitError(RuntimeError):
    """Another writer advanced the table between our read and our commit."""


class CommitConflictError(ConcurrentCommitError):
    """A concurrent commit touched the same buckets as this rewrite — the
    rewrite was computed against stale base files and cannot be rebased;
    the caller must recompute (Iceberg validation-failure analogue)."""


COMMIT_MAX_RETRIES = 5
# A version file claimed (os.link) by a writer that died before the pointer
# swap blocks that version number forever; claims older than this with the
# pointer still behind them are reclaimed by the next committer. Generous:
# the link->swap window is microseconds.
ORPHAN_CLAIM_TIMEOUT_SEC = 60.0


class SnapshotTable:
    """A CDC-upsert target table. Single logical writer (like the reference's
    pool-size-1 job executor, ``ONeo4jImporterHandler.java:35``), with an
    optimistic pointer check so a concurrent commit fails loudly instead of
    silently losing a snapshot.
    """

    def __init__(self, spark: SparkSession, root: str, commit_store=None):
        from .commitstore import LocalFSCommitStore

        self.spark = spark
        self.root = root
        # serialization primitives for {version claim, pointer swap} —
        # swap in ObjectStoreCommitStore for S3/GCS-class deployments
        # (lake/commitstore.py); default is the flock/hard-link protocol
        self.commit_store = commit_store or LocalFSCommitStore()
        self.meta_dir = os.path.join(root, "metadata")
        self.manifest_dir = os.path.join(root, "metadata", "manifests")
        self.data_dir = os.path.join(root, "data")
        # manifest files are immutable once written -> cache by path.
        # In steady state a commit touches few buckets, so loading the next
        # snapshot reads the root + only the handful of NEW manifests.
        self._manifest_cache: dict[str, tuple[list[str], list[str]]] = {}
        # per-data-file stats (rows, __lsn min/max, tombstone presence),
        # keyed by path (files are immutable). Populated by commits from
        # parquet footers and persisted inside manifests; used for
        # metadata-only pruning (vacuum_tombstones, file_stats()).
        self._stats_cache: dict[str, dict] = {}
        # decoded per-file key blooms (bytes, m, k) — decoded lazily from
        # the manifest's base64 on first probe; NEVER stored back into
        # _stats_cache (manifest stats must stay JSON-serializable)
        self._bloom_cache: dict[str, tuple[bytes, int, int]] = {}
        self._props_cache: dict | None = None

    # -- creation / loading -------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: StructType,
        partition_key: str,
        num_buckets: int = DEFAULT_NUM_BUCKETS,
        overwrite: bool = False,
        key_columns: list[str] | None = None,
        commit_store=None,
        bloom_fpp: float | None = None,
    ) -> "SnapshotTable":
        """Create an empty table. `overwrite=True` drops an existing one —
        the reference's `-o` flag (``ONeo4jImporter.java:105-124``).

        `key_columns` is the full primary key (defaults to the transcripts
        PK when its columns are present, else just the partition key); it is
        persisted in snapshot metadata so read-merge/MERGE paths never
        depend on a table-specific global.

        `bloom_fpp` (e.g. 0.01) enables per-file key bloom filters: every
        commit builds a bloom over the partition key of each new data file
        (one extra key-column-only scan of the freshly written files), and
        point lookups prove-skip files the key cannot be in — the pruning
        that min/max key ranges cannot do for MOR delta files or for base
        files compacted with ``cluster_by=<scan column>``. Off by default:
        it taxes the hot ingest path to speed the point-read path, a
        per-workload trade (see functions/bloom.py and BENCH/BASELINE.md
        for the measured costs).
        """
        if key_columns is None:
            from ..schema import KEY_COLUMNS

            names = {f.name for f in schema.fields}
            key_columns = (
                list(KEY_COLUMNS)
                if all(k in names for k in KEY_COLUMNS)
                else [partition_key]
            )
        if partition_key not in key_columns:
            raise ValueError(
                f"partition_key {partition_key!r} must be one of key_columns {key_columns}"
            )
        t = cls(spark, root, commit_store=commit_store)
        if os.path.exists(t.meta_dir):
            if not overwrite:
                raise FileExistsError(
                    f"table exists at {root}; pass overwrite=True to drop it"
                )
            shutil.rmtree(root)
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        snap = Snapshot(
            version=0,
            schema_json=schema.json(),
            num_buckets=num_buckets,
            partition_key=partition_key,
            buckets={},
            ledger={},
            lineage=[],
            parent=None,
            committed_at=time.time(),
            key_columns=list(key_columns),
        )
        t._write_snapshot(snap, expected_parent=None)
        if bloom_fpp is not None:
            t.set_table_props(bloom_fpp=float(bloom_fpp))
        return t

    @classmethod
    def load(
        cls, spark: SparkSession, root: str, commit_store=None
    ) -> "SnapshotTable":
        t = cls(spark, root, commit_store=commit_store)
        if not os.path.exists(t._pointer_path()):
            raise FileNotFoundError(f"no table at {root}")
        return t

    @classmethod
    def exists(cls, root: str) -> bool:
        return os.path.exists(os.path.join(root, "metadata", "_current"))

    # -- table properties (unversioned operational knobs) ---------------------

    def _props_path(self) -> str:
        return os.path.join(self.meta_dir, "table_props.json")

    def table_props(self) -> dict:
        """Operational table properties (Iceberg table-properties analogue,
        kept OUTSIDE snapshots: they tune maintenance/write behavior, never
        read semantics, so they don't need versioning). Currently:
        ``bloom_fpp`` — when set, every commit builds per-file key bloom
        filters at this false-positive rate (see functions/bloom.py)."""
        if self._props_cache is None:
            try:
                with open(self._props_path()) as fh:
                    self._props_cache = json.load(fh)
            except (FileNotFoundError, json.JSONDecodeError):
                self._props_cache = {}
        return self._props_cache

    def set_table_props(self, **props) -> dict:
        """Merge-set table properties (value None deletes a key). Atomic
        replace; last writer wins — acceptable for operational knobs."""
        cur = dict(self.table_props())
        for k, v in props.items():
            if v is None:
                cur.pop(k, None)
            else:
                cur[k] = v
        tmp = self._props_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(cur, fh)
        os.replace(tmp, self._props_path())
        self._props_cache = cur
        return cur

    def clone(
        self,
        dest_root: str,
        snapshot: "Snapshot | None" = None,
        commit_store=None,
    ) -> "SnapshotTable":
        """Zero-copy (shallow) clone at a snapshot: a NEW independent table
        whose v0 references this table's immutable data files by path
        (Delta SHALLOW CLONE / Iceberg snapshot-ref analogue) — pure
        metadata, no data IO regardless of table size, so cloning a 100 TB
        table for a dev/test/branching workflow costs milliseconds.

        Independence: the clone's own commits (CDC applies, compaction)
        write under ITS root; a COW rewrite of a borrowed bucket simply
        stops referencing the source's files. The clone's maintenance
        never deletes borrowed files (expire/vacuum carry an ownership
        guard: only paths under the table's own data dir are removed).
        The standard shallow-clone caveat applies in the OTHER direction:
        the source's expire_snapshots/vacuum can remove files the clone
        still references — retain the cloned snapshot on the source side
        for the clone's lifetime.

        The batch LEDGER is carried over, so replaying an already-applied
        batch into the clone is still an exactly-once no-op (a clone used
        as a CDC target resumes where the source's history left off);
        lineage records provenance ({cloned_from, source_version}).

        `snapshot` clones a time-travel point (default: current). Borrowed
        files' stats are carried into the clone's manifests so file
        skipping and metadata pruning keep working."""
        snap = snapshot or self.current()
        self._resolve_manifests(snap)
        dest = SnapshotTable(self.spark, dest_root, commit_store=commit_store)
        if os.path.exists(dest.meta_dir):
            raise FileExistsError(f"table exists at {dest_root}")
        os.makedirs(dest.meta_dir, exist_ok=True)
        os.makedirs(dest.data_dir, exist_ok=True)
        clone_snap = Snapshot(
            version=0,
            schema_json=snap.schema_json,
            num_buckets=snap.num_buckets,
            partition_key=snap.partition_key,
            buckets={b: list(fs) for b, fs in snap.buckets.items()},
            ledger=dict(snap.ledger),
            lineage=[
                {
                    "cloned_from": self.root,
                    "source_version": snap.version,
                    "commit_epoch": time.time(),
                }
            ],
            parent=None,
            committed_at=time.time(),
            deltas={b: list(fs) for b, fs in snap.deltas.items()},
            key_columns=list(snap.key_columns) if snap.key_columns else None,
            patch_cols=snap.patch_cols,
        )
        # borrowed files keep their stats -> the clone's manifests carry
        # them and lookup file-skipping / metadata pruning still work
        dest._stats_cache.update(
            {
                f: self._stats_cache[f]
                for f in snap.all_files()
                if f in self._stats_cache
            }
        )
        dest._write_snapshot(clone_snap, expected_parent=None)
        props = self.table_props()
        if props:  # operational knobs (e.g. bloom_fpp) carry to the clone
            dest.set_table_props(**props)
        return dest

    # -- refs: tags + branches (Iceberg named-references analogue) -------------
    #
    # A TAG pins a version by name (audit points, release cuts); a BRANCH is
    # a shallow clone under `root/branches/<name>` whose BASE version is
    # pinned on this table for the branch's lifetime. Pins are honored by
    # expire_snapshots (a pinned version is never expired, so the files a
    # branch borrows stay alive); vacuum_orphans already treats every
    # retained snapshot's files as live. The write-audit-publish flow:
    #
    #     br = table.create_branch("wap")      # metadata-only fork
    #     apply_changes(feed, br, ...)         # stage risky work on br
    #     ... audit br.read() ...              # verify before exposure
    #     table.publish_branch("wap")          # fast-forward onto main
    #
    # Refs mutations are tiny metadata writes serialized under the table's
    # commit mutex; expire_snapshots reads refs at entry (maintenance and
    # ref churn are operator-plane — same single-maintainer assumption as
    # the rest of maintain()).

    def _refs_path(self) -> str:
        return os.path.join(self.meta_dir, "refs.json")

    def refs(self) -> dict:
        """``{"tags": {name: version}, "branches": {name: {"base_version":
        v}}}`` — always returns both keys."""
        try:
            with open(self._refs_path()) as fh:
                d = json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError):
            d = {}
        d.setdefault("tags", {})
        d.setdefault("branches", {})
        return d

    def _mutate_refs(self, fn) -> dict:
        with self.commit_store.mutex(self.meta_dir):
            refs = self.refs()
            fn(refs)
            tmp = self._refs_path() + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(refs, fh)
            os.replace(tmp, self._refs_path())
        return refs

    @staticmethod
    def _check_ref_name(name: str) -> None:
        # all-dots names ('.', '..') would make the branch root escape
        # root/branches/ — drop_branch would then rmtree the table itself
        if (
            not name
            or name.strip(".") == ""
            or not all(c.isalnum() or c in "._-" for c in name)
        ):
            raise ValueError(
                f"ref name {name!r} must be non-empty [A-Za-z0-9._-] "
                "and not all dots"
            )

    def create_tag(self, name: str, snapshot: "Snapshot | None" = None) -> int:
        """Pin `snapshot` (default: current) under a name. The pinned
        version survives expire_snapshots until drop_tag. Re-creating an
        existing tag at a different version raises (tags are immutable,
        Iceberg semantics); at the same version it is a no-op."""
        self._check_ref_name(name)
        version = (snapshot or self.current()).version

        def mutate(refs):
            prev = refs["tags"].get(name)
            if prev is not None and prev != version:
                raise ValueError(
                    f"tag {name!r} already pins v{prev} (tags are immutable; "
                    "drop_tag first)"
                )
            refs["tags"][name] = version

        self._mutate_refs(mutate)
        return version

    def drop_tag(self, name: str) -> None:
        self._mutate_refs(lambda refs: refs["tags"].pop(name, None))

    def snapshot_at_tag(self, name: str) -> Snapshot:
        tags = self.refs()["tags"]
        if name not in tags:
            raise KeyError(f"no tag {name!r} (tags: {sorted(tags)})")
        return self.snapshot_at(tags[name])

    def _branch_root(self, name: str) -> str:
        return os.path.join(self.root, "branches", name)

    def create_branch(
        self, name: str, snapshot: "Snapshot | None" = None
    ) -> "SnapshotTable":
        """Fork a branch at `snapshot` (default: current): a zero-copy
        shallow clone under ``root/branches/<name>`` — pure metadata, so
        forking a 100 TB table costs milliseconds — whose base version is
        PINNED on this table (expire_snapshots keeps it and its files
        alive) until publish_branch/drop_branch. The branch is a full
        SnapshotTable: apply_changes/merge_into/DML/compact all work on it
        unchanged, and its commits never touch this table's data."""
        self._check_ref_name(name)
        snap = snapshot or self.current()

        def mutate(refs):
            if name in refs["branches"]:
                raise ValueError(f"branch {name!r} already exists")
            refs["branches"][name] = {"base_version": snap.version}

        self._mutate_refs(mutate)
        try:
            return self.clone(self._branch_root(name), snapshot=snap)
        except BaseException:
            self._mutate_refs(lambda refs: refs["branches"].pop(name, None))
            raise

    def branch(self, name: str) -> "SnapshotTable":
        if name not in self.refs()["branches"]:
            raise KeyError(
                f"no branch {name!r} (branches: {sorted(self.refs()['branches'])})"
            )
        return SnapshotTable.load(
            self.spark, self._branch_root(name), commit_store=self.commit_store
        )

    def drop_branch(self, name: str) -> None:
        """Discard a branch: unpin its base and delete its tree (its own
        commits and data files; borrowed base files belong to this table
        and are untouched). Idempotent; only a tree the refs actually
        tracked is ever removed."""
        self._check_ref_name(name)
        removed: dict = {}

        def mutate(refs):
            removed["was"] = refs["branches"].pop(name, None)

        self._mutate_refs(mutate)
        if removed.get("was") is not None:
            shutil.rmtree(self._branch_root(name), ignore_errors=True)

    def publish_branch(self, name: str, *, drop: bool = True) -> Snapshot:
        """Fast-forward the branch's audited state onto this table as ONE
        atomic commit (Iceberg `fast_forward` / WAP publish).

        Requires this table's head to still be the branch's base version —
        a concurrent main commit raises ConcurrentCommitError (publish
        would otherwise silently drop it; to merge diverged histories,
        replay the branch's changelog through apply_changes instead, which
        resolves by LWW). Data files the branch wrote are HARD-LINKED into
        this table's data dir (immutable files; copy fallback across
        devices), so after publish main owns every file it references and
        the branch can be dropped. The branch's ledger carries over —
        batch ids applied on the branch stay exactly-once on main after
        publish — and branch-side schema evolution propagates (old main
        files null-backfill, the standard evolution read path). Crash
        between linking and the commit leaves only orphan links that
        vacuum_orphans sweeps; re-running publish is idempotent up to the
        pointer CAS."""
        entry = self.refs()["branches"].get(name)
        if entry is None:
            raise KeyError(f"no branch {name!r}")
        base = entry["base_version"]
        br = self.branch(name)
        bsnap = br.current()
        if bsnap.version == 0:  # no branch commits: nothing to publish
            if drop:
                self.drop_branch(name)
            return self.current()
        head = self.current()
        if head.version != base:
            raise ConcurrentCommitError(
                f"publish_branch({name!r}) is fast-forward-only: main moved "
                f"v{base} -> v{head.version} since the fork; use "
                f"merge_branch({name!r}) to LWW-merge diverged histories, "
                "or re-branch"
            )
        br_data = br.data_dir.rstrip(os.sep) + os.sep
        br_stats = br.file_stats(bsnap)

        def adopt(f: str) -> str:
            if not f.startswith(br_data):
                # borrowed from main at fork time — already ours; carry the
                # branch-manifest stats in case main hasn't cached them
                if f in br_stats:
                    self._stats_cache.setdefault(f, br_stats[f])
                return f
            target = os.path.join(self.data_dir, f[len(br_data):])
            if not os.path.exists(target):
                os.makedirs(os.path.dirname(target), exist_ok=True)
                try:
                    os.link(f, target)
                except OSError:
                    shutil.copy2(f, target)
            if f in br_stats:
                self._stats_cache[target] = br_stats[f]
            return target

        base_ledger = self.snapshot_at(base).ledger
        new_version = head.version + 1
        snap = Snapshot(
            version=new_version,
            schema_json=bsnap.schema_json,
            num_buckets=bsnap.num_buckets,
            partition_key=bsnap.partition_key,
            buckets={b: [adopt(f) for f in fs] for b, fs in bsnap.buckets.items()},
            ledger={
                k: (v if k in base_ledger else new_version)
                for k, v in bsnap.ledger.items()
            },
            lineage=[
                {
                    "published_branch": name,
                    "branch_version": bsnap.version,
                    "base_version": base,
                    "commit_epoch": time.time(),
                }
            ],
            parent=head.version,
            committed_at=time.time(),
            deltas={b: [adopt(f) for f in fs] for b, fs in bsnap.deltas.items()},
            key_columns=list(bsnap.keys),
            patch_cols=bsnap.patch_cols,
        )
        self._write_snapshot(snap, expected_parent=base)
        if drop:
            self.drop_branch(name)
        return snap

    def merge_branch(self, name: str, *, drop: bool = True, mode: str = "mor"):
        """LWW merge of a branch whose base this table has moved past
        (where publish_branch refuses): replay the branch's net per-key
        changes since the fork onto main through the envelope replication
        path (`sources.debezium.replicate_changelog`) as ONE exactly-once
        batch. Branch rows carry their real winning lsns, so keys edited
        on BOTH sides since the fork resolve by last-writer-wins exactly
        like any two concurrent CDC writers — a semantic merge, not a
        three-way diff. O(changed keys), never O(table). Unlike publish,
        branch-side DATA is rewritten into main's files by the apply
        (so the result is main-owned by construction).

        Returns the apply's `ApplyResult`."""
        if name not in self.refs()["branches"]:
            raise KeyError(f"no branch {name!r}")
        br = self.branch(name)
        bsnap = br.current()
        if bsnap.version > 0:
            from ..sources.debezium import replicate_changelog

            result = replicate_changelog(
                br, self, 0, bsnap.version,
                batch_id=f"__merge__{name}@{bsnap.version}", mode=mode,
            )
        else:
            result = None  # nothing staged
        if drop:
            self.drop_branch(name)
        return result

    # -- snapshot plumbing ---------------------------------------------------

    def _pointer_path(self) -> str:
        return os.path.join(self.meta_dir, "_current")

    def current(self) -> Snapshot:
        return self.snapshot_at(read_table_pointer(self.root))

    def snapshot_at(self, version: int) -> Snapshot:
        """Time travel: read any retained snapshot (Iceberg `VERSION AS OF`)."""
        path = os.path.join(self.meta_dir, f"v{version:08d}.json")
        with open(path) as fh:
            snap = Snapshot.from_json(fh.read())
        self._resolve_manifests(snap)
        return snap

    def snapshot_as_of(self, ts: float) -> Snapshot:
        """Time travel by wall clock (Iceberg `TIMESTAMP AS OF`): the newest
        RETAINED snapshot committed at or before `ts` (epoch seconds, the
        unit `committed_at` is persisted in). Metadata-only — walks retained
        versions newest-first and stops at the first match, so the common
        recent-as-of case reads one or two snapshot JSONs. Raises when the
        as-of point predates retention (`expire_snapshots` horizon), same
        contract as Iceberg's.

        Compose with the snapshot-taking readers for as-of queries:
        ``table.read(table.snapshot_as_of(ts))``."""
        with open(self._pointer_path()) as fh:
            pointed = int(fh.read().strip())
        versions = sorted(
            v
            for v in (
                int(f[1:9])
                for f in os.listdir(self.meta_dir)
                if f.startswith("v") and f.endswith(".json")
            )
            if v <= pointed  # orphan claims are not committed history
        )
        for v in reversed(versions):
            snap = self.snapshot_at(v)
            if snap.committed_at <= ts:
                return snap
        earliest = (
            self.snapshot_at(versions[0]).committed_at if versions else None
        )
        raise ValueError(
            f"no retained snapshot committed at or before ts={ts} "
            f"(earliest retained committed_at={earliest}; older history "
            f"was removed by expire_snapshots)"
        )

    # -- manifest IO (Iceberg manifest-list analogue) --------------------------

    def _read_manifest(self, path: str) -> tuple[list[str], list[str]]:
        got = self._manifest_cache.get(path)
        if got is None:
            with open(path) as fh:
                d = json.load(fh)
            got = (d.get("base", []), d.get("deltas", []))
            self._manifest_cache[path] = got
            # stats ride inside the manifest (Iceberg data-file stats
            # analogue); absent for pre-stats manifests
            stats = d.get("stats", {})
            if d.get("stats_v", 1) < 2:
                # v1 manifests collapsed "no __deleted footer stats" into
                # False; their False is really UNKNOWN — keep only True
                # trustworthy so maintenance never prunes on a v1 False
                stats = {
                    f: {**s, "tombstones": True if s.get("tombstones") else None}
                    for f, s in stats.items()
                }
            self._stats_cache.update(stats)
        return got

    @staticmethod
    def _footer_stats(paths: list[str], key_col: str | None = None) -> dict[str, dict]:
        """Per-file stats from parquet footers: row count, __lsn min/max,
        tombstone presence, (when `key_col` is given) the partition key's
        min/max — the in-bucket file-skipping index for point lookups —
        and min/max bounds for EVERY other top-level primitive column
        under ``"cols"`` (the Iceberg data-file column-stats analogue;
        what ``read_colrange`` prunes on for time-windowed reads; the
        reference indexes non-key properties for the same query class,
        ``ONeo4jImporterVerticesAndEdgesMigrator.java:394-401``).
        Driver-side footer reads, O(files per commit) — on a real cluster
        these come back from the write tasks instead; the footer read is
        the single-node stand-in (same information)."""
        import pyarrow.parquet as pq

        # manifest stats are JSON; only record bounds whose normalized
        # python type round-trips exactly (str/int/float; timestamps are
        # normalized to epoch-micros ints, dates to ISO strings — both
        # order-preserving). Parquet string stats may be TRUNCATED, but
        # truncation only ever widens the range (min rounded down, max
        # rounded up), so stored bounds stay valid bounds; our own
        # truncation (_trunc_lo/_trunc_hi) follows the same discipline.
        out: dict[str, dict] = {}
        for p in paths:
            try:
                md = pq.ParquetFile(p).metadata
            except Exception:
                continue  # stats are an optimization, never a correctness gate
            lsn_min = lsn_max = None
            tomb = False
            del_rgs = 0
            # col -> [min, max, row groups with stats] in normalized domain
            bounds: dict[str, list] = {}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        continue
                    name = col.path_in_schema
                    if name == LSN_COL:
                        lsn_min = st.min if lsn_min is None else min(lsn_min, st.min)
                        lsn_max = st.max if lsn_max is None else max(lsn_max, st.max)
                    elif name == DELETED_COL:
                        del_rgs += 1
                        tomb = tomb or bool(st.max)
                    elif "." not in name:  # top-level primitives only
                        lo = _stat_norm(st.min)
                        hi = _stat_norm(st.max)
                        if lo is None or hi is None:
                            bounds.pop(name, None)  # poison: stays unknown
                            bounds[name] = [None, None, -1]
                            continue
                        b = bounds.setdefault(name, [lo, hi, 0])
                        if b[2] >= 0:
                            b[0] = min(b[0], lo)
                            b[1] = max(b[1], hi)
                            b[2] += 1
            # tombstones: True / False (every row group had stats) / None
            # (UNKNOWN — some row group lacked __deleted stats; consumers
            # must treat unknown conservatively, never as "no tombstones")
            out[p] = {
                "rows": md.num_rows,
                "lsn_min": lsn_min,
                "lsn_max": lsn_max,
                "tombstones": True
                if tomb
                else (False if del_rgs == md.num_row_groups else None),
            }
            # bounds are only trustworthy if EVERY row group had them —
            # a partial range would wrongly exclude files on read
            cols = {}
            for name, (lo, hi, rgs) in bounds.items():
                if rgs != md.num_row_groups:
                    continue
                lo, hi = _trunc_lo(lo), _trunc_hi(hi)
                if hi is not None:  # hi=None: increment overflow -> unknown
                    cols[name] = [lo, hi]
            if cols:
                out[p]["cols"] = cols
            if key_col is not None and key_col in cols:
                out[p]["key_min"], out[p]["key_max"] = cols[key_col]
        return out

    def _build_key_blooms(
        self, files: list[str], key_col: str, fpp: float
    ) -> int:
        """Build a per-file bloom filter over `key_col` for each data file
        and merge it into the stats cache (persisted by the next manifest
        write). ONE shuffle-free Spark job: the key column of the freshly
        written files (column-pruned, page-cache hot) is hashed JVM-side
        with xxhash64 — the SAME hash the driver reproduces at probe
        time — and each partition packs PARTIAL bitsets for the files it
        saw, which the driver OR-merges. No exchange is needed because a
        bloom under fixed (m, k) is a commutative monoid and (m, k) are
        pre-derived on the driver from the footer row counts the commit
        already collected. Returns the number of filters built. See
        functions/bloom.py for why this beats parquet's own bloom pages
        here (driver-side metadata planning, no executor round-trip)."""
        from ..functions import bloom as _bloomlib

        # (m, k) per file from the already-known footer row counts;
        # files with unknown counts or a uselessly saturated filter are
        # skipped (kept conservatively at lookup). Keyed by the FULL path —
        # one write task reuses its part-file name under every
        # __bucket=N/ dir it emits, so basenames collide across buckets.
        params: dict[str, tuple[int, int]] = {}
        for f in files:
            rows = (self._stats_cache.get(f) or {}).get("rows")
            if not rows:
                continue
            m, k = _bloomlib.bloom_params(int(rows), float(fpp))
            if _bloomlib.realized_fpp(int(rows), m, k) > _bloomlib.USELESS_FPP:
                continue
            params[f] = (m, k)
        if not params:
            return 0

        def _partials(frames):
            from urllib.parse import unquote as _unq
            from urllib.parse import urlparse as _urlp

            import numpy as _np
            import pandas as _pd

            acc: dict[str, _np.ndarray] = {}
            for pdf in frames:
                for uri, g in pdf.groupby("__f", sort=False):
                    path = _unq(_urlp(uri).path)
                    mk = params.get(path)
                    if mk is None:
                        continue
                    m, k = mk
                    bits = _np.frombuffer(
                        _bloomlib.build_bloom(g["__h"].to_numpy(), m, k),
                        dtype=_np.uint8,
                    )
                    cur = acc.get(path)
                    acc[path] = bits if cur is None else (cur | bits)
            yield _pd.DataFrame(
                {
                    "f": list(acc),
                    "b64": [
                        _bloomlib.encode_bloom(a.tobytes()) for a in acc.values()
                    ],
                }
            )

        rows = (
            self.spark.read.parquet(*params)
            .select(
                F.input_file_name().alias("__f"),
                F.xxhash64(F.col(key_col)).alias("__h"),
            )
            .mapInPandas(_partials, schema="f string, b64 string")
            .collect()
        )
        merged: dict[str, Any] = {}
        for r in rows:
            bits = np.frombuffer(_bloomlib.decode_bloom(r["b64"]), dtype=np.uint8)
            cur = merged.get(r["f"])
            merged[r["f"]] = bits if cur is None else (cur | bits)
        for path, bits in merged.items():
            m, k = params[path]
            st = self._stats_cache.setdefault(path, {})
            st["key_bloom"] = _bloomlib.encode_bloom(bits.tobytes())
            st["key_bloom_m"] = m
            st["key_bloom_k"] = k
        return len(merged)

    def _resolve_manifests(self, snap: Snapshot) -> None:
        """Populate the in-memory buckets/deltas dicts from manifest refs
        (no-op for pre-manifest roots that inline them). Idempotent-cheap:
        a snapshot is resolved at most once — repeated calls (every
        _lookup_files probe goes through here) must not rebuild the full
        O(files) bucket map each time."""
        if not snap.manifest_paths:
            return
        if getattr(snap, "_manifests_resolved", False):
            return
        snap._manifests_resolved = True
        snap.buckets, snap.deltas = {}, {}
        for b, path in snap.manifest_paths.items():
            base, deltas = self._read_manifest(path)
            if base:
                snap.buckets[b] = base
            if deltas:
                snap.deltas[b] = deltas

    def _write_manifests(self, snap: Snapshot) -> None:
        """Write one manifest per bucket whose content changed; unchanged
        buckets reuse the previous snapshot's manifest file by reference —
        commit metadata IO is O(touched buckets), root size O(num_buckets)."""
        os.makedirs(self.manifest_dir, exist_ok=True)
        prev_paths: dict[str, str] = dict(snap.manifest_paths)
        if snap.parent is not None and not prev_paths:
            try:
                prev_paths = self.snapshot_at(snap.parent).manifest_paths
            except FileNotFoundError:
                prev_paths = {}
        out: dict[str, str] = {}
        for b in set(snap.buckets) | set(snap.deltas):
            content = (snap.buckets.get(b, []), snap.deltas.get(b, []))
            prev = prev_paths.get(b)
            if prev is not None and self._read_manifest(prev) == content:
                out[b] = prev  # carried forward by reference
                continue
            path = os.path.join(
                self.manifest_dir,
                f"m-{snap.version:08d}-{b}-{uuid.uuid4().hex[:8]}.json",
            )
            stats = {
                f: self._stats_cache[f]
                for f in content[0] + content[1]
                if f in self._stats_cache
            }
            tmp = path + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(
                    {
                        "base": content[0],
                        "deltas": content[1],
                        "stats": stats,
                        "stats_v": 2,  # v2: tombstones is 3-state (see _footer_stats)
                    },
                    fh,
                )
            os.replace(tmp, path)
            self._manifest_cache[path] = content
            out[b] = path
        snap.manifest_paths = out

    def _write_snapshot(self, snap: Snapshot, expected_parent: int | None) -> None:
        """Serialize the commit through the table's CommitStore
        (lake/commitstore.py — local-FS flock/hard-link by default,
        conditional-PUT object stores via ObjectStoreCommitStore):

        1. cheap pre-check — pointer must still name the parent we read;
        2. atomic CLAIM of the version number — put-if-absent of the
           immutable snapshot object; a lost race can never overwrite or
           delete the winner's snapshot. Claim, orphan reclaim (liveness:
           a claimant that died between claim and swap must not block the
           version number forever) and the pointer swap run under the
           store's critical section, which FENCES a stalled claimant —
           it cannot wake up and swap the pointer to a version object
           that was reclaimed out from under it (TOCTOU);
        3. fencing recheck (our claim is still OUR object) then the
           pointer CAS parent -> version: the atomic swap IS the commit.
        """
        self._write_manifests(snap)
        store = self.commit_store
        path = os.path.join(self.meta_dir, f"v{snap.version:08d}.json")
        ptr = self._pointer_path()
        if expected_parent is not None:
            cur = store.read_pointer(ptr)
            if cur is not None and cur != expected_parent:
                raise ConcurrentCommitError(
                    f"expected parent v{expected_parent}, pointer moved to v{cur}"
                )
        content = snap.to_json()
        try:
            with store.mutex(self.meta_dir):
                token = store.claim_version(path, content)
                if token is None:
                    if self._reclaim_orphan_claim(snap.version, path):
                        token = store.claim_version(path, content)
                        if token is None:
                            raise ConcurrentCommitError(
                                f"version v{snap.version} was re-claimed concurrently"
                            )
                    else:
                        raise ConcurrentCommitError(
                            f"version v{snap.version} was claimed by a concurrent writer"
                        )
                # fencing recheck: our claim must still be OUR object (a
                # mutex timeout + lease break could otherwise let a reclaim
                # slip between our claim and this swap)
                if not store.claim_is_ours(path, token):
                    raise ConcurrentCommitError(
                        f"claim of v{snap.version} was reclaimed before the swap"
                    )
                if not store.swap_pointer(ptr, snap.version, expected_parent):
                    raise ConcurrentCommitError(
                        f"pointer moved before v{snap.version}'s swap"
                    )
        except TimeoutError as e:
            raise ConcurrentCommitError(str(e)) from None

    def _reclaim_orphan_claim(self, version: int, path: str) -> bool:
        """True if `path` was a crashed writer's claim (version AHEAD of the
        pointer, older than the timeout) and was removed. Caller must hold
        the store's commit mutex: the pointer re-check and the remove must
        be atomic w.r.t. a stalled claimant waking up to swap the pointer."""
        store = self.commit_store
        pointed = store.read_pointer(self._pointer_path())
        if pointed is None or version <= pointed:
            return False  # a committed snapshot (or fresh table), never reclaim
        age = store.claim_age(path)
        if age is None or age < ORPHAN_CLAIM_TIMEOUT_SEC:
            return False  # may be a live writer between claim and swap
        store.delete_claim(path)
        return True

    def _commit_retry(
        self,
        build,
        batch_id: str | None,
        out_dir: str | None = None,
        max_retries: int = COMMIT_MAX_RETRIES,
    ) -> Snapshot:
        """Multi-writer commit loop (Iceberg commit-retry analogue): the data
        files are already on disk — only the METADATA is rebased onto
        whatever snapshot is current at each attempt. `build(parent)` returns
        the candidate snapshot for that parent, or raises CommitConflictError
        when the rebase is semantically impossible (overlapping COW buckets).
        A concurrent commit of the SAME batch_id turns this commit into a
        replay no-op (the orphaned data files are removed)."""
        attempt = 0
        while True:
            parent = self.current()
            if batch_id is not None and str(batch_id) in parent.ledger:
                if out_dir and os.path.isdir(out_dir):
                    shutil.rmtree(out_dir, ignore_errors=True)
                return parent
            snap = build(parent)
            try:
                self._write_snapshot(snap, expected_parent=parent.version)
                return snap
            except ConcurrentCommitError:
                attempt += 1
                if attempt > max_retries:
                    raise
                time.sleep(min(0.1 * attempt, 1.0))

    # -- read path ------------------------------------------------------------

    def storage_schema(
        self, schema: StructType, patch_cols: bool = False
    ) -> StructType:
        """Payload schema + persisted row-metadata columns. `patch_cols`
        appends the per-column version vector (tables that applied partial
        updates; files written before the first patch null-fill it)."""
        fields = list(schema.fields) + [
            StructField(LSN_COL, LongType(), False),
            StructField(DELETED_COL, BooleanType(), False),
        ]
        if patch_cols:
            fields.append(StructField(COL_LSNS_COL, StringType(), True))
        return StructType(fields)

    def read(self, snapshot: Snapshot | None = None, raw: bool = False) -> DataFrame:
        """Full-table scan at a snapshot (default: current).

        raw=True keeps tombstone rows and the __lsn/__deleted metadata
        columns (the MERGE path needs them); default hides both. When delta
        files exist (merge-on-read), base and deltas are LWW-merged per key
        — raw or not, the result always has ONE row per key.
        """
        snap = snapshot or self.current()
        return self._read_merged(None, snap, raw)

    def read_buckets(
        self,
        bucket_ids: list[int],
        snapshot: Snapshot | None = None,
        raw: bool = False,
    ) -> DataFrame:
        """Pruned scan: only the named buckets' files (MERGE fast path)."""
        snap = snapshot or self.current()
        return self._read_merged(bucket_ids, snap, raw)

    def _read_merged(
        self, bucket_ids: list[int] | None, snap: Snapshot, raw: bool
    ) -> DataFrame:
        return self._merged_from_files(
            snap.base_files(bucket_ids), snap.delta_files(bucket_ids), snap, raw
        )

    def _merged_from_files(
        self,
        base_files: list[str],
        delta_files: list[str],
        snap: Snapshot,
        raw: bool,
    ) -> DataFrame:
        base = self._read_files(base_files, snap.schema, snap.patch_cols)
        if delta_files:
            # merge-on-read: one argmax-by-__lsn shuffle over base ∪ deltas.
            # Key invariant: base has ≤1 row/key; deltas may carry several.
            deltas = self._read_files(delta_files, snap.schema, snap.patch_cols)
            merged = self._argmax_rows(base.unionByName(deltas), snap.keys)
        else:
            merged = base
        if raw:
            return merged
        return merged.filter(~F.col(DELETED_COL)).drop(*META_COLS)

    def lookup(
        self, key_values: dict[str, Any], snapshot: Snapshot | None = None
    ) -> DataFrame:
        """Point lookup by (a prefix of) the primary key — the reference's
        index point-read (``OGraphCommands.java:109-119``) as a user API.

        Must include the partition key; routes to its ONE hash bucket and
        reads only that bucket's base+delta files (O(bucket), never
        O(table)), then filters to the requested key values. LWW-merged,
        tombstones hidden — exactly what `read()` would return for these
        keys, at a fraction of the IO.
        """
        snap = snapshot or self.current()
        if snap.partition_key not in key_values:
            raise ValueError(
                f"lookup requires the partition key {snap.partition_key!r}; "
                f"got {sorted(key_values)}"
            )
        unknown = [k for k in key_values if k not in snap.keys]
        if unknown:
            raise ValueError(f"not key columns: {unknown} (keys: {snap.keys})")
        types = {f.name: f.dataType for f in snap.schema.fields}
        bucket = self._route_bucket(
            key_values[snap.partition_key], types[snap.partition_key], snap.num_buckets
        )
        base_files, delta_files, _skipped = self._lookup_files(
            bucket, key_values[snap.partition_key], snap
        )
        df = self._merged_from_files(base_files, delta_files, snap, raw=False)
        for k, v in key_values.items():
            df = df.filter(F.col(k) == F.lit(v).cast(types[k]))
        return df

    def lookup_many(
        self, keys: list[dict[str, Any]], snapshot: Snapshot | None = None
    ) -> DataFrame:
        """Batched point lookup: N primary keys in ONE Spark job. Driver
        routes every key to its bucket (pure-python xxhash64) and unions
        only the files whose key range covers at least one requested key —
        IO is O(files containing the requested keys), never O(table) and
        never N separate jobs. The read is LWW-merged once over the
        unioned file set (sound: each key's rows live only in its covering
        files, which are all included), then a broadcast semi-join against
        the requested key tuples filters to exactly the asked-for rows.

        Every dict must use the same key columns, include the partition
        key, and use only primary-key columns — same contract as
        `lookup`, which this is the amortized form of (N round-trips
        -> 1)."""
        snap = snapshot or self.current()
        if not keys:
            return self.spark.createDataFrame([], snap.schema)
        cols = sorted(keys[0])
        for k in keys:
            if sorted(k) != cols:
                raise ValueError(
                    f"all lookups must use the same key columns; got {sorted(k)} vs {cols}"
                )
        if snap.partition_key not in cols:
            raise ValueError(
                f"lookup requires the partition key {snap.partition_key!r}; got {cols}"
            )
        unknown = [c for c in cols if c not in snap.keys]
        if unknown:
            raise ValueError(f"not key columns: {unknown} (keys: {snap.keys})")
        types = {f.name: f.dataType for f in snap.schema.fields}
        pk_type = types[snap.partition_key]
        base_files: set[str] = set()
        delta_files: set[str] = set()
        for k in keys:
            v = k[snap.partition_key]
            bucket = self._route_bucket(v, pk_type, snap.num_buckets)
            kb, kd, _ = self._lookup_files(bucket, v, snap)
            base_files.update(kb)
            delta_files.update(kd)
        df = self._merged_from_files(
            sorted(base_files), sorted(delta_files), snap, raw=False
        )
        from pyspark.sql.types import StructType as _ST

        key_schema = _ST([f for f in snap.schema.fields if f.name in cols])
        key_df = self.spark.createDataFrame(
            [tuple(k[f.name] for f in key_schema.fields) for k in keys],
            key_schema,
        )
        return df.join(F.broadcast(key_df), on=list(cols), how="left_semi")

    def read_keyrange(
        self, lo: Any, hi: Any, snapshot: Snapshot | None = None
    ) -> DataFrame:
        """Key-range scan: live rows with lo <= partition_key <= hi,
        reading only the files whose recorded key min/max OVERLAPS the
        range — hash bucketing spreads a key range across every bucket,
        but the per-file bounds (tight after sort-clustered compaction)
        still skip the files that cannot contain it. Files without bounds
        are read conservatively; the residual predicate filters exactly.

        Sound for the LWW merge: every storage row for a key in [lo, hi]
        lives in files whose range covers that key, and all such files
        overlap [lo, hi] — the winner for every in-range key is computed
        over its full file set."""
        snap = snapshot or self.current()
        self._resolve_manifests(snap)

        def overlaps(f: str) -> bool:
            s = self._stats_cache.get(f)
            if not s:
                return True
            kmin, kmax = s.get("key_min"), s.get("key_max")
            if kmin is None or kmax is None:
                return True
            try:
                return not (kmax < lo or kmin > hi)
            except TypeError:
                return True
        base = [f for f in snap.base_files(None) if overlaps(f)]
        deltas = [f for f in snap.delta_files(None) if overlaps(f)]
        df = self._merged_from_files(base, deltas, snap, raw=False)
        pk_type = {f.name: f.dataType for f in snap.schema.fields}[
            snap.partition_key
        ]
        pk = F.col(snap.partition_key)
        return df.filter(
            (pk >= F.lit(lo).cast(pk_type)) & (pk <= F.lit(hi).cast(pk_type))
        )

    def read_colrange(
        self, col: str, lo: Any, hi: Any, snapshot: Snapshot | None = None
    ) -> DataFrame:
        """Non-key column range scan (time-windowed reads): live rows with
        lo <= col <= hi, skipping files whose recorded column bounds
        cannot overlap the range. The lake analogue of the reference's
        non-key NOTUNIQUE index used for provenance queries
        (``ONeo4jImporterVerticesAndEdgesMigrator.java:394-401``); Iceberg
        column-stats file skipping is the format analogue.

        SOUNDNESS under the LWW merge: a non-key predicate says nothing
        about WHERE a key's other storage rows live, so pruning is only
        legal where each key has at most ONE storage row — i.e. in
        buckets with no delta files (base files hold <=1 row/key by
        invariant). Buckets that currently carry deltas are read in full
        and resolved normally; compaction restores their skipping. The
        residual predicate filters exactly either way.

        For timestamp/date columns, lo/hi accept python datetime/date or
        ISO strings. Compaction clusters files by primary key, so skipping
        is effective when the column correlates with the key (the common
        time-series shape: conversations are contiguous in time); for
        uncorrelated columns it degrades to a full scan, never to a wrong
        answer."""
        import datetime as _dt

        from pyspark.sql.types import DateType, TimestampType

        snap = snapshot or self.current()
        if col == snap.partition_key:
            return self.read_keyrange(lo, hi, snapshot=snap)
        types = {f.name: f.dataType for f in snap.schema.fields}
        if col not in types:
            raise ValueError(f"not a table column: {col!r}")
        self._resolve_manifests(snap)

        def qnorm(v):
            if isinstance(v, str) and isinstance(types[col], TimestampType):
                v = _dt.datetime.fromisoformat(v)
            if isinstance(v, str) and isinstance(types[col], DateType):
                v = _dt.date.fromisoformat(v)
            return _stat_norm(v)

        nlo, nhi = qnorm(lo), qnorm(hi)

        def overlaps(f: str) -> bool:
            if nlo is None or nhi is None:
                return True  # unnormalizable query bound: no skipping
            s = self._stats_cache.get(f)
            b = (s or {}).get("cols", {}).get(col)
            if not b or b[0] is None or b[1] is None:
                return True  # no recorded bounds: conservative keep
            try:
                return not (b[1] < nlo or b[0] > nhi)
            except TypeError:
                return True
        base: list[str] = []
        deltas: list[str] = []
        for b in set(snap.buckets) | set(snap.deltas):
            dfs = snap.deltas.get(b, [])
            bfs = snap.buckets.get(b, [])
            if dfs:
                # merge-on-read bucket: keys span base+delta files — no
                # file-level pruning on a non-key column is sound here
                base.extend(bfs)
                deltas.extend(dfs)
            else:
                base.extend(f for f in bfs if overlaps(f))
        df = self._merged_from_files(sorted(base), sorted(deltas), snap, raw=False)
        c = F.col(col)
        ctype = types[col]
        return df.filter(
            (c >= F.lit(lo).cast(ctype)) & (c <= F.lit(hi).cast(ctype))
        )

    def _route_bucket(self, value: Any, pk_type, num_buckets: int) -> int:
        """Bucket id for a partition-key literal. The literal MUST be
        hashed at the column's declared type: xxhash64 is width-sensitive
        (hash of int 42 != hash of long 42), and bucket_expr hashes the
        column at its table type — an uncast python literal would route
        non-string keys to the wrong bucket and silently return empty.
        The hash runs DRIVER-SIDE (a pure python XXH64, property-tested
        bit-exact against F.xxhash64 in tests/test_xxhash.py) so a point
        lookup never pays a scheduler round-trip just to route;
        unsupported literal types fall back to a one-row Spark job with
        the identical expression."""
        from ..functions.xxhash import spark_xxhash64

        h = spark_xxhash64(value, pk_type)
        if h is not None:
            return h % num_buckets  # python % == pmod for int>0 modulus
        return (
            self.spark.range(1)
            .select(
                F.pmod(F.xxhash64(F.lit(value).cast(pk_type)), F.lit(num_buckets))
                .cast("int")
                .alias("b")
            )
            .first()["b"]
        )

    def _lookup_files(
        self, bucket: int, key_value: Any, snap: Snapshot
    ) -> tuple[list[str], list[str], int]:
        """In-bucket file skipping for point lookups: drop the bucket's
        files whose manifest key min/max range excludes `key_value` — pure
        metadata, no data IO. Files without recorded key bounds (pre-stats
        manifests, non-JSON-safe key types) are kept conservatively.

        Sound for the LWW merge: every storage row for a key lives in files
        whose key range covers it, so skipping non-covering files cannot
        change that key's winner. Skipping is what makes MOR point reads
        O(files containing the key) instead of O(delta files in the
        bucket) — and compaction's sort-clustering (optionally split by
        max_file_rows) keeps base-file ranges tight. Files carrying a key
        BLOOM (tables created with ``bloom_fpp``) are additionally probed
        with the driver-side xxhash64 of the key — a miss PROVES absence,
        which is the only pruning that works on delta files (their key
        range spans the bucket) and on ``cluster_by``-compacted bases
        (their key range is deliberately wide). Returns (base files kept,
        delta files kept, files skipped)."""
        self._resolve_manifests(snap)  # file lists + _stats_cache first
        base_files = snap.base_files([bucket])
        delta_files = snap.delta_files([bucket])
        from ..functions import bloom as _bloomlib
        from ..functions.xxhash import spark_xxhash64

        pk_field = next(
            f for f in snap.schema.fields if f.name == snap.partition_key
        )
        key_hash = spark_xxhash64(key_value, pk_field.dataType)

        def covers(f: str) -> bool:
            s = self._stats_cache.get(f)
            if not s:
                return True
            lo, hi = s.get("key_min"), s.get("key_max")
            in_range = True
            if lo is not None and hi is not None:
                try:
                    in_range = lo <= key_value <= hi
                except TypeError:
                    in_range = True  # incomparable literal type: keep
            if not in_range:
                return False
            b64 = s.get("key_bloom")
            if b64 and key_hash is not None:
                cached = self._bloom_cache.get(f)
                if cached is None:
                    cached = self._bloom_cache[f] = (
                        _bloomlib.decode_bloom(b64),
                        int(s["key_bloom_m"]),
                        int(s["key_bloom_k"]),
                    )
                bits, m, k = cached
                if not _bloomlib.might_contain(bits, m, k, key_hash):
                    return False
            return True
        kept_base = [f for f in base_files if covers(f)]
        kept_deltas = [f for f in delta_files if covers(f)]
        skipped = (len(base_files) - len(kept_base)) + (
            len(delta_files) - len(kept_deltas)
        )
        return kept_base, kept_deltas, skipped

    def file_stats(self, snapshot: Snapshot | None = None) -> dict[str, dict]:
        """Per-data-file stats of a snapshot (rows, __lsn min/max, tombstone
        presence), read from manifests — pure metadata, no data IO. Files
        from pre-stats manifests are absent from the result."""
        snap = snapshot or self.current()
        # resolving manifests populates _stats_cache as a side effect
        self._resolve_manifests(snap)
        return {
            f: self._stats_cache[f]
            for f in snap.all_files()
            if f in self._stats_cache
        }

    def changes_since(self, version: int, raw: bool = False) -> DataFrame:
        """Incremental scan (Iceberg incremental-read analogue): the rows
        WRITTEN between `version` (exclusive) and the current snapshot —
        file-level set difference over immutable files, so a downstream
        consumer reads O(new data), never the table. Raw storage rows
        (payload + __lsn/__deleted, tombstones included) by default with
        raw=True semantics; raw=False filters tombstones and meta columns.

        Note: COW rewrites copy surviving rows into new files, so a rewrite
        surfaces its whole bucket here (the honest file-level contract; MOR
        deltas — the streaming path — surface exactly the changed rows).
        """
        old = self.snapshot_at(version)
        cur = self.current()
        seen = set(old.all_files())
        new_files = [f for f in cur.all_files() if f not in seen]
        rows = self._read_files(new_files, cur.schema, cur.patch_cols)
        if raw:
            return rows
        return rows.filter(~F.col(DELETED_COL)).drop(*META_COLS)

    def _changed_key_candidates(
        self, old_snap: Snapshot, new_snap: Snapshot
    ) -> DataFrame:
        """Distinct key tuples whose LWW state MAY differ between the two
        snapshots: keys in files ADDED in the window (writes, COW rewrites)
        unioned with keys in files REMOVED (rollbacks, tombstone vacuums,
        compaction rewrites). The removed side matters: a removal-only
        commit — rollback, or a vacuum whose tombstones were the only trace
        of a key — adds no files, so an added-files-only diff (changes_since)
        is blind to it and a consumer would silently keep stale state.
        (Removed files are still on disk: old_snap must be readable for the
        diff at all.) Unpersisted — callers that run several actions over
        the result should persist/unpersist it themselves."""
        keys = list(new_snap.keys)
        old_files = set(old_snap.all_files())
        new_files = set(new_snap.all_files())
        added = sorted(new_files - old_files)
        removed = sorted(old_files - new_files)
        return (
            self._read_files(added, new_snap.schema, new_snap.patch_cols)
            .select(*keys)
            .unionByName(
                self._read_files(
                    removed, old_snap.schema, old_snap.patch_cols
                ).select(*keys)
            )
            .distinct()
        )

    def changed_keys_since(
        self, version: int, to_version: int | None = None
    ) -> DataFrame:
        """Public candidate-key feed for incremental-view maintenance:
        every key tuple whose state may have changed in (version, to] —
        including keys touched only by removal-only commits, which
        `changes_since` (an added-files scan) cannot see."""
        old_snap = self.snapshot_at(version)
        new_snap = (
            self.current() if to_version is None else self.snapshot_at(to_version)
        )
        return self._changed_key_candidates(old_snap, new_snap)

    def changelog(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Row-level change-data-feed between two snapshots (Delta CDF /
        Iceberg create_changelog_view analogue): one row per key whose LWW
        state changed, with ``op`` I/U/D and the NEW payload (nulls for D).

        Scale shape: candidate keys come from the file-level diff (O(files
        written since from_version), pure metadata + new-file scan); both
        states are then read BUCKET-PRUNED to the candidates' buckets and
        semi-joined down to candidates — cost is O(changed data + touched
        buckets), never O(table). COW rewrites surface whole buckets as
        candidates (honest file-level contract, same as changes_since); the
        state diff still filters them to true changes.

        The candidate set stays persisted for the DataFrame's lifetime
        (it feeds two bucket-collects and two semi-joins); loop-style
        consumers that fully drain each result should use
        `_changelog_with_cache` and unpersist explicitly.
        """
        df, _cand = self._changelog_with_cache(from_version, to_version)
        return df

    def _diff_states(
        self, from_version: int, to_version: int | None = None
    ) -> tuple[DataFrame, DataFrame, list[str], DataFrame, "Snapshot", "Snapshot"]:
        """Shared planning step of `changelog()` and `changelog_delta()`:
        candidate keys from the file-level diff, then BOTH snapshots' raw
        LWW states bucket-pruned and semi-joined down to the candidates.
        Returns (old_state, new_state, keys, cand, old_snap, new_snap);
        `cand` is persisted — the caller must unpersist it once every job
        reading the derived frames has run."""
        old_snap = self.snapshot_at(from_version)
        new_snap = (
            self.current() if to_version is None else self.snapshot_at(to_version)
        )
        keys = list(new_snap.keys)
        # read once, reused by the semi-joins (and by the bucket-collect
        # fallback below)
        cand = self._changed_key_candidates(old_snap, new_snap).persist()
        # touched buckets METADATA-ONLY (zero Spark jobs) in the common
        # case: every candidate key lives in the bucket its data-file path
        # names (files are written under __bucket=<b>/ dirs and a key's
        # rows never leave its bucket), and the key->bucket mapping depends
        # only on num_buckets — so when both snapshots share the bucket
        # count, the file diff's path buckets ARE the touched set for both
        # sides. This removes the two per-version driver collect jobs that
        # dominated materialize_changelog backlogs (round-3 profile).
        touched_meta: list[int] | None = None
        if old_snap.num_buckets == new_snap.num_buckets:
            import re as _re

            pat = _re.compile(_re.escape(BUCKET_COL) + r"=(\d+)/")
            old_files = set(old_snap.all_files())
            new_files = set(new_snap.all_files())
            bs: set[int] = set()
            for f in old_files.symmetric_difference(new_files):
                m = pat.search(f)
                if m is None:
                    bs.clear()
                    break  # unparseable path: fall back to the collect
                bs.add(int(m.group(1)))
            else:
                touched_meta = sorted(bs)
        # fallback: touched buckets under EACH snapshot's own layout (a
        # rebucket between the two versions changes the key->bucket mapping)
        def pruned_state(snap: Snapshot) -> DataFrame:
            touched = touched_meta
            if touched is None:
                touched = [
                    r.b
                    for r in cand.select(
                        bucket_expr_for(snap).alias("b")
                    ).distinct().collect()
                ]
            state = self.read_buckets(touched, snapshot=snap, raw=True)
            return state.join(F.broadcast(cand), on=keys, how="left_semi")

        return (
            pruned_state(old_snap),
            pruned_state(new_snap),
            keys,
            cand,
            old_snap,
            new_snap,
        )

    def _diff_joined_fast(
        self, old_snap: "Snapshot", new_snap: "Snapshot"
    ) -> tuple[DataFrame, list[str], list[str]] | None:
        """Append-only diff core shared by the three changelog shapes
        (round 6): when the window added files without removing any (the
        MOR delta-append commit — the streaming hot path) and the bucket
        layout is unchanged, the old and new LWW winners of every possibly-
        changed key come out of ONE aggregation over (old touched-bucket
        raw rows ∪ added-file raw rows):

            new winner = max(struct) over ALL rows     (old ⊆ new files)
            old winner = max(struct) over old rows only

        — no per-side argmax, no full-outer join, no candidate-key
        broadcast semi-joins (the previous shape broadcast the batch's key
        set twice and read the new state as base∪ALL deltas — at sf1 that
        was two ~2M-key broadcasts and double the delta IO per version of
        a materialize_changelog drain; measured 23.8s -> ~8s for the
        4-version drain). Unchanged keys fall out of the op filter (their
        two winners coincide), so no semi-join is needed at all; the agg
        shuffles only the touched buckets' rows, map-side combinable.
        The struct field order mirrors _argmax_rows exactly, so any
        tie-break on equal lsns resolves identically to the slow path.

        Returns (j, keys, payload) where j carries keys + payload (new
        values) + __n_lsn/__n_del/__o_lsn/__o_del + __o_<c> pre-images,
        or None when the window is not append-only (COW rewrites,
        rollbacks, compaction, rebucket) — callers then take the
        join-based path.
        """
        if old_snap.num_buckets != new_snap.num_buckets:
            return None
        old_files = set(old_snap.all_files())
        new_files = set(new_snap.all_files())
        if not old_files <= new_files:
            return None
        added = sorted(new_files - old_files)
        import re as _re

        pat = _re.compile(_re.escape(BUCKET_COL) + r"=(\d+)/")
        touched: set[int] = set()
        for f in added:
            m = pat.search(f)
            if m is None:
                return None
            touched.add(int(m.group(1)))
        keys = list(new_snap.keys)
        tb = sorted(touched)
        old_touched = old_snap.base_files(tb) + old_snap.delta_files(tb)
        # old files read under the OLD schema, then aligned to the new
        # (evolved columns null-fill, widened types cast) — byte-identical
        # to how the join path surfaced pre-evolution rows
        storage_new = self.storage_schema(
            new_snap.schema, patch_cols=new_snap.patch_cols
        )
        old_rows = self._read_files(
            old_touched, old_snap.schema, old_snap.patch_cols
        )
        old_cols = set(old_rows.columns)
        old_aligned = old_rows.select(
            *[
                (
                    F.col(f.name).cast(f.dataType)
                    if f.name in old_cols
                    else F.lit(None).cast(f.dataType)
                ).alias(f.name)
                for f in storage_new.fields
            ]
        )
        added_rows = self._read_files(
            added, new_snap.schema, new_snap.patch_cols
        )
        rows = old_aligned.withColumn(
            "__is_new", F.lit(False)
        ).unionByName(added_rows.withColumn("__is_new", F.lit(True)))
        # same struct layout as _argmax_rows: (lsn, rest-in-column-order)
        rest = [
            c for c in storage_new.fieldNames() if c not in keys and c != LSN_COL
        ]
        winner = F.struct(F.col(LSN_COL), *[F.col(c) for c in rest])
        g = rows.groupBy(*keys).agg(
            F.max(winner).alias("__nw"),
            F.max(F.when(~F.col("__is_new"), winner)).alias("__ow"),
        )
        payload = [
            c for c in new_snap.schema.fieldNames() if c not in keys
        ]
        j = g.select(
            *keys,
            *[F.col(f"__nw.{c}").alias(c) for c in payload],
            F.col(f"__nw.{LSN_COL}").alias("__n_lsn"),
            F.col(f"__nw.{DELETED_COL}").alias("__n_del"),
            F.col(f"__ow.{LSN_COL}").alias("__o_lsn"),
            F.col(f"__ow.{DELETED_COL}").alias("__o_del"),
            *[F.col(f"__ow.{c}").alias(f"__o_{c}") for c in payload],
        )
        return j, keys, payload

    def _diff_joined(
        self, from_version: int, to_version: int | None = None
    ) -> tuple[DataFrame, list[str], list[str], DataFrame, "Snapshot", "Snapshot"]:
        """(j, keys, payload, cand_handle, old_snap, new_snap) for the
        changelog shapes: j carries, per possibly-changed key, the new
        payload + __n_lsn/__n_del/__o_lsn/__o_del + __o_<c> pre-images.
        Fast append-only one-aggregation path when applicable (see
        _diff_joined_fast), else the bucket-pruned two-state full-outer
        join. cand_handle is whatever the caller must unpersist when the
        result is fully drained (a no-op handle on the fast path)."""
        old_snap = self.snapshot_at(from_version)
        new_snap = (
            self.current() if to_version is None else self.snapshot_at(to_version)
        )
        fast = self._diff_joined_fast(old_snap, new_snap)
        if fast is not None:
            j, keys, payload = fast
            return j, keys, payload, j, old_snap, new_snap
        old_state, new_state, keys, cand, _, _ = self._diff_states(
            from_version, to_version
        )
        payload = [
            c
            for c in new_state.columns
            if c not in keys and c not in META_COLS
        ]
        new_fields = {f.name: f.dataType for f in new_snap.schema.fields}
        old_cols = set(old_state.columns)
        o = old_state.select(
            *keys,
            F.col(LSN_COL).alias("__o_lsn"),
            F.col(DELETED_COL).alias("__o_del"),
            *[
                (
                    F.col(c) if c in old_cols
                    else F.lit(None).cast(new_fields[c])
                ).alias(f"__o_{c}")
                for c in payload
            ],
        )
        n = new_state.select(
            *keys,
            *payload,
            F.col(LSN_COL).alias("__n_lsn"),
            F.col(DELETED_COL).alias("__n_del"),
        )
        return n.join(o, on=keys, how="full_outer"), keys, payload, cand, old_snap, new_snap

    @staticmethod
    def _diff_op():
        """The shared I/U/D op expression over a _diff_joined frame."""
        old_live = F.col("__o_lsn").isNotNull() & ~F.coalesce(
            F.col("__o_del"), F.lit(False)
        )
        new_live = F.col("__n_lsn").isNotNull() & ~F.coalesce(
            F.col("__n_del"), F.lit(False)
        )
        op = (
            F.when(~old_live & new_live, F.lit("I"))
            .when(old_live & ~new_live, F.lit("D"))
            .when(
                old_live & new_live & (F.col("__o_lsn") != F.col("__n_lsn")),
                F.lit("U"),
            )
        )
        return op, old_live

    def _changelog_with_cache(
        self, from_version: int, to_version: int | None = None
    ) -> tuple[DataFrame, DataFrame]:
        """changelog() plus an explicit handle to its persisted
        candidate-keys frame, so a caller that fully consumes the result
        can release the cache promptly instead of waiting for eviction.
        Returning the handle (rather than stashing it on self) keeps
        interleaved changelog calls from unpersisting each other's frames.
        """
        j, keys, payload, cand, _, _ = self._diff_joined(
            from_version, to_version
        )
        op, _ = self._diff_op()
        df = (
            j.withColumn("op", op)
            .filter(F.col("op").isNotNull())
            .select(
                *keys,
                "op",
                # D rows keep nulls (the tombstone row's payload is null
                # already; guard anyway so COW/MOR agree)
                *[
                    F.when(F.col("op") != "D", F.col(c)).alias(c)
                    for c in payload
                ],
            )
        )
        return df, cand

    def changelog_delta(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Row-level change feed WITH PRE-IMAGES (Delta Lake CDF's
        `_change_type` row shape): per changed key, `insert` /
        `update_postimage` rows carry the NEW payload and `delete` /
        `update_preimage` rows carry the OLD payload — an update emits
        both rows. Pre-images are what make ALGEBRAIC maintenance of
        mergeable sketches possible downstream (a histogram cell can be
        decremented only if the consumer learns the value that vanished);
        `changelog()`'s compact I/U/D-with-new-payload shape cannot
        express that, which is exactly why Delta CDF emits pre-images.

        Same cost shape as `changelog()`: the diff join already reads the
        old state for LWW comparison — this merely stops discarding its
        payload. Old rows are projected into the NEW snapshot's payload
        schema (columns added by evolution read as null in pre-images)."""
        df, _cand = self._changelog_delta_with_cache(from_version, to_version)
        return df

    def _changelog_delta_with_cache(
        self, from_version: int, to_version: int | None = None
    ) -> tuple[DataFrame, DataFrame]:
        """`changelog_delta()` plus the persisted candidate-keys handle
        (same contract as `_changelog_with_cache`)."""
        j, keys, payload, cand, _, _ = self._diff_joined(
            from_version, to_version
        )
        op, _ = self._diff_op()
        base = j.withColumn("op", op).filter(F.col("op").isNotNull())
        post = base.filter(F.col("op").isin("I", "U")).select(
            *keys,
            F.when(F.col("op") == "I", F.lit("insert"))
            .otherwise(F.lit("update_postimage"))
            .alias("_change_type"),
            *payload,
        )
        pre = base.filter(F.col("op").isin("D", "U")).select(
            *keys,
            F.when(F.col("op") == "D", F.lit("delete"))
            .otherwise(F.lit("update_preimage"))
            .alias("_change_type"),
            *[F.col(f"__o_{c}").alias(c) for c in payload],
        )
        return post.unionByName(pre), cand

    def changelog_envelope(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Row-level change feed as BEFORE/AFTER row images — the shape a
        downstream replicator needs (Debezium envelope / Iceberg
        changelog-view with both images): per changed key one row with
        ``op`` I/U/D, a ``before`` struct (null unless the key was live at
        from_version), an ``after`` struct (null for D), the winning
        ``lsn`` in the new state (the tombstone's lsn for D — monotone per
        key, so a cascade target's LWW resolves identically; if the
        tombstone was vacuumed before the range was read, a sentinel of
        old-lsn + 1 that still strictly beats the replica's copy), and the
        key's ``bucket`` under the new snapshot's layout (the
        source-partition hint for the wire envelope).

        Both images carry the full row shape (keys + payload) in the NEW
        snapshot's schema; columns added by evolution read as null in
        pre-images. `sources.debezium.to_debezium` maps this onto the
        Debezium wire shape and `from_debezium` closes the loop — applying
        the round-trip to a second table reproduces the source state
        exactly (tests/test_debezium.py cascade test).

        Same cost shape as `changelog()`/`changelog_delta()`: candidates
        from the file-level diff, both states bucket-pruned, O(changed
        data + touched buckets). The candidate frame stays persisted for
        the DataFrame's lifetime (same note as `changelog()`).
        """
        df, _cand = self._changelog_envelope_with_cache(from_version, to_version)
        return df

    def _changelog_envelope_with_cache(
        self, from_version: int, to_version: int | None = None
    ) -> tuple[DataFrame, DataFrame]:
        """`changelog_envelope()` plus the persisted candidate-keys handle
        (same contract as `_changelog_with_cache`)."""
        j, keys, payload, cand, _, new_snap = self._diff_joined(
            from_version, to_version
        )
        op, old_live = self._diff_op()
        before = F.struct(
            *[F.col(k).alias(k) for k in keys],
            *[F.col(f"__o_{c}").alias(c) for c in payload],
        )
        after = F.struct(
            *[F.col(k).alias(k) for k in keys],
            *[F.col(c).alias(c) for c in payload],
        )
        df = (
            j.withColumn("op", op)
            .filter(F.col("op").isNotNull())
            .select(
                *keys,
                "op",
                F.when(old_live, before).alias("before"),
                F.when(F.col("op") != "D", after).alias("after"),
                # I/U always have __n_lsn. D normally carries the tombstone
                # lsn, but when the tombstone was vacuumed out of the new
                # snapshot (maintain(tombstone_below_lsn=...)) the key has
                # no new-state row at all — falling back to the OLD live
                # row's lsn would make a cascade target holding that row see
                # an equal-lsn tie where the delete is not guaranteed to
                # win. Emit old lsn + 1 instead: a lower bound on the real
                # (vacuumed) tombstone lsn — vacuum only removes tombstones
                # strictly above the row they shadow — so it strictly beats
                # the replica's copy and stays <= any later real event.
                F.coalesce(
                    F.col("__n_lsn"),
                    F.col("__o_lsn") + F.lit(1).cast("long"),
                ).alias("lsn"),
                bucket_expr_for(new_snap).alias("bucket"),
            )
        )
        return df, cand

    def iter_changelogs(self, from_version: int, to_version: int | None = None):
        """Yield ``(version, changelog DataFrame)`` for every committed
        version in (from_version, to_version] — the pull-based CDC tail a
        downstream consumer drives at its own pace (the streaming analogue:
        call again later with the last version you processed; versions are
        contiguous integers, so resumption needs no extra bookkeeping).

        Each element is `changelog(v-1, v)` — O(that commit's changed data).
        Consecutive elements compose: applying them in order onto the state
        at `from_version` reconstructs the state at `to_version` exactly
        (tests/test_changelog.py proves the invariant)."""
        end = self.current().version if to_version is None else to_version
        for v in range(from_version + 1, end + 1):
            yield v, self.changelog(v - 1, v)

    # -- materialized row-level changelog (Delta CDF change-file analogue) --

    def changelog_dir(self, version: int) -> str:
        return changelog_data_dir(self.root, version)

    def changelog_files(self, version: int) -> list[str] | None:
        """Data files of a materialized per-version changelog, or None if
        that version was never materialized. `None` vs `[]` matters: an
        empty list is a real (no-op commit) changelog."""
        return changelog_data_files(self.root, version)

    def materialize_changelog(
        self,
        to_version: int | None = None,
        max_workers: int = 8,
        strategy: str = "auto",
    ) -> int:
        """Persist the row-level changelog of every not-yet-materialized
        version up to `to_version` (default: current) as parquet under
        `_changelog/v{N}/` — precomputed change files a row-level CDC
        consumer (lake_cdf mode=rowlevel) reads with zero join work.

        This is Delta CDF's trade made explicit: pay one bounded job per
        commit at write/maintenance time (the changelog diff is O(that
        commit's changed data), bucket-pruned) so that EVERY downstream
        subscriber gets exact I/U/D rows for free. Idempotent and
        restartable: a version directory becomes visible only with its
        `_DONE` marker; partially written dirs are overwritten. Returns
        the number of versions materialized.

        Versions are mutually independent (each diff reads only immutable
        files of v-1 and v), so a backlog is drained in parallel.
        `strategy` picks how:

        - ``"threads"``: one write job per version on up to `max_workers`
          driver threads — Spark schedules the per-version jobs in
          parallel across executor slots. Failure of one version leaves
          the others' `_DONE` markers intact; a retry re-materializes
          only the failed ones.
        - ``"union"``: every pending version's diff plan is tagged with
          its version and unioned into ONE write job
          (`partitionBy(version)` into a staging dir, files then moved
          into each version dir, `_DONE` markers last) — all-or-nothing
          drain semantics (no version visible until the single job
          succeeds). Measured SLOWER than threads in both probed regimes
          (8 large versions at sf0.1: 44.9 s vs 35.2 s; 24 small
          versions: parity-to-worse — BENCH/BASELINE.md): the per-version
          bucket-prune collects dominate and run threaded either way, so
          the single write job only serializes what threads overlap.
          Kept as an explicit opt-in for the atomicity property, not for
          speed.
        - ``"auto"`` (default): threads (the measured winner at every
          probed backlog shape).
        """
        if strategy not in ("auto", "threads", "union"):
            raise ValueError(
                f"unknown materialize strategy {strategy!r} "
                "(expected 'auto', 'threads' or 'union')"
            )
        end = self.current().version if to_version is None else to_version
        pending = [
            v for v in range(1, end + 1) if self.changelog_files(v) is None
        ]
        # a crashed union attempt leaves a dead staging dir; every strategy
        # clears it (nothing else ever removes it — vacuum walks data only)
        shutil.rmtree(
            os.path.join(self.root, "_changelog", "_staging"),
            ignore_errors=True,
        )
        if not pending:
            return 0
        if strategy == "auto":
            strategy = "threads"
        if strategy == "union" and len(pending) > 1:
            self._materialize_changelog_union(pending, max_workers)
            return len(pending)

        def _one(v: int) -> None:
            out = self.changelog_dir(v)
            shutil.rmtree(out, ignore_errors=True)  # partial prior attempt
            df, cand = self._changelog_with_cache(v - 1, v)
            try:
                df.write.mode("overwrite").parquet(out)
            finally:
                # the write fully consumed this version's diff — release
                # its candidate cache now, not at eviction time (a long
                # maintenance loop would otherwise pin one cached frame
                # per version)
                cand.unpersist(blocking=False)
            with open(os.path.join(out, "_DONE"), "w") as fh:
                fh.write(str(v))

        if len(pending) == 1 or max_workers <= 1:
            for v in pending:
                _one(v)
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(max_workers, len(pending))
            ) as ex:
                # list() drains the iterator so the first failure raises
                list(ex.map(_one, pending))
        return len(pending)

    def _materialize_changelog_union(
        self, pending: list[int], max_workers: int
    ) -> None:
        """Union-strategy body of `materialize_changelog`: all pending
        versions' diffs in ONE Spark write job.

        Schema evolution between the pending versions is handled by
        `unionByName(allowMissingColumns=True)` — pre-evolution versions'
        files gain null-filled evolved columns, which the rowlevel reader
        (`streaming/cdf_source._read_partition_batches`) projects by name
        against the declared schema anyway. Crash-safety: the staging dir
        is discarded and rebuilt on retry; a version becomes visible only
        when its files have moved AND its `_DONE` marker landed, so a
        crash mid-move re-materializes exactly the unmarked versions.
        """
        from concurrent.futures import ThreadPoolExecutor

        vcol = "__cdc_mat_v"
        # all versions' candidate caches stay pinned until the single write
        # finishes — O(backlog) executor storage vs threads' O(max_workers);
        # the frames are small (changed KEYS, not data), but it is the
        # union strategy's real memory cost. `cands` collects every frame a
        # _plan call persisted so a mid-planning failure releases them all.
        cands: list[DataFrame] = []

        def _plan(v: int):
            df, cand = self._changelog_with_cache(v - 1, v)
            cands.append(cand)
            return df.withColumn(vcol, F.lit(v))

        staging = os.path.join(self.root, "_changelog", "_staging")
        try:
            # plan-building runs the per-version bucket-prune collects —
            # small jobs; overlap them on threads like the threads strategy
            with ThreadPoolExecutor(
                max_workers=min(max_workers, len(pending))
            ) as ex:
                planned = list(ex.map(_plan, pending))
            union = planned[0]
            for df in planned[1:]:
                union = union.unionByName(df, allowMissingColumns=True)
            union.write.mode("overwrite").partitionBy(vcol).parquet(staging)
        finally:
            for cand in cands:
                cand.unpersist(blocking=False)
        for v in pending:
            out = self.changelog_dir(v)
            shutil.rmtree(out, ignore_errors=True)  # partial prior attempt
            os.makedirs(out, exist_ok=True)
            # empty diffs produce no staging partition dir — the bare
            # _DONE marker then records a real no-op changelog ([])
            src = os.path.join(staging, f"{vcol}={v}")
            if os.path.isdir(src):
                for name in os.listdir(src):
                    if name.endswith(".parquet"):
                        os.rename(
                            os.path.join(src, name), os.path.join(out, name)
                        )
            with open(os.path.join(out, "_DONE"), "w") as fh:
                fh.write(str(v))
        shutil.rmtree(staging, ignore_errors=True)

    def _argmax_rows(self, rows: DataFrame, keys: list[str]) -> DataFrame:
        """One storage row per primary key: max __lsn wins (algebraic agg).
        `keys` comes from snapshot metadata — never a table-specific global."""
        rest = [c for c in rows.columns if c not in keys and c != LSN_COL]
        w = F.max(F.struct(F.col(LSN_COL), *[F.col(c) for c in rest])).alias("__w")
        out = rows.groupBy(*keys).agg(w)
        return out.select(
            *keys,
            F.col(f"__w.{LSN_COL}").alias(LSN_COL),
            *[F.col(f"__w.{c}").alias(c) for c in rest],
        )

    def _read_files(
        self, files: list[str], schema: StructType, patch_cols: bool = False
    ) -> DataFrame:
        full = self.storage_schema(schema, patch_cols=patch_cols)
        if not files:
            return self.spark.createDataFrame([], full)
        # Explicit snapshot schema: files written before a column existed
        # null-fill it (schema-evolution read path).
        return self.spark.read.schema(full).parquet(*files)

    def is_batch_committed(self, batch_id: str) -> bool:
        return str(batch_id) in self.current().ledger

    # -- write path -----------------------------------------------------------

    def commit_bucket_rewrite(
        self,
        new_data: DataFrame,
        touched_buckets: list[int],
        batch_id: str | None,
        new_schema: StructType | None = None,
        lineage: dict[str, Any] | None = None,
        lineage_fn: Any = None,
        base_snapshot: Snapshot | None = None,
        new_num_buckets: int | None = None,
        max_file_rows: int | None = None,
    ) -> Snapshot:
        """Commit a copy-on-write rewrite of `touched_buckets`.

        `max_file_rows` caps rows per written file (Spark's
        maxRecordsPerFile): with sort-clustered input each bucket splits
        into consecutive key-range files whose footer min/max are tight
        and disjoint — the substrate for in-bucket file skipping.

        `new_num_buckets` turns the commit into a FULL-table relayout
        (rebucketing): the parent's bucket map is discarded entirely and
        ANY concurrent commit conflicts (a full rewrite can't be rebased).

        `new_data` must contain BUCKET_COL and exactly the rows that should
        exist in the touched buckets after the commit; untouched buckets are
        carried forward by file reference (zero IO).

        Concurrency: retried against a moving pointer (metadata-only rebase,
        the data files are written once). If a concurrent commit touched any
        of OUR buckets the rewrite is stale -> CommitConflictError, caller
        recomputes.

        `base_snapshot` MUST be the snapshot the rewrite was READ from
        (callers that read the table before rewriting pass it) — validation
        against a snapshot read here would miss a commit landing between
        the caller's read and this call.
        """
        cur = self.current()
        if batch_id is not None and str(batch_id) in cur.ledger:
            return cur  # exactly-once: replay is a no-op
        parent0 = base_snapshot if base_snapshot is not None else cur
        commit_id = uuid.uuid4().hex[:12]
        out_dir = os.path.join(
            self.data_dir, f"commit-{parent0.version + 1:08d}-{commit_id}"
        )
        # partitionBy(BUCKET_COL) -> one directory per bucket; the bucket id is
        # re-derivable from the key, so it is not stored inside the files.
        writer = new_data.write.partitionBy(BUCKET_COL).mode("error")
        if max_file_rows is not None:
            writer = writer.option("maxRecordsPerFile", max_file_rows)
        with _ts_micros(self.spark):
            writer.parquet(out_dir)
        bucket_files: dict[str, list[str]] = {str(b): [] for b in touched_buckets}
        if os.path.isdir(out_dir):
            for entry in sorted(os.listdir(out_dir)):
                if not entry.startswith(f"{BUCKET_COL}="):
                    continue
                b = entry.split("=", 1)[1]
                bdir = os.path.join(out_dir, entry)
                bucket_files[b] = sorted(
                    os.path.join(bdir, f)
                    for f in os.listdir(bdir)
                    if f.endswith(".parquet")
                )
        _new_files = [f for fs in bucket_files.values() for f in fs]
        self._stats_cache.update(
            self._footer_stats(_new_files, key_col=parent0.partition_key)
        )
        _fpp = self.table_props().get("bloom_fpp")
        if _fpp:
            self._build_key_blooms(_new_files, parent0.partition_key, _fpp)
        touched_set = set(touched_buckets)

        def build(parent: Snapshot) -> Snapshot:
            if new_num_buckets is not None:
                # full relayout: bucket ids are renumbered, so NO concurrent
                # commit can be rebased under it
                if parent.version != parent0.version:
                    raise CommitConflictError(
                        f"table advanced during rebucket "
                        f"(v{parent0.version} -> v{parent.version}); recompute"
                    )
                new_buckets = {b: fs for b, fs in bucket_files.items() if fs}
                new_deltas: dict[str, list[str]] = {}
            else:
                if parent.num_buckets != parent0.num_buckets:
                    raise CommitConflictError(
                        "table was rebucketed by a concurrent commit "
                        f"({parent0.num_buckets} -> {parent.num_buckets} "
                        "buckets); recompute against the new layout"
                    )
                if parent.version != parent0.version:
                    # rebase validation: our rewrite is only correct if no
                    # intervening commit changed the buckets we rewrote
                    for b in touched_set:
                        if parent.buckets.get(str(b)) != parent0.buckets.get(str(b)) or \
                                parent.deltas.get(str(b)) != parent0.deltas.get(str(b)):
                            raise CommitConflictError(
                                f"bucket {b} changed by a concurrent commit "
                                f"(v{parent0.version} -> v{parent.version}); "
                                "recompute the rewrite"
                            )
                new_buckets = dict(parent.buckets)
                for b, fs in bucket_files.items():
                    new_buckets[b] = fs
                # drop empty bucket entries (bucket fully deleted)
                new_buckets = {b: fs for b, fs in new_buckets.items() if fs}
                # a rewrite folds in whatever deltas the touched buckets had
                new_deltas = {
                    b: fs
                    for b, fs in parent.deltas.items()
                    if int(b) not in touched_set
                }
            lin = dict(lineage or {})
            lin.update(
                {
                    "batch_id": batch_id,
                    "touched_buckets": sorted(touched_buckets),
                    "commit_epoch": time.time(),
                }
            )
            if lineage_fn is not None:
                # deferred stats (e.g. Observation metrics available only
                # after the data write ran); must be idempotent across retries
                lin.update(lineage_fn())
            ledger = dict(parent.ledger)
            if batch_id is not None:
                ledger[str(batch_id)] = parent.version + 1
            if len(ledger) > LEDGER_HORIZON:
                for k in sorted(ledger, key=ledger.get)[: len(ledger) - LEDGER_HORIZON]:
                    del ledger[k]
            # re-merge on rebase: a concurrent schema evolution in `parent`
            # must not be clobbered by our (older) evolved schema
            merged_schema = (
                merge_schemas(parent.schema, new_schema)
                if new_schema is not None
                else parent.schema
            )
            return Snapshot(
                version=parent.version + 1,
                schema_json=merged_schema.json(),
                num_buckets=new_num_buckets or parent.num_buckets,
                partition_key=parent.partition_key,
                buckets=new_buckets,
                ledger=ledger,
                lineage=(parent.lineage + [lin])[-1000:],  # bounded history
                parent=parent.version,
                committed_at=time.time(),
                deltas=new_deltas,
                key_columns=parent.key_columns,
                patch_cols=parent.patch_cols,
            )

        try:
            return self._commit_retry(build, batch_id, out_dir)
        except ConcurrentCommitError:
            # stale rewrite OR retries exhausted — either way these files
            # can never be committed; remove them so the caller's recompute
            # doesn't leave orphans behind
            for fs in bucket_files.values():
                for f in fs:
                    self._stats_cache.pop(f, None)
            shutil.rmtree(out_dir, ignore_errors=True)
            raise

    def commit_delta_append(
        self,
        winners: DataFrame,
        touched_buckets: list[int],
        batch_id: str | None,
        new_schema: StructType | None = None,
        lineage: dict[str, Any] | None = None,
        lineage_fn: Any = None,
        base_snapshot: Snapshot | None = None,
    ) -> Snapshot:
        """Merge-on-read commit: append winner rows (incl. tombstones) as
        delta files — O(batch) IO regardless of table size. Readers LWW-merge
        base ∪ deltas; compact() folds deltas back into the base.

        `winners` must contain BUCKET_COL plus storage rows (payload +
        __lsn/__deleted), at most one row per key WITHIN the batch (the
        apply path's LWW guarantees this; across batches duplicates per key
        are fine — the read merge resolves them).

        Concurrency: a delta append is a pure file addition, so it rebases
        onto ANY concurrent commit (disjoint or not) — the LWW read-merge
        orders rows by __lsn, not by commit order. The one exception is a
        rebucket: `base_snapshot` MUST be the snapshot the winners' bucket
        ids were computed from (validating against a snapshot read HERE
        would miss a rebucket landing during the caller's Spark jobs).
        """
        cur = self.current()
        if batch_id is not None and str(batch_id) in cur.ledger:
            return cur
        parent0 = base_snapshot if base_snapshot is not None else cur
        commit_id = uuid.uuid4().hex[:12]
        out_dir = os.path.join(
            self.data_dir, f"delta-{parent0.version + 1:08d}-{commit_id}"
        )
        # hash write-distribution (Iceberg's write.distribution-mode=hash):
        # without it every shuffle partition opens a file in every bucket dir
        # -> O(partitions x buckets) tiny delta files per batch. AQE coalesces
        # the repartition to few tasks for small batches.
        winners = winners.repartition(F.col(BUCKET_COL))
        with _ts_micros(self.spark):
            winners.write.partitionBy(BUCKET_COL).mode("error").parquet(out_dir)
        added: dict[str, list[str]] = {}
        if os.path.isdir(out_dir):
            for entry in sorted(os.listdir(out_dir)):
                if not entry.startswith(f"{BUCKET_COL}="):
                    continue
                b = entry.split("=", 1)[1]
                bdir = os.path.join(out_dir, entry)
                added[b] = sorted(
                    os.path.join(bdir, f)
                    for f in os.listdir(bdir)
                    if f.endswith(".parquet")
                )
        _new_files = [f for fs in added.values() for f in fs]
        self._stats_cache.update(
            self._footer_stats(_new_files, key_col=parent0.partition_key)
        )
        _fpp = self.table_props().get("bloom_fpp")
        if _fpp:
            self._build_key_blooms(_new_files, parent0.partition_key, _fpp)

        def build(parent: Snapshot) -> Snapshot:
            if parent.num_buckets != parent0.num_buckets:
                raise CommitConflictError(
                    "table was rebucketed by a concurrent commit "
                    f"({parent0.num_buckets} -> {parent.num_buckets} buckets); "
                    "delta bucket ids are stale — recompute"
                )
            new_deltas = {b: list(fs) for b, fs in parent.deltas.items()}
            for b, fs in added.items():
                new_deltas.setdefault(b, []).extend(fs)
            lin = dict(lineage or {})
            lin.update(
                {
                    "batch_id": batch_id,
                    "mode": "mor",
                    "touched_buckets": sorted(touched_buckets),
                    "commit_epoch": time.time(),
                }
            )
            if lineage_fn is not None:
                lin.update(lineage_fn())
            ledger = dict(parent.ledger)
            if batch_id is not None:
                ledger[str(batch_id)] = parent.version + 1
            if len(ledger) > LEDGER_HORIZON:
                for k in sorted(ledger, key=ledger.get)[: len(ledger) - LEDGER_HORIZON]:
                    del ledger[k]
            merged_schema = (
                merge_schemas(parent.schema, new_schema)
                if new_schema is not None
                else parent.schema
            )
            return Snapshot(
                version=parent.version + 1,
                schema_json=merged_schema.json(),
                num_buckets=parent.num_buckets,
                partition_key=parent.partition_key,
                buckets=parent.buckets,
                ledger=ledger,
                lineage=(parent.lineage + [lin])[-1000:],
                parent=parent.version,
                committed_at=time.time(),
                deltas=new_deltas,
                key_columns=parent.key_columns,
                patch_cols=parent.patch_cols,
            )

        try:
            return self._commit_retry(build, batch_id, out_dir)
        except ConcurrentCommitError:
            # stale bucket ids OR retries exhausted: these delta files can
            # never be committed — remove them so the caller's recompute
            # doesn't leave orphans
            for fs in added.values():
                for f in fs:
                    self._stats_cache.pop(f, None)
            shutil.rmtree(out_dir, ignore_errors=True)
            raise

    def compact(
        self,
        bucket_ids: list[int] | None = None,
        max_recomputes: int = 2,
        max_file_rows: int | None = None,
        cluster_by: list[str] | None = None,
    ) -> Snapshot:
        """Fold delta files into base files (Iceberg rewrite_data_files /
        minor-compaction analogue). Defaults to every bucket with deltas.

        `cluster_by` overrides the rewrite sort order (default: primary
        key). Iceberg sort-order-on-rewrite analogue: when the dominant
        read is a NON-key range scan (time windows over `ts`) and event
        time does not correlate with the key, key-clustered files all
        span the full ts range and `read_colrange` can skip nothing —
        clustering by the scan column instead gives each file a tight,
        disjoint range, so in-bucket file skipping bites. Trade-off: a
        bucket's point lookups then scan all of that bucket's base files
        (key bounds widen), which is why it is opt-in per table workload.

        Maintenance loses races by design: if a concurrent writer lands a
        delta in a bucket mid-compaction, the rewrite is recomputed from the
        new snapshot (bounded), never committed stale."""
        want = bucket_ids
        if cluster_by:
            snap0 = self.current()
            known = {f.name for f in snap0.schema.fields}
            bad = [c for c in cluster_by if c not in known]
            if bad:
                raise ValueError(
                    f"cluster_by columns {bad} not in table schema "
                    f"(have {sorted(known)})"
                )
        for _ in range(max_recomputes + 1):
            snap = self.current()
            ids = (
                sorted(int(b) for b in snap.deltas)
                if want is None
                else [b for b in want if str(b) in snap.deltas]
            )
            if not ids:
                return snap
            keys = snap.keys
            if cluster_by and list(cluster_by) != list(keys):
                # non-key cluster order: merged read (argmax by key), then
                # bucket repartition + explicit sort by the scan column
                merged = self.read_buckets(
                    ids, snapshot=snap, raw=True
                ).withColumn(BUCKET_COL, bucket_expr_for(snap))
                merged = merged.repartition(
                    max(len(ids), 1), F.col(BUCKET_COL)
                ).sortWithinPartitions(BUCKET_COL, *cluster_by)
            else:
                # default key clustering (round 6): ONE bucket-keyed shuffle
                # of the raw base ∪ delta rows + an in-partition LWW argmax
                # (same shape as the COW apply merge) — the previous form
                # exchanged the rows twice (argmax by key, then repartition
                # by bucket) and sorted again for clustering; the sort
                # aggregate's (bucket, key) group order IS the cluster
                # order, so the trailing sort elides.
                raw = self._read_files(
                    snap.base_files(ids) + snap.delta_files(ids),
                    snap.schema,
                    snap.patch_cols,
                ).withColumn(BUCKET_COL, bucket_expr_for(snap))
                raw = raw.repartition(max(len(ids), 1), F.col(BUCKET_COL))
                rest = [
                    c
                    for c in raw.columns
                    if c not in keys and c not in (LSN_COL, BUCKET_COL)
                ]
                w = F.max(
                    F.struct(F.col(LSN_COL), *[F.col(c) for c in rest])
                ).alias("__w")
                merged = (
                    raw.groupBy(F.col(BUCKET_COL), *keys)
                    .agg(w)
                    .select(
                        *keys,
                        F.col(f"__w.{LSN_COL}").alias(LSN_COL),
                        *[F.col(f"__w.{c}").alias(c) for c in rest],
                        F.col(BUCKET_COL),
                    )
                    .sortWithinPartitions(BUCKET_COL, *keys)
                )
            try:
                return self.commit_bucket_rewrite(
                    merged,
                    touched_buckets=ids,
                    batch_id=None,
                    lineage={"compaction": True, "buckets": len(ids)},
                    base_snapshot=snap,
                    max_file_rows=max_file_rows,
                )
            except CommitConflictError:
                continue  # a writer touched a compacting bucket: recompute
        raise CommitConflictError(
            f"compaction lost the race {max_recomputes + 1} times; "
            "table is under sustained concurrent writes to the same buckets"
        )

    def maintain(
        self,
        compact_if_deltas: int = 8,
        max_file_rows: int | None = None,
        changelog: bool = True,
        changelog_workers: int = 8,
        expire_keep_last: int | None = None,
        orphans_older_than_sec: float | None = None,
        tombstone_below_lsn: int | None = None,
        cluster_by: list[str] | None = None,
        bloom_fpp: float | None = None,
    ) -> dict[str, Any]:
        """One maintenance pass — the background loop a real deployment
        schedules between (or alongside) ingest batches:

        1. COMPACT every bucket whose delta backlog reached
           `compact_if_deltas` files (MOR read cost is O(deltas) per
           bucket until folded; buckets below the threshold are left
           alone — no write amplification for cold buckets),
        2. optionally VACUUM expirable tombstones (after compaction so
           the rewrite folds both; `tombstone_below_lsn` is the caller's
           replication-lag low-watermark — the committed lsn below which
           no out-of-order event can still arrive; see SCALE.md retention
           policy). Candidate buckets are found metadata-only from
           per-file tombstone/lsn stats,
        3. MATERIALIZE pending row-level changelogs (after the rewrites,
           so their empty diffs are covered too, and BEFORE any expiry —
           materializing version v reads snapshots v-1, v),
        4. optionally EXPIRE old snapshots and VACUUM orphan files.

        `cluster_by` is forwarded to compaction (sort-order-on-rewrite;
        see `compact`) so a deployment whose hot reads are time windows
        keeps its base files ts-clustered on the same schedule.

        `bloom_fpp` turns on per-file key bloom filters for this table
        (persists the property, so every later commit builds them too) and
        is set BEFORE this pass's compaction — the rewrite then equips the
        folded base files immediately. Pre-existing files in buckets the
        pass doesn't touch stay bloom-less until their next rewrite
        (lookups keep them conservatively — correct, just unpruned).

        Each step is the existing idempotent primitive; the method only
        sequences them safely. Returns a per-step summary dict."""
        summary: dict[str, Any] = {}
        if bloom_fpp is not None:
            self.set_table_props(bloom_fpp=float(bloom_fpp))
            summary["bloom_fpp"] = float(bloom_fpp)
        snap = self.current()
        backlog = [
            int(b) for b, fs in snap.deltas.items() if len(fs) >= compact_if_deltas
        ]
        if backlog:
            self.compact(
                sorted(backlog), max_file_rows=max_file_rows, cluster_by=cluster_by
            )
        summary["compacted_buckets"] = sorted(backlog)
        if tombstone_below_lsn is not None:
            v_before = self.current().version
            v_after = self.vacuum_tombstones(tombstone_below_lsn).version
            summary["tombstones_vacuumed"] = v_after > v_before
        if changelog:
            summary["changelog_versions"] = self.materialize_changelog(
                max_workers=changelog_workers
            )
        if expire_keep_last is not None:
            summary["expired_files"] = self.expire_snapshots(
                keep_last=expire_keep_last
            )
        if orphans_older_than_sec is not None:
            summary["orphan_files"] = self.vacuum_orphans(
                older_than_sec=orphans_older_than_sec
            )
        summary["version"] = self.current().version
        return summary

    def evolve_schema(self, incoming: StructType) -> StructType:
        """Reconcile table schema with an incoming batch schema; if new
        columns appear, commit a metadata-only snapshot (ALTER TABLE ADD
        COLUMNS analogue). Returns the post-evolution schema.

        Metadata-only, so a lost race is resolved by re-merging against the
        new current schema and retrying.

        The PARTITION KEY's type is pinned at create time and never evolves:
        bucket layout is defined by xxhash64 of the stored key, and xxhash64
        is width-sensitive (int and long hash through different lanes), so
        widening the key's storage type would strand every pre-widening row
        in a bucket no reader ever probes (lookups miss live rows; a
        vacuumed cross-bucket tombstone could even resurrect one). Incoming
        batches with a wider-but-castable key type are instead cast per
        record at apply time, like any other table-type-wins mismatch."""
        for attempt in range(COMMIT_MAX_RETRIES + 1):
            parent = self.current()
            merged = merge_schemas(parent.schema, incoming)
            pk_lc = parent.partition_key.lower()
            pinned = next(
                f for f in parent.schema.fields if f.name.lower() == pk_lc
            )
            merged = StructType(
                [
                    pinned
                    if f.name.lower() == pk_lc and f.dataType != pinned.dataType
                    else f
                    for f in merged.fields
                ]
            )
            # compare parsed structures: the stored schema_json round-trips
            # through json.dumps with different key order than StructType.json()
            if json.loads(merged.json()) == json.loads(parent.schema_json):
                return parent.schema
            try:
                self._commit_schema(parent, merged)
                return merged
            except ConcurrentCommitError:
                if attempt == COMMIT_MAX_RETRIES:
                    raise

    def enable_patch_cols(self) -> Snapshot:
        """Flip the snapshot's patch_cols flag (metadata-only commit, like
        evolve_schema): from here on data files may carry the __col_lsns
        per-column version vector and the storage read schema includes it
        (pre-flag files null-fill). Idempotent; called by
        apply_patch_changes before the first patch-bearing commit."""
        for attempt in range(COMMIT_MAX_RETRIES + 1):
            parent = self.current()
            if parent.patch_cols:
                return parent
            snap = Snapshot(
                version=parent.version + 1,
                schema_json=parent.schema_json,
                num_buckets=parent.num_buckets,
                partition_key=parent.partition_key,
                buckets=parent.buckets,
                ledger=parent.ledger,
                lineage=parent.lineage
                + [{"patch_cols_enabled": True, "commit_epoch": time.time()}],
                parent=parent.version,
                committed_at=time.time(),
                deltas=parent.deltas,
                key_columns=parent.key_columns,
                manifest_paths=dict(parent.manifest_paths),
                patch_cols=True,
            )
            try:
                self._write_snapshot(snap, expected_parent=parent.version)
                return snap
            except ConcurrentCommitError:
                if attempt == COMMIT_MAX_RETRIES:
                    raise

    def _commit_schema(self, parent: Snapshot, merged: StructType) -> None:
        snap = Snapshot(
            version=parent.version + 1,
            schema_json=merged.json(),
            num_buckets=parent.num_buckets,
            partition_key=parent.partition_key,
            buckets=parent.buckets,
            ledger=parent.ledger,
            lineage=parent.lineage
            + [
                {
                    "schema_evolution": True,
                    "added_columns": [
                        f.name
                        for f in merged.fields
                        if f.name not in {g.name for g in parent.schema.fields}
                    ],
                    "commit_epoch": time.time(),
                }
            ],
            parent=parent.version,
            committed_at=time.time(),
            deltas=parent.deltas,
            key_columns=parent.key_columns,
            patch_cols=parent.patch_cols,
        )
        self._write_snapshot(snap, expected_parent=parent.version)

    def rebucket(
        self, new_num_buckets: int, max_recomputes: int = 2
    ) -> Snapshot:
        """Change the table's bucket count — inherently a full rewrite
        (bucket assignment is a pure key hash), run as ONE Spark job:
        LWW-merged raw state (tombstones kept) re-hashed into the new
        layout, all deltas folded. The grow path when buckets exceed the
        6-25 GB target at 100 TB (SCALE.md); readers are unaffected
        (snapshot isolation), concurrent commits lose and recompute."""
        if new_num_buckets < 1:
            raise ValueError("new_num_buckets must be >= 1")
        for _ in range(max_recomputes + 1):
            snap = self.current()
            if snap.num_buckets == new_num_buckets:
                return snap
            data = self.read(snapshot=snap, raw=True).withColumn(
                BUCKET_COL, bucket_expr(snap.partition_key, new_num_buckets)
            )
            data = data.repartition(
                max(min(new_num_buckets, 256), 1), F.col(BUCKET_COL)
            )
            try:
                return self.commit_bucket_rewrite(
                    data,
                    touched_buckets=list(range(new_num_buckets)),
                    batch_id=None,
                    lineage={"rebucket_to": new_num_buckets},
                    base_snapshot=snap,
                    new_num_buckets=new_num_buckets,
                )
            except CommitConflictError:
                continue
        raise CommitConflictError(
            f"rebucket lost the race {max_recomputes + 1} times"
        )

    def rollback(self, version: int) -> Snapshot:
        """Roll the table back to a retained snapshot (Iceberg
        ``rollback_to_snapshot`` analogue): commits a NEW version whose
        content (files, schema, ledger) mirrors the target — history moves
        forward, nothing is deleted, and time travel over the abandoned
        versions still works until they expire. Restoring the target's
        LEDGER is the point: batches committed after the target re-apply
        on replay instead of being skipped as already-ledgered."""
        target = self.snapshot_at(version)
        for attempt in range(COMMIT_MAX_RETRIES + 1):
            parent = self.current()
            if parent.version == version:
                return parent
            snap = Snapshot(
                version=parent.version + 1,
                schema_json=target.schema_json,
                num_buckets=target.num_buckets,
                partition_key=target.partition_key,
                buckets=target.buckets,
                ledger=dict(target.ledger),
                # the TARGET's lineage: the event-time watermark and all
                # counters must roll back with the state, or replayed
                # batches would be late-dropped against the abandoned
                # future watermark
                lineage=(
                    target.lineage
                    + [{"rollback_to": version, "commit_epoch": time.time()}]
                )[-1000:],
                parent=parent.version,
                committed_at=time.time(),
                deltas=target.deltas,
                key_columns=target.key_columns,
                patch_cols=target.patch_cols,
                # seed with the target's manifests: unchanged buckets carry
                # forward by reference instead of being rewritten
                manifest_paths=dict(target.manifest_paths),
            )
            try:
                self._write_snapshot(snap, expected_parent=parent.version)
                return snap
            except ConcurrentCommitError:
                if attempt == COMMIT_MAX_RETRIES:
                    raise
                time.sleep(min(0.1 * (attempt + 1), 1.0))

    # -- quarantine (dead-letter) side table -----------------------------------
    # Reference analogue: per-record error isolation — rollback, log, continue
    # (``ONeo4jImporterVerticesAndEdgesMigrator.java:274-283,585-594``). Poison
    # records land here as (batch_id, reason, lsn, event_json) instead of
    # failing the batch; schema is fixed so it survives payload evolution.

    def quarantine_dir(self) -> str:
        return os.path.join(self.root, "quarantine")

    def quarantine_append(self, df: DataFrame, batch_id: str | None = None) -> None:
        """Write poison rows (batch_id, reason, lsn, event_json).

        With a batch_id the write is an OVERWRITE of that batch's own
        subdirectory — idempotent under commit retries, conflict recomputes,
        checkpoint replays, and same-batch writer races (all of which
        re-derive the identical poison set; a plain append would duplicate
        it on every re-attempt)."""
        if batch_id is None:
            df.write.mode("append").parquet(self.quarantine_dir())
            return
        # readable prefix + short hash = injective (plain sanitization lets
        # distinct ids like 'b:1' and 'b_1' collide and overwrite each
        # other's dead-letter rows); no '=' so it reads as a nested dir,
        # not a Hive partition column
        raw = str(batch_id)
        safe = "".join(c if c.isalnum() or c in "-_." else "_" for c in raw)
        digest = hashlib.md5(raw.encode()).hexdigest()[:8]
        # migrate the pre-hash layout: a replay must OVERWRITE the batch's
        # old dead-letter dir, not leave it to double-count in reads (the
        # legacy name was also ambiguous across colliding batch ids, so the
        # old code would have clobbered it on the next colliding write too).
        # Skip when the legacy name itself looks like a CURRENT-format dir
        # (ends in -<8 hex>): batch_id 'x-<md5(x)[:8]>' must never delete
        # batch 'x''s live quarantine dir.
        looks_current = (
            len(safe) > 9
            and safe[-9] == "-"
            and all(c in "0123456789abcdef" for c in safe[-8:])
        )
        if not looks_current:
            shutil.rmtree(
                os.path.join(self.quarantine_dir(), f"b-{safe}"),
                ignore_errors=True,
            )
        df.write.mode("overwrite").parquet(
            os.path.join(self.quarantine_dir(), f"b-{safe}-{digest}")
        )

    def read_quarantine(self) -> DataFrame:
        """The dead-letter table; empty DataFrame if nothing was quarantined."""
        qdir = self.quarantine_dir()
        schema = StructType(
            [
                StructField("batch_id", StringType(), True),
                StructField("reason", StringType(), True),
                StructField("lsn", LongType(), True),
                StructField("event_json", StringType(), True),
            ]
        )
        if not os.path.isdir(qdir):
            return self.spark.createDataFrame([], schema)
        return (
            self.spark.read.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(qdir)
        )

    def metrics(self) -> DataFrame:
        """Per-commit metrics as a queryable DataFrame — snapshot-level
        observability derived from lineage (events_per_sec uses the gap to
        the previous commit's epoch: sustained-ingest rate, not apply wall).
        Lineage history is bounded (1000 entries), so this is driver-side
        metadata, not data movement.

        Columns: version-ordered seq, batch_id, mode, events_in,
        keys_changed, deletes, upserts, filtered_out, quarantined,
        touched_buckets, commit_epoch, events_per_sec, raw (full entry JSON).
        """
        snap = self.current()
        rows = []
        prev_epoch: float | None = None
        for i, lin in enumerate(snap.lineage):
            epoch = lin.get("commit_epoch")
            ev = lin.get("events_in")
            rate = None
            if (
                prev_epoch is not None
                and epoch is not None
                and isinstance(ev, int)
                and ev > 0
                and epoch > prev_epoch
            ):
                rate = ev / (epoch - prev_epoch)
            tb = lin.get("touched_buckets")
            rows.append(
                (
                    i,
                    str(lin["batch_id"]) if lin.get("batch_id") is not None else None,
                    lin.get("mode", "cow" if "touched_buckets" in lin else None),
                    lin.get("events_in"),
                    lin.get("keys_changed"),
                    lin.get("deletes"),
                    lin.get("upserts"),
                    lin.get("filtered_out"),
                    lin.get("quarantined"),
                    len(tb) if isinstance(tb, list) else None,
                    float(epoch) if epoch is not None else None,
                    rate,
                    json.dumps(lin),
                )
            )
            if epoch is not None:
                prev_epoch = epoch
        schema = (
            "seq int, batch_id string, mode string, events_in long, "
            "keys_changed long, deletes long, upserts long, filtered_out long, "
            "quarantined long, touched_buckets int, commit_epoch double, "
            "events_per_sec double, raw string"
        )
        return self.spark.createDataFrame(rows, schema)

    # -- inspect surface (Iceberg metadata-tables analogue; lake/inspect.py) --

    def snapshots(self) -> DataFrame:
        """One row per retained version (Iceberg ``$snapshots`` analogue)."""
        from .inspect import snapshots_df

        return snapshots_df(self)

    def files(self, snapshot: "Snapshot | None" = None) -> DataFrame:
        """One row per live data file with manifest stats (Iceberg
        ``$files`` analogue; distributed manifest parse)."""
        from .inspect import files_df

        return files_df(self, snapshot)

    def partitions(self, snapshot: "Snapshot | None" = None) -> DataFrame:
        """Per-bucket file/row/byte rollup (Iceberg ``$partitions``
        analogue; the compaction-debt view maintain() schedules from)."""
        from .inspect import partitions_df

        return partitions_df(self, snapshot)

    # -- maintenance ----------------------------------------------------------

    def vacuum_tombstones(self, below_lsn: int) -> Snapshot:
        """Physically drop tombstone rows with __lsn < below_lsn.

        Tombstones must be retained while out-of-order events below their lsn
        can still arrive (the watermark); past that, they are dead weight. At
        scale this runs as periodic maintenance (Iceberg
        ``rewrite_data_files`` analogue — reference analogue: the index
        rebuild workaround, ``ONeo4jImporterSchemaMigrator.java:247-285``).
        Rewrites every bucket that currently holds an expirable tombstone.
        """
        snap = self.current()
        expr = F.col(DELETED_COL) & (F.col(LSN_COL) < below_lsn)
        stats = self.file_stats(snap)
        all_files = snap.all_files()
        if all_files and all(f in stats for f in all_files):
            # metadata-only pruning: a bucket is a candidate iff some file
            # holds a tombstone AND spans below the watermark (safe
            # over-approximation — the rewrite's ~expr filter is exact)
            def candidate(files: list[str]) -> bool:
                # UNKNOWN stats (None) are conservative candidates — stats
                # prune, they never gate correctness
                return any(
                    stats[f]["tombstones"] is not False
                    and (
                        stats[f]["lsn_min"] is None
                        or stats[f]["lsn_min"] < below_lsn
                    )
                    for f in files
                )

            candidates = sorted(
                int(b)
                for b in set(snap.buckets) | set(snap.deltas)
                if candidate(snap.buckets.get(b, []) + snap.deltas.get(b, []))
            )
            if not candidates:
                return snap
            # confirm exactly before rewriting: the stats check is an
            # over-approximation (file lsn_min covers ALL rows, not just
            # tombstones — a base file of low-lsn winners plus high-lsn
            # tombstones is a false candidate), and a rewrite that drops
            # zero rows is pure write amplification + a pointless commit
            # for every downstream tail to replay. One column-pruned
            # filtered scan of the candidate buckets only.
            probe = self.read_buckets(candidates, snapshot=snap, raw=True)
        else:
            # pre-stats table: fall back to the scan
            probe = self.read(snapshot=snap, raw=True)
        touched = [
            r["b"]
            for r in probe.filter(expr)
            .select(bucket_expr_for(snap).alias("b"))
            .distinct()
            .collect()
        ]
        if not touched:
            return snap
        kept = (
            self.read_buckets(touched, snapshot=snap, raw=True)
            .filter(~expr)
            .withColumn(BUCKET_COL, bucket_expr_for(snap))
        )
        return self.commit_bucket_rewrite(
            kept,
            touched_buckets=touched,
            batch_id=None,
            lineage={"vacuum_tombstones_below": below_lsn},
            base_snapshot=snap,
        )

    def expire_snapshots(self, keep_last: int = 2) -> int:
        """Delete data files only referenced by snapshots older than the last
        `keep_last` (Iceberg `expire_snapshots` analogue). Returns files removed.

        Retention is anchored on the POINTER, not on the highest version
        file: an orphan claim from a crashed writer (version file ahead of
        the pointer) must neither count toward retention nor cause the
        live pointed snapshot to be expired. Versions pinned by refs —
        tags, and the base versions of live branches (whose shallow clones
        borrow the pinned snapshot's files) — are never expired."""
        with open(self._pointer_path()) as fh:
            pointed = int(fh.read().strip())
        versions = sorted(
            v
            for v in (
                int(f[1:9])
                for f in os.listdir(self.meta_dir)
                if f.startswith("v") and f.endswith(".json")
            )
            if v <= pointed  # orphan claims handled by _reclaim_orphan_claim
        )
        refs = self.refs()
        pins = set(refs["tags"].values()) | {
            b["base_version"] for b in refs["branches"].values()
        }
        keep = set(versions[-keep_last:]) | {pointed} | (pins & set(versions))
        live: set[str] = set()
        live_manifests: set[str] = set()
        for v in keep:
            snap = self.snapshot_at(v)
            live.update(snap.all_files())
            live_manifests.update(snap.manifest_paths.values())
        removed = 0
        own_data = self.data_dir.rstrip(os.sep) + os.sep
        own_manifests = self.manifest_dir.rstrip(os.sep) + os.sep
        for v in versions:
            if v in keep:
                continue
            snap = self.snapshot_at(v)
            for f in snap.all_files():
                # ownership guard: only ever delete files under OUR data
                # dir — a shallow clone references the source's immutable
                # files and must never vacuum them out from under it
                if f not in live and f.startswith(own_data) and os.path.exists(f):
                    os.remove(f)
                    self._stats_cache.pop(f, None)
                    removed += 1
            for m in snap.manifest_paths.values():
                if (
                    m not in live_manifests
                    and m.startswith(own_manifests)
                    and os.path.exists(m)
                ):
                    os.remove(m)
                    self._manifest_cache.pop(m, None)
            os.remove(os.path.join(self.meta_dir, f"v{v:08d}.json"))
        return removed

    def vacuum_orphans(self, older_than_sec: float = 3600.0) -> int:
        """Remove data files referenced by NO retained snapshot — the debris
        of crashed writers (files written, process died before the pointer
        swap). Iceberg ``remove_orphan_files`` analogue. The age guard keeps
        files younger than `older_than_sec` so an IN-FLIGHT commit's freshly
        written files are never swept; run it on the maintenance schedule
        with the default or larger. Returns files removed.
        """
        cutoff = time.time() - older_than_sec
        live: set[str] = set()
        live_manifests: set[str] = set()
        for f in os.listdir(self.meta_dir):
            if f.startswith("v") and f.endswith(".json"):
                snap = self.snapshot_at(int(f[1:9]))
                live.update(snap.all_files())
                live_manifests.update(snap.manifest_paths.values())
        removed = 0
        for dirpath, dirnames, filenames in os.walk(self.data_dir, topdown=False):
            # dir mtime BEFORE sweeping its files (removal touches it): the
            # age guard keeps an in-flight write's freshly created dir alive
            try:
                dir_mtime = os.path.getmtime(dirpath)
            except FileNotFoundError:
                continue
            for fn in filenames:
                path = os.path.join(dirpath, fn)
                if path in live:
                    continue
                try:
                    if os.path.getmtime(path) < cutoff:
                        os.remove(path)
                        self._stats_cache.pop(path, None)
                        removed += 1
                except FileNotFoundError:
                    continue
            try:
                if (
                    dirpath != self.data_dir
                    and dir_mtime < cutoff
                    and not os.listdir(dirpath)
                ):
                    os.rmdir(dirpath)
            except (FileNotFoundError, OSError):
                pass
        # manifests written by failed/retried commit attempts are referenced
        # by no snapshot — sweep them on the same age guard
        if os.path.isdir(self.manifest_dir):
            for fn in os.listdir(self.manifest_dir):
                path = os.path.join(self.manifest_dir, fn)
                if path in live_manifests:
                    continue
                try:
                    if os.path.getmtime(path) < cutoff:
                        os.remove(path)
                        self._manifest_cache.pop(path, None)
                        removed += 1
                except FileNotFoundError:
                    continue
        return removed
