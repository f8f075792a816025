"""MERGE INTO: declarative row merges compiled onto the CDC apply path.

The engine's native write is a change FEED (op/lsn envelopes through
``apply_changes``); this module gives the table a direct Iceberg/Delta
``MERGE INTO``-shaped API for callers that hold a plain source DataFrame
instead of a feed — the reference's whole program is exactly one such
merge (source scan -> key lookup -> update-or-insert,
``ONeo4jImporterVerticesAndEdgesMigrator.java:268-272`` create-if-absent
keyed on the unique index), and its `-o` overwrite flag is the
delete-clause analogue.

Semantics (matching Iceberg's MERGE):

    MERGE INTO target t USING source s
      ON  <t.key = s.key for every key column>
    WHEN MATCHED [AND <matched_condition>] AND <delete_condition> THEN DELETE
    WHEN MATCHED [AND <matched_condition>] THEN UPDATE SET <assignments|*>
    WHEN NOT MATCHED [AND <not_matched_condition>] THEN INSERT <assignments|*>

Conditions and assignment values are SQL strings (or Columns) over the
aliases ``s`` (source row) and ``t`` (current target row) — the exact
surface a SQL MERGE exposes.

How it compiles (Spark-first, one pass):

1. route source keys to their buckets (driver-side metadata) and read ONLY
   those buckets' current rows, LWW-merged — the target side of a MERGE is
   never the full table;
2. LEFT-join source to target on the key columns (the target side was
   bucket-pruned; the join key set is the source, orders of magnitude
   smaller than the table at CDC scale);
3. classify every source row into D / U / I / no-op with one
   ``when``-chain and evaluate the clause assignments in the SAME select —
   the result IS a change feed at ``lsn = table max lsn + 1``;
4. hand that feed to ``apply_changes`` — exactly-once ledger, bucket
   routing, LWW storage, lineage, COW/MOR modes, schema evolution all
   inherited rather than re-implemented.

A merge is deterministic only if each target row has at most ONE source
row; like Delta/Iceberg, duplicate source keys are an error (checked with
one aggregate job; ``validate_unique=False`` skips it when the caller
already guarantees uniqueness).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..lake.table import SnapshotTable, bucket_expr
from .apply import ApplyResult, apply_changes


def _as_col(e: Column | str) -> Column:
    return F.expr(e) if isinstance(e, str) else e


def _next_lsn(table: SnapshotTable, snap) -> int:
    """First lsn strictly above every stored lsn — metadata-only (parquet
    footer stats already collected per file), so a DML statement commits
    as an ordinary CDC batch that replays AFTER the whole ingested feed."""
    stats = table.file_stats(snap)
    return 1 + max(
        (s["lsn_max"] for s in stats.values() if s.get("lsn_max") is not None),
        default=0,
    )


def merge_into(
    table: SnapshotTable,
    source: DataFrame,
    *,
    when_matched_update: dict[str, Column | str] | str | None = None,
    when_matched_delete: Column | str | None = None,
    when_not_matched_insert: dict[str, Column | str] | str | None = "*",
    matched_condition: Column | str | None = None,
    not_matched_condition: Column | str | None = None,
    batch_id: str | None = None,
    mode: str = "cow",
    validate_unique: bool = True,
    quarantine: bool = False,
) -> ApplyResult:
    """Merge `source` into `table` on the table's key columns.

    Clause semantics (first match wins, per Iceberg/Delta):
      * `when_matched_delete` — matched rows satisfying this condition are
        deleted;
      * `when_matched_update` — remaining matched rows (satisfying
        `matched_condition`, if given) are updated. ``"*"`` assigns every
        source payload column; a dict assigns named columns from
        s/t-referencing expressions, untouched columns keep ``t``'s value;
      * `when_not_matched_insert` — unmatched source rows (satisfying
        `not_matched_condition`, if given) are inserted. ``"*"`` inserts
        the source payload; a dict builds the row from expressions
        (unassigned columns null).
      * Source rows matching no clause are no-ops.

    Returns the underlying `apply_changes` result (exactly-once per
    `batch_id`, COW or MOR like any CDC batch). The merge's events commit
    at ``max stored lsn + 1``, so CDC consumers (changelog, mirrors,
    streamed views) see it as one ordinary atomic batch.
    """
    if (
        when_matched_update is None
        and when_matched_delete is None
        and when_not_matched_insert is None
    ):
        raise ValueError("merge_into with no clauses is a no-op; give at least one")
    snap = table.current()
    keys = snap.keys
    missing = [k for k in keys if k not in source.columns]
    if missing:
        raise ValueError(f"source is missing key columns {missing}")
    if validate_unique:
        dup = (
            source.groupBy(*keys)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"source has multiple rows for key {tuple(dup[0][k] for k in keys)}; "
                "a MERGE with duplicate source keys is nondeterministic "
                "(dedupe first, or use a change feed with lsns via apply_changes)"
            )

    payload = [f.name for f in snap.schema.fields]
    types = {f.name: f.dataType for f in snap.schema.fields}
    pk_t = types[snap.partition_key]

    # target side: only the buckets the source's keys can live in
    touched = sorted(
        r["b"]
        for r in source.select(
            bucket_expr(snap.partition_key, snap.num_buckets, pk_t).alias("b")
        )
        .distinct()
        .collect()
    )
    target = table.read_buckets(touched, snapshot=snap) if touched else table.read(snap)

    s = source.alias("s")
    t = target.alias("t")
    joined = s.join(
        t, on=[F.col(f"s.{k}").eqNullSafe(F.col(f"t.{k}")) for k in keys], how="left"
    )
    matched = F.col(f"t.{keys[0]}").isNotNull()
    m_gate = matched & (
        _as_col(matched_condition) if matched_condition is not None else F.lit(True)
    )
    i_gate = ~matched & (
        _as_col(not_matched_condition)
        if not_matched_condition is not None
        else F.lit(True)
    )

    op = F.lit(None).cast("string")
    if when_not_matched_insert is not None:
        op = F.when(i_gate, F.lit("I")).otherwise(op)
    if when_matched_update is not None:
        op = F.when(m_gate, F.lit("U")).otherwise(op)
    if when_matched_delete is not None:  # delete outranks update on a match
        op = F.when(m_gate & _as_col(when_matched_delete), F.lit("D")).otherwise(op)

    src_payload = {c for c in source.columns if c not in keys}
    known = {c.lower() for c in payload}
    for clause, action in (
        ("when_matched_update", when_matched_update),
        ("when_not_matched_insert", when_not_matched_insert),
    ):
        if isinstance(action, dict):
            bad = [c for c in action if c.lower() not in known]
            if bad:
                raise ValueError(
                    f"{clause} assigns unknown columns {bad} "
                    f"(table columns: {payload}); merge_into never evolves "
                    "schema — add columns via apply_changes/evolve_schema first"
                )

    def _assigned(action, c: str) -> Column | None:
        # "*" on UPDATE: columns the source lacks keep the target's value
        # (returning None routes to the t-fallback); on INSERT they null.
        if action == "*":
            return F.col(f"s.{c}") if c in src_payload else None
        e = action.get(c)
        return _as_col(e) if e is not None else None

    def _value(c: str) -> Column:
        if c in keys:
            return F.col(f"s.{c}")
        v = F.lit(None).cast(types[c])
        if when_not_matched_insert is not None:
            ins = _assigned(when_not_matched_insert, c)
            v = F.when(
                F.col("op") == "I",
                ins if ins is not None else F.lit(None).cast(types[c]),
            ).otherwise(v)
        if when_matched_update is not None:
            # unassigned columns keep the target's value on UPDATE
            upd = _assigned(when_matched_update, c)
            v = F.when(
                F.col("op") == "U", upd if upd is not None else F.col(f"t.{c}")
            ).otherwise(v)
        return v

    # merge commits one event per affected key ABOVE every stored lsn:
    # CDC consumers replay it as an ordinary batch
    lsn = _next_lsn(table, snap)
    events = (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            F.col("op"),
            F.lit(lsn).cast("long").alias("lsn"),
            *[_value(c).alias(c) for c in payload],
        )
    )
    return apply_changes(
        events,
        table,
        batch_id=batch_id,
        mode=mode,
        quarantine=quarantine,
        lineage_extra={"merge_into": True},
    )


def delete_where(
    table: SnapshotTable,
    condition: Column | str,
    *,
    batch_id: str | None = None,
    mode: str = "cow",
    quarantine: bool = False,
) -> ApplyResult:
    """``DELETE FROM table WHERE condition`` compiled onto the CDC path.

    Iceberg/Delta-shaped predicate delete — the reference's ``-o``
    overwrite drop is the degenerate ``condition=lit(True)`` case
    (``ONeo4jImporterPlugin.java`` option handling). `condition` is a SQL
    string (or Column) over the table's columns, evaluated against the
    current LWW state; rows where it is TRUE are deleted (NULL/FALSE
    keep the row, standard three-valued DELETE semantics).

    Plan: one scan of the merged state to find victims — a predicate on
    the key columns pushes below the LWW window, so key-targeted deletes
    prune at the parquet scan — then one D event per victim key at
    ``max stored lsn + 1`` through `apply_changes`, which bucket-routes
    the rewrite to touched buckets only (COW) or appends tombstone
    deltas (MOR). Exactly-once per `batch_id`; CDC consumers (changelog,
    mirrors, streamed views) replay it as one ordinary atomic batch.
    """
    snap = table.current()
    keys = snap.keys
    payload = [f.name for f in snap.schema.fields]
    types = {f.name: f.dataType for f in snap.schema.fields}
    lsn = _next_lsn(table, snap)
    events = (
        table.read(snap)
        .filter(_as_col(condition))
        .select(
            F.lit("D").alias("op"),
            F.lit(lsn).cast("long").alias("lsn"),
            *[
                (F.col(c) if c in keys else F.lit(None).cast(types[c])).alias(c)
                for c in payload
            ],
        )
    )
    return apply_changes(
        events,
        table,
        batch_id=batch_id,
        mode=mode,
        quarantine=quarantine,
        lineage_extra={"delete_where": True},
    )


def update_where(
    table: SnapshotTable,
    condition: Column | str,
    assignments: dict[str, Column | str],
    *,
    batch_id: str | None = None,
    mode: str = "cow",
    quarantine: bool = False,
) -> ApplyResult:
    """``UPDATE table SET assignments WHERE condition`` on the CDC path.

    `assignments` maps column name -> SQL expression (or Column) over the
    row's CURRENT values (``{"text": "upper(text)"}``); unassigned
    columns keep their value — the emitted U event carries the full row,
    so downstream LWW replicas converge bit-identically. Key columns
    cannot be assigned (a key change is a delete + insert — use
    `merge_into` or two statements; silently rerouting rows between
    buckets inside an UPDATE invites lost-update surprises).

    Same plan shape as `delete_where`: one state scan for victims
    (key-column predicates push below the LWW window and prune the
    parquet scan), one full-row U event per victim at
    ``max stored lsn + 1``, exactly-once through `apply_changes`.
    """
    if not assignments:
        raise ValueError("update_where with no assignments is a no-op; give at least one")
    snap = table.current()
    keys = snap.keys
    payload = [f.name for f in snap.schema.fields]
    types = {f.name: f.dataType for f in snap.schema.fields}
    known = {c.lower(): c for c in payload}
    bad = [c for c in assignments if c.lower() not in known]
    if bad:
        raise ValueError(
            f"update_where assigns unknown columns {bad} (table columns: "
            f"{payload}); UPDATE never evolves schema — add columns via "
            "apply_changes/evolve_schema first"
        )
    keyed = [c for c in assignments if known[c.lower()] in keys]
    if keyed:
        raise ValueError(
            f"update_where cannot assign key columns {keyed}: a key change "
            "is a delete + insert (use merge_into, or delete_where + "
            "apply_changes)"
        )
    assigned = {known[c.lower()]: _as_col(e) for c, e in assignments.items()}
    lsn = _next_lsn(table, snap)
    events = (
        table.read(snap)
        .filter(_as_col(condition))
        .select(
            F.lit("U").alias("op"),
            F.lit(lsn).cast("long").alias("lsn"),
            *[
                (assigned[c].cast(types[c]) if c in assigned else F.col(c)).alias(c)
                for c in payload
            ],
        )
    )
    return apply_changes(
        events,
        table,
        batch_id=batch_id,
        mode=mode,
        quarantine=quarantine,
        lineage_extra={"update_where": True},
    )


def restore_as_of(
    table: SnapshotTable,
    to: int | str,
    *,
    batch_id: str | None = None,
    mode: str = "cow",
    quarantine: bool = False,
) -> ApplyResult | None:
    """``RESTORE TABLE ... [VERSION|TAG] AS OF`` as COMPENSATING CDC events
    (Delta RESTORE analogue, re-expressed for a replicated lake).

    A pointer rollback would silently break every downstream consumer: the
    restored rows carry their ORIGINAL (older) lsns, so a mirror or
    streamed view that already saw the newer writes would reject the
    rollback by LWW and diverge forever. Instead, restore computes the
    per-key diff between the current state and the target snapshot —
    `table.changelog(current, target)` run backwards, whose candidate set
    comes from the file-level diff, so cost is O(changed keys), never
    O(table) — and applies it as ONE ordinary batch at ``max stored
    lsn + 1`` through `apply_changes`. History moves FORWARD to the old
    state: exactly-once per batch_id, changelog/mirror/view consumers
    replay it like any other commit and converge, and the batch ledger is
    preserved (a batch applied before the restore point stays a no-op on
    replay — restore compensates state, it does not forget history).

    `to` is a retained version number or a tag name. Columns added to the
    schema AFTER the target snapshot stay in the schema and are nulled on
    restored rows (values revert; schema evolution is not undone —
    narrowing a schema under live readers is a different, breaking
    operation). Requires the target snapshot to be retained
    (`expire_snapshots` horizon) — pin it with `create_tag` first for
    planned restore points. Returns None if the table is already at the
    target version."""
    snap = table.current()
    target = (
        table.snapshot_at_tag(to) if isinstance(to, str) else table.snapshot_at(to)
    )
    if target.version == snap.version:
        return None
    payload = [f.name for f in snap.schema.fields]
    types = {f.name: f.dataType for f in snap.schema.fields}
    keys = set(snap.keys)
    diff = table.changelog(snap.version, target.version)
    have = set(diff.columns)
    lsn = _next_lsn(table, snap)
    events = diff.select(
        F.col("op"),
        F.lit(lsn).cast("long").alias("lsn"),
        *[
            (
                # keys always present; payload columns added after the
                # target snapshot are absent from the diff -> null them
                F.col(c).cast(types[c])
                if (c in have or c in keys)
                else F.lit(None).cast(types[c])
            ).alias(c)
            for c in payload
        ],
    )
    return apply_changes(
        events,
        table,
        batch_id=batch_id or f"__restore__v{target.version}@{snap.version}",
        mode=mode,
        quarantine=quarantine,
        lineage_extra={"restore_as_of": target.version},
    )
