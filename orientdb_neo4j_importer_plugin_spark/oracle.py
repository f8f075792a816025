"""Independent golden-state oracles for replay equivalence.

Reference analogue: ``OFunctionsHandler.haveDocumentsSameContent``
(``OFunctionsHandler.java:65-109``) — the reference's deep-equality check —
plus the per-class count assertions in ``ONeo4jImporterTest.java:146-148``.

Two independent implementations (neither uses Spark):

* ``reduce_events_python`` — pure-Python dict reducer; trivially auditable.
* ``reduce_events_duckdb`` — DuckDB window query over the same feed files; a
  *different engine* computing the same semantics, used at larger scales.

Both: sort by lsn, last write per (conv_id, turn_idx) wins, winner op='D'
removes the key, optional watermark drop of late events.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import duckdb


@dataclass(frozen=True)
class FinalRow:
    conv_id: str
    turn_idx: int
    role: str | None
    text: str | None
    tool: str | None
    ts: Any


def reduce_events_python(events: list[dict]) -> list[FinalRow]:
    """events: dicts with lsn/op/conv_id/turn_idx/role/text/tool?/ts."""
    state: dict[tuple[str, int], dict] = {}
    for ev in sorted(events, key=lambda e: e["lsn"]):
        key = (ev["conv_id"], ev["turn_idx"])
        if ev["op"] == "D":
            state.pop(key, None)
        else:
            state[key] = ev
    return [
        FinalRow(
            conv_id=k[0],
            turn_idx=k[1],
            role=v.get("role"),
            text=v.get("text"),
            tool=v.get("tool"),
            ts=v.get("ts"),
        )
        for k, v in sorted(state.items())
    ]


def reduce_events_duckdb(
    feed_glob: str, has_tool: bool = True
) -> "duckdb.DuckDBPyRelation":
    """Golden final state from feed parquet files, ordered by key."""
    tool_col = "tool, " if has_tool else ""
    q = f"""
    WITH ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx ORDER BY lsn DESC
      ) AS rn
      FROM read_parquet('{feed_glob}', union_by_name=true)
    )
    SELECT conv_id, turn_idx, role, text, {tool_col}ts
    FROM ranked WHERE rn = 1 AND op <> 'D'
    ORDER BY conv_id, turn_idx
    """
    return duckdb.sql(q)


def table_matches_oracle(
    table_rows: list[tuple], oracle_rows: list[tuple]
) -> tuple[bool, str]:
    """Deep equality with a first-mismatch diagnostic (the
    haveDocumentsSameContent analogue)."""
    if len(table_rows) != len(oracle_rows):
        return False, f"row count {len(table_rows)} != oracle {len(oracle_rows)}"
    for i, (a, b) in enumerate(zip(table_rows, oracle_rows)):
        if tuple(a) != tuple(b):
            return False, f"row {i}: {a!r} != {b!r}"
    return True, "ok"
