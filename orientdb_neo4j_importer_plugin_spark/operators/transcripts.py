"""Conversation-level analytics over replayed transcript state — the
payload-specific layer of the pipeline (the reference migrates graph
records; this engine's records are multi-turn conversations, so the
quality gates a training-data consumer needs are *structural*: turn
continuity, role alternation, event-time ordering, and a renderable
chat transcript).

Both operators consume the LWW-replayed state (one row per live
(conv_id, turn_idx)) and group by conversation:

* ``conversation_integrity`` — per-conversation structural counters used
  to gate exports (a conversation with missing turns or time-travel
  between turns is a corrupt replay or a source bug).
* ``render_conversations`` — deterministic chat-template render: ordered
  turns concatenated "role: text", with a whitespace token estimate —
  the export step that feeds sequence packing (sampling.pack_documents).

Scale shape: each is ONE shuffle on conv_id (the window sort and the
grouped aggregate share the partitioning; Spark plans a single exchange).
Conversations are bounded (thousands of turns at most), so per-group
state never approaches executor memory, and there are no joins.

Oracle twins express the identical window/agg logic in DuckDB, on the
identical LWW-reduced feed CTE — integer counters and deterministic
string concatenation only, so the driver's hash-compare applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conversation_integrity(state: DataFrame) -> DataFrame:
    """Per-conversation structural quality counters.

    Columns: conv_id, n_turns, min_turn_idx, max_turn_idx, n_missing
    (gaps inside the observed min..max turn range — index-base agnostic),
    n_role_repeats (adjacent turns with the same role), n_ts_inversions
    (event time decreasing between adjacent turns), n_tool_turns, ok
    (no gaps/repeats/inversions).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    turns = state.select(
        "conv_id",
        "turn_idx",
        "role",
        "ts",
        F.col("tool").isNotNull().cast("int").alias("is_tool"),
        (F.col("role") == F.lag("role").over(w)).cast("int").alias("role_rep"),
        (F.col("ts") < F.lag("ts").over(w)).cast("int").alias("ts_inv"),
    )
    out = turns.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.min("turn_idx").cast("long").alias("min_turn_idx"),
        F.max("turn_idx").cast("long").alias("max_turn_idx"),
        (F.max("turn_idx") - F.min("turn_idx") + 1 - F.count("*"))
        .cast("long")
        .alias("n_missing"),
        F.coalesce(F.sum("role_rep"), F.lit(0)).cast("long").alias("n_role_repeats"),
        F.coalesce(F.sum("ts_inv"), F.lit(0)).cast("long").alias("n_ts_inversions"),
        F.sum("is_tool").cast("long").alias("n_tool_turns"),
    )
    return out.withColumn(
        "ok",
        (F.col("n_missing") == 0)
        & (F.col("n_role_repeats") == 0)
        & (F.col("n_ts_inversions") == 0),
    ).orderBy("conv_id")


def conversation_integrity_sql(state_cte: str) -> str:
    """DuckDB twin. `state_cte` must be a CTE/subquery named ``state`` with
    columns (conv_id, turn_idx, role, tool, ts)."""
    return f"""
{state_cte},
turns AS (
  SELECT conv_id, turn_idx, role, ts,
         CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END AS is_tool,
         CAST(role = lag(role) OVER w AS INT) AS role_rep,
         CAST(ts < lag(ts) OVER w AS INT) AS ts_inv
  FROM state
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(min(turn_idx) AS BIGINT) AS min_turn_idx,
       CAST(max(turn_idx) AS BIGINT) AS max_turn_idx,
       CAST(max(turn_idx) - min(turn_idx) + 1 - count(*) AS BIGINT) AS n_missing,
       CAST(coalesce(sum(role_rep), 0) AS BIGINT) AS n_role_repeats,
       CAST(coalesce(sum(ts_inv), 0) AS BIGINT) AS n_ts_inversions,
       CAST(sum(is_tool) AS BIGINT) AS n_tool_turns,
       (max(turn_idx) - min(turn_idx) + 1 - count(*) = 0
        AND coalesce(sum(role_rep), 0) = 0
        AND coalesce(sum(ts_inv), 0) = 0) AS ok
FROM turns
GROUP BY conv_id
ORDER BY conv_id
"""


def render_conversations(state: DataFrame, sep: str = "\n") -> DataFrame:
    """Deterministic chat render: turns ordered by turn_idx, concatenated
    as "role: text". Columns: conv_id, n_turns, conv_text, n_tokens
    (whitespace tokens — the packing estimator's unit).

    The order-sensitive concat uses sort_array over (turn_idx, line)
    structs — an algebraic aggregate, no window needed, so the whole
    render is one map-side-combinable shuffle.
    """
    line = F.concat_ws(": ", F.col("role"), F.coalesce(F.col("text"), F.lit("")))
    packed = state.select(
        "conv_id", F.struct(F.col("turn_idx"), line.alias("line")).alias("t")
    )
    agg = packed.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("t")), lambda s: s.getField("line")
            ),
            sep,
        ).alias("conv_text"),
    )
    n_tokens = F.size(
        F.filter(F.split(F.col("conv_text"), r"\s+"), lambda x: F.length(x) > 0)
    )
    return agg.withColumn("n_tokens", n_tokens.cast("long")).orderBy("conv_id")


def render_conversations_sql(state_cte: str, sep: str = "\n") -> str:
    """DuckDB twin (string_agg ORDER BY turn_idx; same token regex as
    functions/hashes.tokens_sql)."""
    sep_lit = sep.replace("\n", "\\n")
    return f"""
{state_cte},
lines AS (
  SELECT conv_id, turn_idx,
         role || ': ' || coalesce(text, '') AS line
  FROM state
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       string_agg(line, e'{sep_lit}' ORDER BY turn_idx) AS conv_text,
       CAST(len(list_filter(
         regexp_split_to_array(string_agg(line, e'{sep_lit}' ORDER BY turn_idx), '\\s+'),
         x -> len(x) > 0)) AS BIGINT) AS n_tokens
FROM lines
GROUP BY conv_id
ORDER BY conv_id
"""


def training_examples(state: DataFrame, sep: str = "\n") -> DataFrame:
    """Ready-to-train conversation examples: the rendered transcript plus
    the per-turn supervision structure an SFT pipeline needs — which turns
    contribute loss (assistant turns) and how many tokens each side holds.

    Columns: conv_id, n_turns, text (ordered "role: text" render),
    n_tokens (whitespace tokens over all turns), loss_mask (one '0'/'1'
    char per turn in turn order — '1' = assistant turn, the compact
    engine-portable encoding of the per-turn mask array), n_loss_turns,
    n_loss_tokens (tokens inside assistant turns — the count a trainer
    actually optimizes on; the packing budget for loss-bearing content).

    Same scale shape as render_conversations: sort_array over collected
    (turn_idx, ...) structs makes the order-sensitive parts algebraic —
    ONE map-side-combinable shuffle on conv_id, no window, no join.
    """
    line = F.concat_ws(": ", F.col("role"), F.coalesce(F.col("text"), F.lit("")))
    tok = F.size(F.filter(F.split(line, r"\s+"), lambda x: F.length(x) > 0))
    packed = state.select(
        "conv_id",
        F.struct(
            F.col("turn_idx"),
            line.alias("line"),
            (F.col("role") == "assistant").cast("int").alias("m"),
            tok.cast("long").alias("tok"),
        ).alias("t"),
    )
    agg = packed.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.array_sort(F.collect_list("t")).alias("ts"),
        F.sum(F.col("t.tok")).cast("long").alias("n_tokens"),
        F.sum(F.col("t.m")).cast("long").alias("n_loss_turns"),
        F.sum(F.col("t.m") * F.col("t.tok")).cast("long").alias("n_loss_tokens"),
    )
    return agg.select(
        "conv_id",
        "n_turns",
        F.array_join(
            F.transform(F.col("ts"), lambda s: s.getField("line")), sep
        ).alias("text"),
        "n_tokens",
        F.array_join(
            F.transform(
                F.col("ts"), lambda s: s.getField("m").cast("string")
            ),
            "",
        ).alias("loss_mask"),
        "n_loss_turns",
        "n_loss_tokens",
    ).orderBy("conv_id")


def training_examples_sql(state_cte: str, sep: str = "\n") -> str:
    """DuckDB twin: string_agg ORDER BY turn_idx for the order-sensitive
    columns, plain sums for the counters; per-line token count mirrors the
    Spark whitespace-token expression."""
    sep_lit = sep.replace("\n", "\\n")
    return f"""
{state_cte},
lines AS (
  SELECT conv_id, turn_idx,
         role || ': ' || coalesce(text, '') AS line,
         CASE WHEN role = 'assistant' THEN 1 ELSE 0 END AS m
  FROM state
),
toks AS (
  SELECT *, CAST(len(list_filter(regexp_split_to_array(line, '\\s+'),
                                 x -> len(x) > 0)) AS BIGINT) AS tok
  FROM lines
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       string_agg(line, e'{sep_lit}' ORDER BY turn_idx) AS text,
       CAST(sum(tok) AS BIGINT) AS n_tokens,
       string_agg(CAST(m AS VARCHAR), '' ORDER BY turn_idx) AS loss_mask,
       CAST(sum(m) AS BIGINT) AS n_loss_turns,
       CAST(sum(m * tok) AS BIGINT) AS n_loss_tokens
FROM toks
GROUP BY conv_id
ORDER BY conv_id
"""
