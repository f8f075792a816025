"""Conversation-level analytics over replayed transcript state — the
payload-specific layer of the pipeline (the reference migrates graph
records; this engine's records are multi-turn conversations, so the
quality gates a training-data consumer needs are *structural*: turn
continuity, role alternation, event-time ordering, and a renderable
chat transcript).

All operators consume the LWW-replayed state (one row per live
(conv_id, turn_idx)) and group by conversation:

* ``conversation_integrity`` — per-conversation structural counters used
  to gate exports (a conversation with missing turns or time-travel
  between turns is a corrupt replay or a source bug).
* ``render_conversations`` — deterministic chat-template render: ordered
  turns concatenated "role: text", with a whitespace token estimate —
  the export step that feeds sequence packing (sampling.pack_documents).
* ``training_examples`` — whole-conversation SFT examples with per-turn
  loss masks and loss-bearing token counts.
* ``sft_pairs`` — per-assistant-turn (prompt, completion) pair export.
* ``truncate_to_budget`` — context-window fitting: longest turn-suffix
  under a token budget, rendered.
* ``merge_consecutive_roles`` — gaps-and-islands repair of adjacent
  same-role turns (the fix for ``n_role_repeats``).
* ``conversation_template_groups`` — template-level conversation dedup
  (canonicalized-render hash groups).

Scale shape: each is ONE shuffle on conv_id (windows and the grouped
aggregate share the partitioning; Spark plans a single exchange);
template dedup adds one bounded (hash, conv_id) shuffle.
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
    # n_tokens rides the aggregate as a SUM of per-line token counts —
    # identical to tokenizing the joined text (the separator is whitespace,
    # so tokens never span lines) and it avoids re-splitting the full
    # conversation string after the agg (round 6; guide §2.3 aggregate
    # before you shuffle).
    tok = F.size(F.filter(F.split(line, r"\s+"), lambda x: F.length(x) > 0))
    packed = state.select(
        "conv_id",
        F.struct(F.col("turn_idx"), line.alias("line")).alias("t"),
        tok.cast("long").alias("__tok"),
    )
    agg = packed.groupBy("conv_id").agg(
        F.count("*").cast("long").alias("n_turns"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("t")), lambda s: s.getField("line")
            ),
            sep,
        ).alias("conv_text"),
        F.sum("__tok").cast("long").alias("n_tokens"),
    )
    return agg.select("conv_id", "n_turns", "conv_text", "n_tokens").orderBy(
        "conv_id"
    )


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


def _ws_tokens(col):
    """Whitespace token count (the packing estimator's unit) — same
    expression family as functions/hashes.tokens_sql."""
    return F.size(F.filter(F.split(col, r"\s+"), lambda x: F.length(x) > 0)).cast(
        "long"
    )


def _ws_tokens_sql(expr: str) -> str:
    return (
        f"CAST(len(list_filter(regexp_split_to_array({expr}, '\\s+'), "
        "x -> len(x) > 0)) AS BIGINT)"
    )


def sft_pairs(state: DataFrame, sep: str = "\n") -> DataFrame:
    """Prompt/completion pair extraction — one training pair per assistant
    turn: prompt = ordered "role: text" render of every PRIOR turn,
    completion = the assistant turn's own text. The standard SFT export
    when a trainer wants per-turn examples instead of whole-conversation
    loss masks (`training_examples` is the masked-whole-conversation
    sibling).

    Columns: conv_id, turn_idx, prompt ('' for a conversation-opening
    assistant turn), completion, n_prompt_tokens, n_completion_tokens.

    Scale shape: ONE shuffle on conv_id; the prefix render is a running
    window over each conversation (bounded group size), and array_sort on
    (turn_idx, line) structs keeps the concat order-deterministic however
    the window buffers rows. No join; output is at most one row per turn.
    """
    line = F.concat_ws(": ", F.col("role"), F.coalesce(F.col("text"), F.lit("")))
    turns = state.select(
        "conv_id",
        "turn_idx",
        "role",
        F.coalesce(F.col("text"), F.lit("")).alias("completion"),
        F.struct(F.col("turn_idx"), line.alias("line")).alias("t"),
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prompt = F.array_join(
        F.transform(
            F.array_sort(F.collect_list("t").over(w)), lambda s: s.getField("line")
        ),
        sep,
    )
    return (
        turns.withColumn("prompt", F.coalesce(prompt, F.lit("")))
        .filter(F.col("role") == "assistant")
        .select(
            "conv_id",
            "turn_idx",
            "prompt",
            "completion",
            _ws_tokens(F.col("prompt")).alias("n_prompt_tokens"),
            _ws_tokens(F.col("completion")).alias("n_completion_tokens"),
        )
        .orderBy("conv_id", "turn_idx")
    )


def sft_pairs_sql(state_cte: str, sep: str = "\n") -> str:
    """DuckDB twin: windowed string_agg over the UNBOUNDED PRECEDING..1
    PRECEDING frame reproduces the prior-turns render."""
    sep_lit = sep.replace("\n", "\\n")
    return f"""
{state_cte},
lines AS (
  SELECT conv_id, turn_idx, role,
         coalesce(text, '') AS completion,
         role || ': ' || coalesce(text, '') AS line
  FROM state
),
pr AS (
  SELECT conv_id, turn_idx, role, completion,
         coalesce(string_agg(line, e'{sep_lit}') OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), '') AS prompt
  FROM lines
)
SELECT conv_id, turn_idx, prompt, completion,
       {_ws_tokens_sql('prompt')} AS n_prompt_tokens,
       {_ws_tokens_sql('completion')} AS n_completion_tokens
FROM pr WHERE role = 'assistant'
ORDER BY conv_id, turn_idx
"""


def truncate_to_budget(
    state: DataFrame, max_tokens: int, sep: str = "\n"
) -> DataFrame:
    """Context-window fitting at TURN boundaries: keep the longest suffix
    of each conversation whose cumulative whitespace-token count fits
    `max_tokens` (most-recent turns win — the standard chat-context
    truncation rule), then render the kept turns. A conversation whose
    final turn alone exceeds the budget yields no row.

    Columns: conv_id, n_turns_kept, n_turns_dropped, first_kept_turn,
    text, n_tokens.

    Scale shape: ONE shuffle on conv_id shared by the suffix-sum window
    and the grouped render; per-group state is bounded by conversation
    length. No join.
    """
    line = F.concat_ws(": ", F.col("role"), F.coalesce(F.col("text"), F.lit("")))
    turns = state.select(
        "conv_id",
        "turn_idx",
        F.struct(F.col("turn_idx"), line.alias("line")).alias("t"),
        _ws_tokens(line).alias("tok"),
    )
    w_suffix = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("turn_idx").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_conv = Window.partitionBy("conv_id")
    kept = (
        turns.withColumn("suffix_tokens", F.sum("tok").over(w_suffix))
        .withColumn("n_total", F.count("*").over(w_conv))
        .filter(F.col("suffix_tokens") <= max_tokens)
    )
    return (
        kept.groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_turns_kept"),
            (F.max("n_total") - F.count("*")).cast("long").alias("n_turns_dropped"),
            F.min("turn_idx").cast("long").alias("first_kept_turn"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("t")), lambda s: s.getField("line")
                ),
                sep,
            ).alias("text"),
            F.sum("tok").cast("long").alias("n_tokens"),
        )
        .orderBy("conv_id")
    )


def truncate_to_budget_sql(state_cte: str, max_tokens: int, sep: str = "\n") -> str:
    """DuckDB twin: suffix token sum via ORDER BY turn_idx DESC running
    window, then group-render the surviving turns."""
    sep_lit = sep.replace("\n", "\\n")
    return f"""
{state_cte},
lines AS (
  SELECT conv_id, turn_idx,
         role || ': ' || coalesce(text, '') AS line,
         {_ws_tokens_sql("role || ': ' || coalesce(text, '')")} AS tok
  FROM state
),
suff AS (
  SELECT *,
         sum(tok) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS suffix_tokens,
         count(*) OVER (PARTITION BY conv_id) AS n_total
  FROM lines
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns_kept,
       CAST(max(n_total) - count(*) AS BIGINT) AS n_turns_dropped,
       CAST(min(turn_idx) AS BIGINT) AS first_kept_turn,
       string_agg(line, e'{sep_lit}' ORDER BY turn_idx) AS text,
       CAST(sum(tok) AS BIGINT) AS n_tokens
FROM suff WHERE suffix_tokens <= {max_tokens}
GROUP BY conv_id
ORDER BY conv_id
"""


def merge_consecutive_roles(state: DataFrame, sep: str = " ") -> DataFrame:
    """Transcript repair: merge runs of ADJACENT same-role turns into one
    turn (gaps-and-islands on turn order) — the canonical fix for the
    `n_role_repeats` defect `conversation_integrity` counts, applied
    before rendering/export so chat templates that require strict role
    alternation don't reject the conversation.

    Island id = row_number over the conversation minus row_number within
    (conversation, role): constant exactly across a run of equal roles.

    Columns: conv_id, turn_idx (first turn of the run), role, text
    (run texts joined by `sep`, turn order), n_merged, ts (run minimum).

    Scale shape: both row_numbers and the grouped merge share ONE
    conv_id-clustered shuffle; no join.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    wr = Window.partitionBy("conv_id", "role").orderBy("turn_idx")
    runs = state.withColumn(
        "grp", F.row_number().over(w) - F.row_number().over(wr)
    ).select(
        "conv_id",
        "role",
        "grp",
        "turn_idx",
        "ts",
        F.struct(
            F.col("turn_idx"),
            F.coalesce(F.col("text"), F.lit("")).alias("body"),
        ).alias("t"),
    )
    return (
        runs.groupBy("conv_id", "role", "grp")
        .agg(
            F.min("turn_idx").cast("long").alias("turn_idx"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("t")), lambda s: s.getField("body")
                ),
                sep,
            ).alias("text"),
            F.count("*").cast("long").alias("n_merged"),
            F.min("ts").alias("ts"),
        )
        .select("conv_id", "turn_idx", "role", "text", "n_merged", "ts")
        .orderBy("conv_id", "turn_idx")
    )


def merge_consecutive_roles_sql(state_cte: str, sep: str = " ") -> str:
    """DuckDB twin: identical islands arithmetic (unique (conv_id,
    turn_idx) makes both row_numbers deterministic)."""
    sep_lit = sep.replace("\n", "\\n")
    return f"""
{state_cte},
runs AS (
  SELECT conv_id, role, turn_idx, ts, coalesce(text, '') AS body,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
         - row_number() OVER (PARTITION BY conv_id, role ORDER BY turn_idx)
           AS grp
  FROM state
)
SELECT conv_id,
       CAST(min(turn_idx) AS BIGINT) AS turn_idx,
       role,
       string_agg(body, e'{sep_lit}' ORDER BY turn_idx) AS text,
       CAST(count(*) AS BIGINT) AS n_merged,
       min(ts) AS ts
FROM runs
GROUP BY conv_id, role, grp
ORDER BY conv_id, turn_idx
"""


def conversation_template_groups(state: DataFrame, sep: str = "\n") -> DataFrame:
    """Conversation-level template dedup: two conversations are template
    duplicates when their renders are identical AFTER canonicalization
    (lowercase, digit runs stripped, whitespace collapsed) — the
    transcript analogue of the documents family's exact dedup, catching
    form-letter/boilerplate conversations that differ only in numbers.

    Columns (duplicate groups only, n_convs >= 2): tmpl_hash (portable
    md5-derived 60-bit hash of the canonical render), n_convs,
    keep_conv_id (min — the deterministic survivor). Group members are
    NOT materialized as a list column: a boilerplate template class can
    hold millions of conversations at scale, and per-group state must
    stay bounded (join back on tmpl_hash to enumerate members).

    Scale shape: per-conversation render is one conv_id shuffle; the
    group stage shuffles ONE (hash, conv_id) row per conversation —
    corpus text never moves twice. Same two-stage shape as
    dedup.exact_dup_groups.
    """
    from orientdb_neo4j_importer_plugin_spark.functions.hashes import h64

    canon_line = F.concat_ws(
        ": ",
        F.col("role"),
        F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.lower(F.coalesce(F.col("text"), F.lit(""))), "[0-9]+", ""
                ),
                r"\s+",
                " ",
            )
        ),
    )
    packed = state.select(
        "conv_id", F.struct(F.col("turn_idx"), canon_line.alias("line")).alias("t")
    )
    rendered = packed.groupBy("conv_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("t")), lambda s: s.getField("line")
            ),
            sep,
        ).alias("canon_text")
    )
    return (
        rendered.select("conv_id", h64(F.col("canon_text")).alias("tmpl_hash"))
        .groupBy("tmpl_hash")
        .agg(
            F.count("*").cast("long").alias("n_convs"),
            F.min("conv_id").alias("keep_conv_id"),
        )
        .filter(F.col("n_convs") >= 2)
        .orderBy("keep_conv_id")
    )


def conversation_template_groups_sql(state_cte: str, sep: str = "\n") -> str:
    """DuckDB twin: same canonicalization regexes, md5-derived hash
    (functions/hashes.h64_sql), string_agg ORDER BY conv_id."""
    from orientdb_neo4j_importer_plugin_spark.functions.hashes import h64_sql

    sep_lit = sep.replace("\n", "\\n")
    canon = (
        "role || ': ' || trim(regexp_replace(regexp_replace("
        "lower(coalesce(text, '')), '[0-9]+', '', 'g'), '\\s+', ' ', 'g'))"
    )
    return f"""
{state_cte},
lines AS (
  SELECT conv_id, turn_idx, {canon} AS line FROM state
),
rendered AS (
  SELECT conv_id,
         string_agg(line, e'{sep_lit}' ORDER BY turn_idx) AS canon_text
  FROM lines GROUP BY conv_id
),
tmpl_hashed AS (
  SELECT conv_id, {h64_sql('canon_text')} AS tmpl_hash FROM rendered
)
SELECT tmpl_hash,
       CAST(count(*) AS BIGINT) AS n_convs,
       min(conv_id) AS keep_conv_id
FROM tmpl_hashed
GROUP BY tmpl_hash
HAVING count(*) >= 2
ORDER BY keep_conv_id
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


def export_pipeline(
    state: DataFrame, max_tokens: int, sep: str = "\n"
) -> DataFrame:
    """Composed conversation-export pipeline — the transcripts-axis
    sibling of `pipeline.training_pipeline`: structural integrity gate ->
    adjacent-role repair -> context-budget truncation -> rendered
    examples, as ONE declarative plan.

    Stages (each reusing its standalone operator's logic):

    1. GATE: keep conversations with no missing turns and no adjacent
       same-role runs longer than the repair can normalize — here, the
       `conversation_integrity` counters `n_missing == 0` (a gap means a
       corrupt replay; role repeats are repairable, time inversions are
       tolerated as source skew).
    2. REPAIR: `merge_consecutive_roles` (islands merge), so chat
       templates that require strict alternation accept the output.
    3. FIT: `truncate_to_budget` over the repaired turns.

    Scale shape: the integrity gate joins back on conv_id — the same
    clustering every later stage needs, so the whole pipeline shares one
    conv_id exchange lineage; no broadcast of per-conversation state is
    required and group state stays bounded by conversation length.
    """
    gate = (
        conversation_integrity(state)
        .filter(F.col("n_missing") == 0)
        .select("conv_id")
    )
    kept = state.join(gate, "conv_id")
    repaired = merge_consecutive_roles(kept, sep=" ").select(
        "conv_id", "turn_idx", "role", "text",
        F.col("ts"),
    )
    return truncate_to_budget(repaired, max_tokens=max_tokens, sep=sep)


def export_pipeline_sql(
    state_cte: str, max_tokens: int, sep: str = "\n"
) -> str:
    """DuckDB twin: the same stage chain as one CTE pipeline (integrity
    counters -> gate join -> islands merge -> suffix-sum truncation ->
    grouped render)."""
    sep_lit = sep.replace("\n", "\\n")
    return f"""
{state_cte},
xp_stats AS (
  SELECT conv_id,
         max(turn_idx) - min(turn_idx) + 1 - count(*) AS n_missing
  FROM state GROUP BY conv_id
),
xp_kept AS (
  SELECT s.* FROM state s
  JOIN xp_stats g ON s.conv_id = g.conv_id AND g.n_missing = 0
),
xp_runs AS (
  SELECT conv_id, role, turn_idx, coalesce(text, '') AS body,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
         - row_number() OVER (PARTITION BY conv_id, role ORDER BY turn_idx)
           AS grp
  FROM xp_kept
),
xp_merged AS (
  SELECT conv_id,
         CAST(min(turn_idx) AS BIGINT) AS turn_idx,
         role,
         string_agg(body, ' ' ORDER BY turn_idx) AS text
  FROM xp_runs GROUP BY conv_id, role, grp
),
xp_lines AS (
  SELECT conv_id, turn_idx,
         role || ': ' || coalesce(text, '') AS line,
         {_ws_tokens_sql("role || ': ' || coalesce(text, '')")} AS tok
  FROM xp_merged
),
xp_suff AS (
  SELECT *,
         sum(tok) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS suffix_tokens,
         count(*) OVER (PARTITION BY conv_id) AS n_total
  FROM xp_lines
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns_kept,
       CAST(max(n_total) - count(*) AS BIGINT) AS n_turns_dropped,
       CAST(min(turn_idx) AS BIGINT) AS first_kept_turn,
       string_agg(line, e'{sep_lit}' ORDER BY turn_idx) AS text,
       CAST(sum(tok) AS BIGINT) AS n_tokens
FROM xp_suff WHERE suffix_tokens <= {max_tokens}
GROUP BY conv_id
ORDER BY conv_id
"""


def tool_transitions(state: DataFrame) -> DataFrame:
    """Tool-call transition mining over agent transcripts: within each
    conversation, order the tool-bearing turns by turn_idx and count the
    (from_tool -> to_tool) adjacencies across the corpus — the Markov
    view of agent workflows ("which tool follows which"). A conversation's
    first tool call is counted as a transition from the virtual
    ``<start>`` marker, so per-tool entry-point frequency falls out of the
    same table.

    Columns: from_tool, to_tool, n_transitions, n_convs (distinct
    conversations exhibiting the transition).

    Reference analogue: the importer's per-relationship-type counters
    (``ONeo4jImporterStatistics.java:30-63``) generalized from type counts
    to type *adjacency* counts.

    Scale shape: the lag window clusters on conv_id (the table's
    partition key — the exchange is shared with every other
    conversation-level operator in a composed plan). n_convs is computed
    as a TWO-PHASE aggregate — per-(pair, conv) counts first, then the
    pair rollup — instead of countDistinct: a conversation's rows are
    co-located after the window, so the map-side combine collapses the
    first phase to O(distinct pairs per conv) BEFORE its exchange,
    where countDistinct's expand would shuffle every tool turn
    (measured x2.3 on this op at the x10 stress scale: 40.8s -> 17.8s at sf1).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = (
        state.filter(F.col("tool").isNotNull())
        .select(
            "conv_id",
            F.coalesce(F.lag("tool").over(w), F.lit("<start>")).alias("from_tool"),
            F.col("tool").alias("to_tool"),
        )
    )
    per_conv = pairs.groupBy("from_tool", "to_tool", "conv_id").agg(
        F.count("*").alias("n")
    )
    return (
        per_conv.groupBy("from_tool", "to_tool")
        .agg(
            F.sum("n").cast("long").alias("n_transitions"),
            F.count("*").cast("long").alias("n_convs"),
        )
        .orderBy("from_tool", "to_tool")
    )


def tool_transitions_sql(state_cte: str) -> str:
    """DuckDB twin. `state_cte` must define ``state`` with columns
    (conv_id, turn_idx, tool)."""
    return f"""
{state_cte},
tt_pairs AS (
  SELECT conv_id,
         coalesce(lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx),
                  '<start>') AS from_tool,
         tool AS to_tool
  FROM state WHERE tool IS NOT NULL
)
SELECT from_tool, to_tool,
       CAST(count(*) AS BIGINT) AS n_transitions,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM tt_pairs
GROUP BY from_tool, to_tool
ORDER BY from_tool, to_tool
"""


def tool_usage_stats(state: DataFrame) -> DataFrame:
    """Per-tool usage profile over agent transcripts: call volume, spread
    across conversations, output size (whitespace tokens of the tool
    turns' text — same estimator unit as the packing/truncation family),
    and the turn-position envelope (min/max turn_idx at which the tool
    appears — early-turn tools are routers, late-turn tools are
    finishers). All counters exact integers, so the cross-engine hash is
    stable.

    Columns: tool, n_calls, n_convs, n_tokens, min_turn_idx, max_turn_idx.

    Scale shape: two-phase aggregate (per-(tool, conv) partials, then the
    tool rollup) rather than countDistinct — every counter is algebraic
    at both levels, so the map-side combine collapses phase one to
    O(tools x convs-per-partition) before the only exchange;
    countDistinct's expand would shuffle every tool turn instead.
    """
    calls = state.filter(F.col("tool").isNotNull())
    per_conv = calls.groupBy("tool", "conv_id").agg(
        F.count("*").alias("n"),
        F.sum(_ws_tokens(F.coalesce(F.col("text"), F.lit("")))).alias("tok"),
        F.min("turn_idx").alias("lo"),
        F.max("turn_idx").alias("hi"),
    )
    return (
        per_conv.groupBy("tool")
        .agg(
            F.sum("n").cast("long").alias("n_calls"),
            F.count("*").cast("long").alias("n_convs"),
            F.sum("tok").cast("long").alias("n_tokens"),
            F.min("lo").cast("long").alias("min_turn_idx"),
            F.max("hi").cast("long").alias("max_turn_idx"),
        )
        .orderBy("tool")
    )


def tool_usage_stats_sql(state_cte: str) -> str:
    """DuckDB twin (same token regex as _ws_tokens_sql)."""
    return f"""
{state_cte}
SELECT tool,
       CAST(count(*) AS BIGINT) AS n_calls,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(sum({_ws_tokens_sql("coalesce(text, '')")}) AS BIGINT) AS n_tokens,
       CAST(min(turn_idx) AS BIGINT) AS min_turn_idx,
       CAST(max(turn_idx) AS BIGINT) AS max_turn_idx
FROM state WHERE tool IS NOT NULL
GROUP BY tool
ORDER BY tool
"""


def conversation_churn(envelope: DataFrame) -> DataFrame:
    """Per-conversation churn between two table snapshots, computed over a
    `SnapshotTable.changelog_envelope` diff (op + before/after images):
    how many turns appeared / vanished / were rewritten, and the token
    movement (whitespace tokens, the same estimator unit as the packing
    family). The training-data view of CDC: which conversations changed
    enough since the last export to re-render, and by how much.

    Columns: conv_id, n_new_turns, n_dropped_turns, n_rewritten_turns,
    tokens_before, tokens_after, tokens_delta (all exact BIGINTs).

    Scale shape: input is O(changed data) by the envelope's construction;
    ONE algebraic groupBy on conv_id — the same clustering the envelope's
    diff join already produced, so no second exchange in a composed plan.
    """
    tb = _ws_tokens(F.coalesce(F.col("before.text"), F.lit("")))
    ta = _ws_tokens(F.coalesce(F.col("after.text"), F.lit("")))
    return (
        envelope.groupBy("conv_id")
        .agg(
            F.sum((F.col("op") == "I").cast("long")).alias("n_new_turns"),
            F.sum((F.col("op") == "D").cast("long")).alias("n_dropped_turns"),
            F.sum((F.col("op") == "U").cast("long")).alias("n_rewritten_turns"),
            F.sum(tb).alias("tokens_before"),
            F.sum(ta).alias("tokens_after"),
            F.sum(ta - tb).alias("tokens_delta"),
        )
        .orderBy("conv_id")
    )


def conversation_churn_sql(env_cte: str) -> str:
    """DuckDB twin. `env_cte` must define ``env`` with columns
    (conv_id, op, b_text, a_text) — op in I/U/D, b_text/a_text the
    before/after turn texts (null when that image is absent)."""
    tb = _ws_tokens_sql("coalesce(b_text, '')")
    ta = _ws_tokens_sql("coalesce(a_text, '')")
    return f"""
{env_cte}
SELECT conv_id,
       CAST(sum(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT) AS n_new_turns,
       CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_turns,
       CAST(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_rewritten_turns,
       CAST(sum({tb}) AS BIGINT) AS tokens_before,
       CAST(sum({ta}) AS BIGINT) AS tokens_after,
       CAST(sum({ta} - {tb}) AS BIGINT) AS tokens_delta
FROM env
GROUP BY conv_id
ORDER BY conv_id
"""


def tool_paths(state: DataFrame, max_steps: int = 16) -> DataFrame:
    """Workflow mining over agent transcripts: each conversation's ordered
    tool-call sequence collapsed to a path string ("a -> b -> c"), counted
    across the corpus — which end-to-end tool workflows actually occur,
    and how often. `path_len` is the FULL tool-call count; the rendered
    path is bounded to the first `max_steps` calls so pathological
    conversations cannot produce unbounded group keys (the same
    bounded-state discipline as conversation_template_groups).

    Columns: path, path_len, n_convs.

    Scale shape: the per-conversation sequence is ONE algebraic
    sort_array(collect_list) aggregate on the conv_id clustering (no
    window), then a count over the path vocabulary — map-side combinable
    at both levels; group state is bounded by max_steps.
    """
    calls = state.filter(F.col("tool").isNotNull())
    per_conv = calls.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("turn_idx"), F.col("tool")))
        ).alias("seq")
    )
    path = F.array_join(
        F.slice(
            F.transform(F.col("seq"), lambda s: s.getField("tool")),
            1,
            max_steps,
        ),
        " -> ",
    )
    return (
        per_conv.select(
            path.alias("path"), F.size("seq").cast("long").alias("path_len")
        )
        .groupBy("path", "path_len")
        .agg(F.count("*").cast("long").alias("n_convs"))
        .orderBy("path", "path_len")
    )


def tool_paths_sql(state_cte: str, max_steps: int = 16) -> str:
    """DuckDB twin (row_number + filtered string_agg = the slice)."""
    return f"""
{state_cte},
tp_ranked AS (
  SELECT conv_id, tool,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM state WHERE tool IS NOT NULL
),
tp_paths AS (
  SELECT conv_id,
         string_agg(CASE WHEN rn <= {max_steps} THEN tool END,
                    ' -> ' ORDER BY rn) AS path,
         CAST(count(*) AS BIGINT) AS path_len
  FROM tp_ranked GROUP BY conv_id
)
SELECT path, path_len, CAST(count(*) AS BIGINT) AS n_convs
FROM tp_paths
GROUP BY path, path_len
ORDER BY path, path_len
"""


def response_latency_stats(state: DataFrame) -> DataFrame:
    """Assistant responsiveness per conversation: for every adjacent
    user -> assistant turn pair, the event-time gap in whole seconds —
    the ops-side latency profile of an agent corpus (slow tools and stuck
    sessions surface as max_latency outliers). Negative gaps (source
    time inversions, counted by conversation_integrity) are kept as-is so
    the numbers never silently hide a defect.

    Columns: conv_id, n_exchanges, total_latency_s, min_latency_s,
    max_latency_s (exact BIGINTs; conversations with no user->assistant
    adjacency are absent).

    Scale shape: one lag window on the shared conv_id clustering, one
    algebraic groupBy — no joins, no distinct.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lat = (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).cast(
        "long"
    )
    pairs = state.select(
        "conv_id",
        "role",
        F.lag("role").over(w).alias("prev_role"),
        lat.alias("latency_s"),
    ).filter((F.col("prev_role") == "user") & (F.col("role") == "assistant"))
    return (
        pairs.groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_exchanges"),
            F.sum("latency_s").cast("long").alias("total_latency_s"),
            F.min("latency_s").cast("long").alias("min_latency_s"),
            F.max("latency_s").cast("long").alias("max_latency_s"),
        )
        .orderBy("conv_id")
    )


def response_latency_stats_sql(state_cte: str) -> str:
    """DuckDB twin (epoch-second diff of adjacent turns)."""
    return f"""
{state_cte},
rl_pairs AS (
  SELECT conv_id,
         role,
         lag(role) OVER w AS prev_role,
         CAST(epoch(ts) - epoch(lag(ts) OVER w) AS BIGINT) AS latency_s
  FROM state
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_exchanges,
       CAST(sum(latency_s) AS BIGINT) AS total_latency_s,
       CAST(min(latency_s) AS BIGINT) AS min_latency_s,
       CAST(max(latency_s) AS BIGINT) AS max_latency_s
FROM rl_pairs
WHERE prev_role = 'user' AND role = 'assistant'
GROUP BY conv_id
ORDER BY conv_id
"""
