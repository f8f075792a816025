"""Conversation-level analytics: integrity counters + chat render.

Hand-built states with known defects; cross-engine parity runs in the
oracle sweep (transcripts_integrity / transcripts_render rows).
"""

import datetime

from orientdb_neo4j_importer_plugin_spark.operators import transcripts as TR

TS = datetime.datetime(2026, 1, 1, 12, 0, 0)


def _state(spark, rows):
    return spark.createDataFrame(
        [
            (c, t, r, x, tool, TS + datetime.timedelta(minutes=m))
            for (c, t, r, x, tool, m) in rows
        ],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )


def test_integrity_clean_conversation(spark):
    df = _state(
        spark,
        [
            ("c1", 0, "user", "hi", None, 0),
            ("c1", 1, "assistant", "hello", None, 1),
            ("c1", 2, "user", "do it", None, 2),
            ("c1", 3, "tool", "result", "tool_3", 3),
        ],
    )
    row = TR.conversation_integrity(df).collect()[0]
    assert row["n_turns"] == 4
    assert row["n_missing"] == 0
    assert row["n_role_repeats"] == 0
    assert row["n_ts_inversions"] == 0
    assert row["n_tool_turns"] == 1
    assert row["ok"] is True


def test_integrity_detects_defects(spark):
    df = _state(
        spark,
        [
            # c2: turn 1 missing (deleted), turns 0->2 same role, ts goes back
            ("c2", 0, "user", "a", None, 5),
            ("c2", 2, "user", "b", None, 3),
            ("c2", 3, "assistant", "c", None, 4),
        ],
    )
    row = TR.conversation_integrity(df).collect()[0]
    assert row["n_turns"] == 3
    assert row["max_turn_idx"] == 3
    assert row["n_missing"] == 1
    assert row["n_role_repeats"] == 1
    assert row["n_ts_inversions"] == 1
    assert row["ok"] is False


def test_render_orders_and_counts(spark):
    df = _state(
        spark,
        [
            # rows deliberately out of turn order
            ("c3", 1, "assistant", "three four", None, 1),
            ("c3", 0, "user", "one two", None, 0),
            ("c3", 2, "user", None, None, 2),  # null text renders empty
        ],
    )
    row = TR.render_conversations(df).collect()[0]
    assert row["conv_text"] == "user: one two\nassistant: three four\nuser: "
    assert row["n_turns"] == 3
    assert row["n_tokens"] == 7  # user: one two assistant: three four user:
    # stable under repartition (order comes from the sort, not the plan)
    row2 = TR.render_conversations(df.repartition(7)).collect()[0]
    assert row2["conv_text"] == row["conv_text"]


def test_training_examples_mask_semantics(spark):
    """Handcrafted conversation: the loss mask marks exactly the assistant
    turns IN TURN ORDER, token counters split into total vs loss-bearing."""
    from orientdb_neo4j_importer_plugin_spark.operators.transcripts import (
        training_examples,
    )

    state = spark.createDataFrame(
        [
            ("c1", 2, "assistant", "two words", None, None),
            ("c1", 1, "user", "hello there friend", None, None),
            ("c1", 3, "user", "ok", None, None),
            ("c1", 4, "assistant", "a b c", None, None),
            ("c2", 1, "system", "sys", None, None),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    rows = {r["conv_id"]: r for r in training_examples(state).collect()}
    c1 = rows["c1"]
    assert c1["loss_mask"] == "0101"  # turn order, assistant turns flagged
    assert c1["n_turns"] == 4 and c1["n_loss_turns"] == 2
    # per-line tokens include the "role:" prefix token
    # user: hello there friend (4) | assistant: two words (3)
    # user: ok (2) | assistant: a b c (4)
    assert c1["n_tokens"] == 13
    assert c1["n_loss_tokens"] == 7
    assert c1["text"].split("\n")[0] == "user: hello there friend"
    assert rows["c2"]["loss_mask"] == "0"


def test_sft_pairs_prompt_is_prior_turns(spark):
    df = _state(
        spark,
        [
            ("c1", 0, "assistant", "opener", None, 0),  # empty prompt
            ("c1", 1, "user", "question one", None, 1),
            ("c1", 2, "assistant", "answer one", None, 2),
            ("c1", 3, "user", "question two", None, 3),
            ("c1", 4, "assistant", None, None, 4),  # null text -> ''
        ],
    )
    rows = {r["turn_idx"]: r for r in TR.sft_pairs(df).collect()}
    assert sorted(rows) == [0, 2, 4]  # one pair per assistant turn
    assert rows[0]["prompt"] == "" and rows[0]["n_prompt_tokens"] == 0
    assert rows[0]["completion"] == "opener"
    assert rows[2]["prompt"] == "assistant: opener\nuser: question one"
    assert rows[2]["completion"] == "answer one"
    assert rows[2]["n_prompt_tokens"] == 5 and rows[2]["n_completion_tokens"] == 2
    assert rows[4]["prompt"].endswith("user: question two")
    assert rows[4]["completion"] == "" and rows[4]["n_completion_tokens"] == 0
    # plan-shape independence: same pairs from a repartitioned input
    again = {r["turn_idx"]: r for r in TR.sft_pairs(df.repartition(5)).collect()}
    assert again[2]["prompt"] == rows[2]["prompt"]


def test_truncate_to_budget_keeps_recent_suffix(spark):
    df = _state(
        spark,
        [
            # per-line tokens: "user: one two three" = 4
            ("c1", 0, "user", "one two three", None, 0),
            ("c1", 1, "assistant", "four five six", None, 1),
            ("c1", 2, "user", "seven eight", None, 2),  # 3 tokens
            # c2: single turn bigger than the budget -> no row
            ("c2", 0, "user", "a b c d e f g h i j", None, 0),
        ],
    )
    out = {r["conv_id"]: r for r in TR.truncate_to_budget(df, max_tokens=7).collect()}
    assert "c2" not in out  # final turn alone exceeds the budget
    c1 = out["c1"]
    # suffix sums from the end: turn2=3, +turn1=7, +turn0=11 -> keep turns 1,2
    assert c1["n_turns_kept"] == 2 and c1["n_turns_dropped"] == 1
    assert c1["first_kept_turn"] == 1
    assert c1["text"] == "assistant: four five six\nuser: seven eight"
    assert c1["n_tokens"] == 7
    # a generous budget keeps everything
    full = {r["conv_id"]: r for r in TR.truncate_to_budget(df, max_tokens=99).collect()}
    assert full["c1"]["n_turns_kept"] == 3 and full["c1"]["n_turns_dropped"] == 0
    assert full["c2"]["n_turns_kept"] == 1


def test_merge_consecutive_roles_islands(spark):
    df = _state(
        spark,
        [
            ("c1", 0, "user", "a", None, 3),
            ("c1", 1, "user", "b", None, 1),  # run of 2 users; min ts wins
            ("c1", 2, "assistant", "c", None, 2),
            ("c1", 3, "user", "d", None, 4),  # same role again, NOT adjacent
            ("c1", 4, "user", None, None, 5),  # null text joins as ''
        ],
    )
    rows = TR.merge_consecutive_roles(df).collect()
    assert [(r["turn_idx"], r["role"], r["text"], r["n_merged"]) for r in rows] == [
        (0, "user", "a b", 2),
        (2, "assistant", "c", 1),
        (3, "user", "d ", 2),
    ]
    assert rows[0]["ts"] == TS + datetime.timedelta(minutes=1)  # run-min ts
    # merged output has no adjacent same-role turns left
    integ = TR.conversation_integrity(
        TR.merge_consecutive_roles(df).selectExpr(
            "conv_id", "cast(turn_idx as int) turn_idx", "role", "text",
            "cast(null as string) tool", "ts",
        )
    ).collect()[0]
    assert integ["n_role_repeats"] == 0


def test_template_groups_digit_insensitive(spark):
    df = _state(
        spark,
        [
            # c1 and c3 differ only in numbers/case/spacing -> same template
            ("c1", 0, "user", "order 123 placed", None, 0),
            ("c1", 1, "assistant", "shipping 4 items", None, 1),
            ("c3", 0, "user", "ORDER 999   placed", None, 0),
            ("c3", 1, "assistant", "Shipping 71 items", None, 1),
            # c2: different wording -> its own (singleton) template
            ("c2", 0, "user", "hello", None, 0),
        ],
    )
    groups = TR.conversation_template_groups(df).collect()
    assert len(groups) == 1  # singletons suppressed
    g = groups[0]
    assert g["n_convs"] == 2 and g["keep_conv_id"] == "c1"


def test_export_pipeline_gate_repair_fit(spark):
    df = _state(
        spark,
        [
            # cA: turn 1 missing -> gated out entirely
            ("cA", 0, "user", "hi", None, 0),
            ("cA", 2, "assistant", "yo", None, 1),
            # cB: adjacent user turns merge, then budget keeps the suffix
            ("cB", 0, "user", "alpha beta", None, 0),
            ("cB", 1, "user", "gamma", None, 1),
            ("cB", 2, "assistant", "delta epsilon zeta", None, 2),
        ],
    )
    out = {r["conv_id"]: r for r in TR.export_pipeline(df, max_tokens=4).collect()}
    assert "cA" not in out  # integrity gate
    b = out["cB"]
    # after merge: turn0 "user: alpha beta gamma" (4 tok),
    #              turn2 "assistant: delta epsilon zeta" (4 tok)
    # budget 4 keeps only the final merged turn
    assert b["n_turns_kept"] == 1 and b["n_turns_dropped"] == 1
    assert b["text"] == "assistant: delta epsilon zeta"
    # generous budget keeps both merged turns
    full = {r["conv_id"]: r for r in TR.export_pipeline(df, max_tokens=99).collect()}
    assert full["cB"]["n_turns_kept"] == 2
    assert full["cB"]["text"] == (
        "user: alpha beta gamma\nassistant: delta epsilon zeta"
    )


def test_tool_transitions_counts_and_start_marker(spark):
    df = _state(
        spark,
        [
            # c1: search -> calc -> search  (start->search, search->calc, calc->search)
            ("c1", 0, "user", "q", None, 0),
            ("c1", 1, "tool", "r1", "search", 1),
            ("c1", 2, "tool", "r2", "calc", 2),
            ("c1", 4, "tool", "r3", "search", 3),
            # c2: search -> calc             (start->search, search->calc)
            ("c2", 0, "tool", "a", "search", 0),
            ("c2", 1, "tool", "b", "calc", 1),
        ],
    )
    rows = {
        (r["from_tool"], r["to_tool"]): (r["n_transitions"], r["n_convs"])
        for r in TR.tool_transitions(df).collect()
    }
    assert rows == {
        ("<start>", "search"): (2, 2),
        ("search", "calc"): (2, 2),
        ("calc", "search"): (1, 1),
    }


def test_tool_transitions_ignores_non_tool_turns_between_calls(spark):
    df = _state(
        spark,
        [
            ("c1", 0, "tool", "x", "a", 0),
            ("c1", 1, "assistant", "chat", None, 1),
            ("c1", 2, "tool", "y", "b", 2),
        ],
    )
    rows = {
        (r["from_tool"], r["to_tool"]): r["n_transitions"]
        for r in TR.tool_transitions(df).collect()
    }
    # the assistant turn in between does not break the a->b adjacency
    assert rows == {("<start>", "a"): 1, ("a", "b"): 1}


def test_tool_usage_stats(spark):
    df = _state(
        spark,
        [
            ("c1", 1, "tool", "one two", "search", 0),
            ("c1", 3, "tool", "three", "search", 1),
            ("c2", 0, "tool", None, "calc", 0),
            ("c2", 2, "user", "not a tool turn", None, 1),
        ],
    )
    rows = {r["tool"]: r for r in TR.tool_usage_stats(df).collect()}
    assert set(rows) == {"search", "calc"}
    s = rows["search"]
    assert (s["n_calls"], s["n_convs"], s["n_tokens"]) == (2, 1, 3)
    assert (s["min_turn_idx"], s["max_turn_idx"]) == (1, 3)
    c = rows["calc"]
    assert (c["n_calls"], c["n_convs"], c["n_tokens"]) == (1, 1, 0)


def test_conversation_churn(spark):
    import pyspark.sql.functions as F

    rows = [
        # conv a: one insert (2 tokens), one rewrite 3 -> 1 tokens
        ("a", 0, "I", None, "hi there"),
        ("a", 1, "U", "one two three", "one"),
        # conv b: one delete (2 tokens gone)
        ("b", 5, "D", "bye now", None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, op string, bt string, at string"
    ).select(
        "conv_id",
        "turn_idx",
        "op",
        F.when(
            F.col("bt").isNotNull(), F.struct(F.col("bt").alias("text"))
        ).alias("before"),
        F.when(
            F.col("at").isNotNull(), F.struct(F.col("at").alias("text"))
        ).alias("after"),
    )
    out = {r["conv_id"]: r for r in TR.conversation_churn(df).collect()}
    a, b = out["a"], out["b"]
    assert (a["n_new_turns"], a["n_dropped_turns"], a["n_rewritten_turns"]) == (1, 0, 1)
    assert (a["tokens_before"], a["tokens_after"], a["tokens_delta"]) == (3, 3, 0)
    assert (b["n_new_turns"], b["n_dropped_turns"], b["n_rewritten_turns"]) == (0, 1, 0)
    assert (b["tokens_before"], b["tokens_after"], b["tokens_delta"]) == (2, 0, -2)


def test_tool_paths_truncation_and_counts(spark):
    rows = (
        [("c1", i, "tool", "x", f"t{i % 2}", i) for i in range(5)]
        + [("c2", i, "tool", "x", f"t{i % 2}", i) for i in range(5)]
        + [("c3", 0, "tool", "x", "t9", 0), ("c3", 1, "user", "x", None, 1)]
    )
    df = _state(spark, rows)
    out = {r["path"]: r for r in TR.tool_paths(df, max_steps=3).collect()}
    # c1 and c2 share the same 5-call path, rendered truncated to 3 steps
    assert out["t0 -> t1 -> t0"]["n_convs"] == 2
    assert out["t0 -> t1 -> t0"]["path_len"] == 5  # full length, not truncated
    assert out["t9"]["n_convs"] == 1 and out["t9"]["path_len"] == 1


def test_response_latency_stats(spark):
    df = _state(
        spark,
        [
            ("c1", 0, "user", "q1", None, 0),
            ("c1", 1, "assistant", "a1", None, 2),   # +2 min
            ("c1", 2, "user", "q2", None, 3),
            ("c1", 3, "assistant", "a2", None, 3),   # +0
            ("c2", 0, "assistant", "unprompted", None, 0),  # no exchange
            ("c3", 0, "user", "q", None, 5),
            ("c3", 1, "assistant", "a", None, 4),    # inversion: -60s kept
        ],
    )
    out = {r["conv_id"]: r for r in TR.response_latency_stats(df).collect()}
    assert set(out) == {"c1", "c3"}
    c1 = out["c1"]
    assert (c1["n_exchanges"], c1["total_latency_s"]) == (2, 120)
    assert (c1["min_latency_s"], c1["max_latency_s"]) == (0, 120)
    assert out["c3"]["min_latency_s"] == -60
