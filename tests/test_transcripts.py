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
