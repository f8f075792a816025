"""MERGE INTO semantics: clause routing, assignments, idempotence, modes."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from orientdb_neo4j_importer_plugin_spark.cdc import (
    apply_changes,
    delete_where,
    merge_into,
    update_where,
)
from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS_V1

SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("qty", IntegerType(), True),
        StructField("note", StringType(), True),
    ]
)


def _table(spark, tmp_path, rows):
    table = SnapshotTable.create(
        spark, str(tmp_path / "t"), SCHEMA, "id", num_buckets=4, key_columns=["id"]
    )
    feed = spark.createDataFrame(
        [(i + 1, "I", *r) for i, r in enumerate(rows)],
        StructType(
            [StructField("lsn", LongType(), False), StructField("op", StringType(), False)]
            + list(SCHEMA.fields)
        ),
    )
    apply_changes(feed, table, batch_id="seed", mode="mor")
    return table


def _src(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _state(table):
    return {
        r["id"]: (r["qty"], r["note"]) for r in table.read().collect()
    }


def test_merge_update_insert_delete(spark, tmp_path):
    table = _table(
        spark, tmp_path, [("a", 1, "keep"), ("b", 2, "upd"), ("c", 3, "del")]
    )
    src = _src(
        spark,
        [
            ("b", 20, "neu"),   # matched -> update
            ("c", None, None),  # matched -> delete (qty null)
            ("d", 4, "new"),    # not matched -> insert
        ],
    )
    res = merge_into(
        table,
        src,
        when_matched_delete="s.qty IS NULL",
        when_matched_update="*",
        when_not_matched_insert="*",
        batch_id="m1",
        mode="mor",
    )
    assert res.keys_changed == 3
    assert _state(table) == {
        "a": (1, "keep"),
        "b": (20, "neu"),
        "d": (4, "new"),
    }
    # exactly-once: replaying the same merge batch is a committed no-op
    v = table.current().version
    res2 = merge_into(
        table,
        src,
        when_matched_delete="s.qty IS NULL",
        when_matched_update="*",
        when_not_matched_insert="*",
        batch_id="m1",
        mode="mor",
    )
    assert res2.skipped_replay and table.current().version == v


def test_merge_expression_assignments_and_conditions(spark, tmp_path):
    table = _table(spark, tmp_path, [("a", 1, "x"), ("b", 10, "y")])
    src = _src(spark, [("a", 5, None), ("b", 1, None), ("z", 7, "zz")])
    merge_into(
        table,
        src,
        # only bump rows where the source qty is larger; note keeps t's value
        matched_condition="s.qty > t.qty",
        when_matched_update={"qty": "t.qty + s.qty"},
        # inserts gated + expression-built
        not_matched_condition="s.qty > 5",
        when_not_matched_insert={"qty": "s.qty * 100", "note": F.upper(F.col("s.note"))},
        batch_id="m2",
    )
    assert _state(table) == {
        "a": (6, "x"),    # 1+5, note untouched
        "b": (10, "y"),   # matched_condition false -> no-op
        "z": (700, "ZZ"),
    }


def test_merge_delete_only_and_update_only(spark, tmp_path):
    table = _table(spark, tmp_path, [("a", 1, "x"), ("b", 2, "y")])
    merge_into(
        table,
        _src(spark, [("a", None, None), ("nope", None, None)]),
        when_matched_delete="true",
        when_not_matched_insert=None,  # unmatched source rows are no-ops
        batch_id="d1",
    )
    assert _state(table) == {"b": (2, "y")}
    merge_into(
        table,
        _src(spark, [("b", 0, "patched"), ("ghost", 9, "9")]),
        when_matched_update={"note": "s.note"},
        when_not_matched_insert=None,
        batch_id="u1",
    )
    assert _state(table) == {"b": (2, "patched")}


def test_merge_duplicate_source_keys_rejected(spark, tmp_path):
    table = _table(spark, tmp_path, [("a", 1, "x")])
    dup = _src(spark, [("a", 1, "p"), ("a", 2, "q")])
    with pytest.raises(ValueError, match="multiple rows"):
        merge_into(table, dup, when_matched_update="*", batch_id="dup")
    with pytest.raises(ValueError, match="no-op"):
        merge_into(
            table,
            _src(spark, []),
            when_matched_update=None,
            when_not_matched_insert=None,
        )
    with pytest.raises(ValueError, match="missing key"):
        merge_into(table, _src(spark, []).drop("id"), when_matched_update="*")


def test_merge_is_an_ordinary_cdc_batch(spark, tmp_path):
    """Downstream CDC consumers (changelog) must see the merge like any
    applied batch, and its lsn must sit above all stored lsns."""
    feed = gen_feed(spark, n_convs=12, turns_per_conv=4, updates_per_key=1)
    table = SnapshotTable.create(
        spark, str(tmp_path / "tt"), TRANSCRIPTS_V1, "conv_id", num_buckets=4
    )
    apply_changes(feed, table, batch_id="seed", mode="mor")
    v0 = table.current().version
    src = table.read().filter("turn_idx = 0").withColumn(
        "text", F.lit("REDACTED")
    )
    merge_into(table, src, when_matched_update={"text": "s.text"}, batch_id="m", mode="mor")
    ch = table.changelog(v0, table.current().version).collect()
    assert ch and {r["op"] for r in ch} == {"U"}
    assert all(r["turn_idx"] == 0 and r["text"] == "REDACTED" for r in ch)
    got = {r["text"] for r in table.read().filter("turn_idx = 0").collect()}
    assert got == {"REDACTED"}


def test_merge_cow_equals_mor(spark, tmp_path):
    rows = [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "z")]
    src = [("a", 9, "A"), ("q", 8, "Q"), ("c", None, None)]
    t1 = _table(spark, tmp_path / "cow", rows)
    t2 = _table(spark, tmp_path / "mor", rows)
    for t, mode in [(t1, "cow"), (t2, "mor")]:
        merge_into(
            t,
            _src(spark, src),
            when_matched_delete="s.qty IS NULL",
            when_matched_update="*",
            when_not_matched_insert="*",
            batch_id="m",
            mode=mode,
        )
    assert _state(t1) == _state(t2)


def test_merge_update_star_with_partial_source_keeps_target_columns(spark, tmp_path):
    """UPDATE SET * with a source lacking some payload columns must keep
    the target's values for them, never null them (the Delta contract is
    to reject; keeping t's value is the keep-semantics superset and is
    what unassigned dict columns already do)."""
    table = _table(spark, tmp_path, [("a", 1, "precious")])
    src = spark.createDataFrame(
        [("a", 99)],
        StructType(
            [StructField("id", StringType(), False), StructField("qty", IntegerType(), True)]
        ),
    )
    merge_into(table, src, when_matched_update="*", batch_id="p")
    assert _state(table) == {"a": (99, "precious")}


def test_merge_unknown_assignment_column_rejected(spark, tmp_path):
    table = _table(spark, tmp_path, [("a", 1, "x")])
    src = _src(spark, [("a", 2, "y")])
    with pytest.raises(ValueError, match="unknown columns"):
        merge_into(table, src, when_matched_update={"nope": "s.qty"}, batch_id="u")
    with pytest.raises(ValueError, match="unknown columns"):
        merge_into(
            table, src,
            when_matched_update=None,
            when_not_matched_insert={"ghost": "1"},
            batch_id="i",
        )


# -- DELETE WHERE / UPDATE WHERE -------------------------------------------


def test_delete_where_basic_and_null_condition_keeps_row(spark, tmp_path):
    """Rows where the predicate is TRUE are deleted; NULL/FALSE keep the
    row (three-valued DELETE semantics)."""
    table = _table(
        spark, tmp_path, [("a", 1, "x"), ("b", None, "y"), ("c", 3, "z")]
    )
    delete_where(table, "qty > 2", batch_id="d1")
    assert _state(table) == {"a": (1, "x"), "b": (None, "y")}  # b: NULL > 2 is NULL


def test_delete_where_true_empties_table(spark, tmp_path):
    table = _table(spark, tmp_path, [("a", 1, "x"), ("b", 2, "y")])
    delete_where(table, F.lit(True), batch_id="all")
    assert _state(table) == {}


def test_delete_where_no_match_is_noop_commit(spark, tmp_path):
    table = _table(spark, tmp_path, [("a", 1, "x")])
    delete_where(table, "qty > 100", batch_id="none")
    assert _state(table) == {"a": (1, "x")}


def test_delete_where_is_an_ordinary_cdc_batch_and_idempotent(spark, tmp_path):
    feed = gen_feed(spark, n_convs=10, turns_per_conv=4, updates_per_key=1)
    table = SnapshotTable.create(
        spark, str(tmp_path / "tt"), TRANSCRIPTS_V1, "conv_id", num_buckets=4
    )
    apply_changes(feed, table, batch_id="seed", mode="mor")
    v0 = table.current().version
    before = table.read().count()
    victims = table.read().filter("turn_idx >= 2").count()
    delete_where(table, "turn_idx >= 2", batch_id="dw", mode="mor")
    ch = table.changelog(v0, table.current().version).collect()
    assert {r["op"] for r in ch} == {"D"} and len(ch) == victims
    # replay is a ledgered no-op
    v1 = table.current().version
    delete_where(table, "turn_idx >= 0", batch_id="dw", mode="mor")
    assert table.current().version == v1
    assert table.read().count() == before - victims
    assert table.read().filter("turn_idx >= 2").count() == 0


def test_update_where_assignments_and_unassigned_kept(spark, tmp_path):
    table = _table(
        spark, tmp_path, [("a", 1, "x"), ("b", None, "y"), ("c", 3, "z")]
    )
    update_where(
        table, "qty >= 1", {"note": F.upper("note"), "qty": "qty * 10"}, batch_id="u1"
    )
    # b's NULL predicate leaves it untouched; unassigned columns persist
    assert _state(table) == {"a": (10, "X"), "b": (None, "y"), "c": (30, "Z")}


def test_update_where_rejects_keys_unknowns_empty(spark, tmp_path):
    table = _table(spark, tmp_path, [("a", 1, "x")])
    with pytest.raises(ValueError, match="key columns"):
        update_where(table, "qty = 1", {"id": "'zzz'"}, batch_id="k")
    with pytest.raises(ValueError, match="unknown columns"):
        update_where(table, "qty = 1", {"ghost": "1"}, batch_id="g")
    with pytest.raises(ValueError, match="no assignments"):
        update_where(table, "qty = 1", {}, batch_id="e")
    assert _state(table) == {"a": (1, "x")}


def test_delete_update_where_cow_equals_mor(spark, tmp_path):
    rows = [("a", 1, "x"), ("b", 2, "y"), ("c", 3, "z"), ("d", None, "w")]
    t1 = _table(spark, tmp_path / "cow", rows)
    t2 = _table(spark, tmp_path / "mor", rows)
    for t, mode in [(t1, "cow"), (t2, "mor")]:
        update_where(t, "qty <= 2", {"note": "note || '!'"}, batch_id="u", mode=mode)
        delete_where(t, "qty = 3", batch_id="d", mode=mode)
    assert _state(t1) == _state(t2) == {
        "a": (1, "x!"), "b": (2, "y!"), "d": (None, "w")
    }


def test_update_where_visible_to_changelog_with_preimage(spark, tmp_path):
    """CDC consumers see the UPDATE as full-row U events above every
    stored lsn, so a mirror replaying the envelope converges."""
    feed = gen_feed(spark, n_convs=8, turns_per_conv=3, updates_per_key=1)
    table = SnapshotTable.create(
        spark, str(tmp_path / "tt"), TRANSCRIPTS_V1, "conv_id", num_buckets=4
    )
    apply_changes(feed, table, batch_id="seed", mode="mor")
    v0 = table.current().version
    update_where(table, "role = 'user'", {"text": "upper(text)"}, batch_id="uw", mode="mor")
    ch = table.changelog(v0, table.current().version).collect()
    assert ch and {r["op"] for r in ch} == {"U"}
    assert all(r["role"] == "user" and r["text"] == r["text"].upper() for r in ch)
