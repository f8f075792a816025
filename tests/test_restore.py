"""restore_as_of: RESTORE TABLE AS OF via compensating CDC events.

Why not a pointer rollback: restored rows would carry their original
(older) lsns, so any mirror/streamed view that saw the newer writes would
reject the rollback by LWW and diverge forever. Compensating events move
history FORWARD to the old state, so every CDC consumer converges.
"""

import pytest
from pyspark.sql import functions as F

from orientdb_neo4j_importer_plugin_spark.cdc import (
    apply_changes,
    delete_where,
    restore_as_of,
    update_where,
)
from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS_V1
from orientdb_neo4j_importer_plugin_spark.sources.debezium import (
    replicate_changelog,
)


def _mk(spark, tmp_path, name="t", mode="mor"):
    feed = gen_feed(
        spark, n_convs=14, turns_per_conv=4, updates_per_key=2, delete_every=6
    )
    table = SnapshotTable.create(
        spark, str(tmp_path / name), TRANSCRIPTS_V1, "conv_id", num_buckets=4
    )
    apply_changes(feed.filter("pmod(lsn, 2) = 1"), table, batch_id="odd", mode=mode)
    return table, feed


def _state(table, snap=None):
    return {
        (r["conv_id"], r["turn_idx"]): (r["role"], r["text"])
        for r in table.read(snap)
        .select("conv_id", "turn_idx", "role", "text")
        .collect()
    }


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_restore_reverts_updates_inserts_deletes(spark, tmp_path, mode):
    table, feed = _mk(spark, tmp_path, mode=mode)
    want = _state(table)
    v1 = table.current().version
    # updates + new keys + deletes after the restore point
    apply_changes(feed.filter("pmod(lsn, 2) = 0"), table, batch_id="even", mode=mode)
    update_where(table, "turn_idx = 0", {"text": "'clobbered'"}, batch_id="u", mode=mode)
    delete_where(table, "turn_idx = 3", batch_id="d", mode=mode)
    assert _state(table) != want
    res = restore_as_of(table, v1, mode=mode)
    assert res is not None
    assert _state(table) == want
    # rows restored to their old VALUES carry NEW lsns (monotone history)
    mx = (
        table.read(raw=True)
        .agg(F.max("__lsn").alias("m"))
        .collect()[0]["m"]
    )
    assert mx > v1


def test_restore_by_tag_and_noop_at_head(spark, tmp_path):
    table, feed = _mk(spark, tmp_path)
    table.create_tag("good")
    want = _state(table)
    assert restore_as_of(table, "good") is None  # already at target
    apply_changes(feed.filter("pmod(lsn, 2) = 0"), table, batch_id="even", mode="mor")
    restore_as_of(table, "good")
    assert _state(table) == want


def test_restore_is_exactly_once_and_ledger_preserved(spark, tmp_path):
    table, feed = _mk(spark, tmp_path)
    v1 = table.current().version
    apply_changes(feed.filter("pmod(lsn, 2) = 0"), table, batch_id="even", mode="mor")
    restore_as_of(table, v1, batch_id="rst")
    v = table.current().version
    want = _state(table)
    restore_as_of(table, v1, batch_id="rst")  # replay: ledgered no-op
    assert table.current().version == v
    # restore compensates STATE but does not forget HISTORY: re-sending an
    # already-applied batch stays a no-op after the restore
    apply_changes(feed.filter("pmod(lsn, 2) = 0"), table, batch_id="even", mode="mor")
    assert table.current().version == v and _state(table) == want


def test_restore_nulls_columns_added_after_target(spark, tmp_path):
    table, feed = _mk(spark, tmp_path)
    v1 = table.current().version
    evolved = (
        feed.filter("pmod(lsn, 2) = 0")
        .withColumn("rating", F.lit(7).cast("int"))
    )
    apply_changes(evolved, table, batch_id="evo", mode="mor")
    restore_as_of(table, v1)
    out = table.read()
    assert "rating" in out.columns  # schema evolution is not undone
    assert out.filter(F.col("rating").isNotNull()).count() == 0  # values revert
    assert _state(table) == _state(table, table.snapshot_at(v1))


def test_restore_replicates_to_mirror(spark, tmp_path):
    """THE reason restore is compensating events: a mirror that already
    consumed the bad writes converges to the restored state through the
    ordinary replication path — no re-bootstrap, no special casing."""
    table, feed = _mk(spark, tmp_path)
    v1 = table.current().version
    replica = table.clone(str(tmp_path / "replica"))
    rep_at = table.current().version
    # bad writes land on primary AND replicate to the mirror
    update_where(table, "role = 'user'", {"text": "'oops'"}, batch_id="bad", mode="mor")
    replicate_changelog(table, replica, rep_at, batch_id="rep1", mode="mor")
    assert _state(replica) == _state(table)
    rep_at = table.current().version
    # restore the primary, then replicate the restore like any other commit
    restore_as_of(table, v1, mode="mor")
    replicate_changelog(table, replica, rep_at, batch_id="rep2", mode="mor")
    assert _state(replica) == _state(table) == _state(table, table.snapshot_at(v1))


def test_streamed_view_converges_across_restore(spark, tmp_path):
    """A delete-algebraic streamed sketch view treats the restore like any
    other commit: after refreshing across it, the maintained cells equal
    the batch recompute over the restored state bit-for-bit."""
    from pyspark.sql import Row
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from orientdb_neo4j_importer_plugin_spark.lake.sketchview import (
        StreamedHistView,
    )
    from orientdb_neo4j_importer_plugin_spark.operators.temporal import (
        value_quantiles_hist,
    )

    schema = StructType([
        StructField("event_id", LongType(), False),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
    ])
    source = SnapshotTable.create(
        spark, str(tmp_path / "src"), schema, "event_id",
        num_buckets=4, key_columns=["event_id"],
    )
    state = StreamedHistView.create_state(spark, str(tmp_path / "hist"), num_buckets=4)
    view = StreamedHistView(source, state)

    def batch(n, lsn0, shift=0.0):
        return spark.createDataFrame([
            Row(lsn=lsn0 + i, op="I", event_id=i,
                event_type=["a", "b"][i % 2], value=(i * 7 % 40) / 4 + shift)
            for i in range(n)
        ])

    apply_changes(batch(120, 0), source, batch_id="b1", mode="mor")
    view.refresh()
    v1 = source.current().version
    apply_changes(batch(120, 1000, shift=3.0), source, batch_id="b2", mode="mor")
    view.refresh()
    restore_as_of(source, v1, mode="mor")
    view.refresh()
    got = sorted(tuple(r) for r in view.hist().collect())
    want = sorted(tuple(r) for r in value_quantiles_hist(source.read()).collect())
    assert got == want
