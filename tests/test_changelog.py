"""Row-level change-data-feed (SnapshotTable.changelog): op classification,
no-op suppression across compaction/COW rewrites, and layout changes
between the two versions."""

from pyspark.sql import functions as F

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.feedgen import gen_feed, write_feed_chunks
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS_V1


def setup(spark, tmp_path):
    feed = gen_feed(
        spark, n_convs=10, turns_per_conv=6, updates_per_key=2, delete_every=5
    )
    feed_dir = str(tmp_path / "feed")
    write_feed_chunks(feed, feed_dir)
    table = SnapshotTable.create(
        spark, str(tmp_path / "table"), TRANSCRIPTS_V1, "conv_id", num_buckets=8
    )
    return spark.read.parquet(feed_dir), table


def _expected_diff(spark, full, pred1):
    """Reference diff computed independently: LWW state of batch1 vs all."""
    w = F.max(F.struct("lsn", "op", "role", "text", "ts")).alias("w")

    def lww(df):
        return {
            (r.conv_id, r.turn_idx): r.w
            for r in df.groupBy("conv_id", "turn_idx").agg(w).collect()
        }

    s1, s2 = lww(full.filter(pred1)), lww(full)
    out = {}
    for k, new in s2.items():
        old = s1.get(k)
        old_live = old is not None and old.op != "D"
        new_live = new.op != "D"
        if not old_live and new_live:
            out[k] = ("I", new.text)
        elif old_live and not new_live:
            out[k] = ("D", None)
        elif old_live and new_live and old.lsn != new.lsn:
            out[k] = ("U", new.text)
    return out


PRED1 = "(op = 'I' and pmod(turn_idx, 5) != 0) or (op != 'I' and pmod(lsn, 2) = 0)"
PRED2 = "(op = 'I' and pmod(turn_idx, 5) = 0) or (op != 'I' and pmod(lsn, 2) = 1)"


def test_changelog_classifies_i_u_d(spark, tmp_path):
    full, table = setup(spark, tmp_path)
    apply_changes(full.filter(PRED1), table, batch_id="b1", mode="mor")
    v1 = table.current().version
    apply_changes(full.filter(PRED2), table, batch_id="b2", mode="mor")
    got = {
        (r.conv_id, r.turn_idx): (r.op, r.text)
        for r in table.changelog(v1).collect()
    }
    want = _expected_diff(spark, full, PRED1)
    assert got == want
    assert {op for op, _ in got.values()} == {"I", "U", "D"}  # all kinds appear


def test_changelog_suppresses_compaction_noise(spark, tmp_path):
    """Compaction/COW rewrites copy unchanged rows into NEW files; the
    changelog must not report them as changes."""
    full, table = setup(spark, tmp_path)
    apply_changes(full, table, batch_id="all", mode="mor")
    v1 = table.current().version
    table.compact()  # rewrites every delta-holding bucket
    assert table.current().version > v1
    assert table.changelog(v1).count() == 0


def test_changelog_across_rebucket(spark, tmp_path):
    """A rebucket between the two versions changes every key->bucket
    mapping; the diff must use each snapshot's own layout."""
    full, table = setup(spark, tmp_path)
    apply_changes(full.filter(PRED1), table, batch_id="b1", mode="mor")
    v1 = table.current().version
    table.rebucket(16)
    apply_changes(full.filter(PRED2), table, batch_id="b2", mode="mor")
    got = {
        (r.conv_id, r.turn_idx): (r.op, r.text)
        for r in table.changelog(v1).collect()
    }
    # rebucket rewrites every file, so EVERY key is a candidate — the state
    # diff must still reduce to exactly the true changes
    want = _expected_diff(spark, full, PRED1)
    assert got == want


def test_changelog_sees_removal_only_window(spark, tmp_path):
    """A rollback inside the window removes files without adding any — the
    keys that went live->gone must still surface as D rows (candidates come
    from removed files too, not just added ones)."""
    full, table = setup(spark, tmp_path)
    apply_changes(full.filter("lsn < 10"), table, batch_id="b1", mode="mor")
    v1 = table.current().version
    live_v1 = {(r.conv_id, r.turn_idx) for r in table.read().collect()}
    apply_changes(full.filter("lsn >= 10 and lsn < 20"), table, batch_id="b2",
                  mode="mor")
    live_v2 = {(r.conv_id, r.turn_idx) for r in table.read().collect()}
    v2 = table.current().version
    table.rollback(v1)  # removal-only: v3's file set == v1's
    got = {(r.conv_id, r.turn_idx): r.op for r in table.changelog(v2).collect()}
    want = {}
    for k in live_v2 - live_v1:
        want[k] = "D"  # live at v2, gone after rollback
    for k in live_v1 - live_v2:
        want[k] = "I"  # deleted by b2, resurrected by the rollback
    # keys live in both may differ by payload (b2 updates rolled back) -> U
    assert {k: v for k, v in got.items() if v in ("I", "D")} == want


# --- property: changelog == pure-Python state diff on random sequences ----

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from orientdb_neo4j_importer_plugin_spark.schema import CHANGE_EVENT_V1

BASE = datetime.datetime(2024, 1, 1)


def _py_state(events):
    """LWW winner per key: (role, text, live) — ~10-line reference."""
    win = {}
    for e in events:
        k = (e["conv_id"], e["turn_idx"])
        if k not in win or e["lsn"] > win[k]["lsn"]:
            win[k] = e
    return {
        k: (e["role"], e["text"], e["op"] != "D") for k, e in win.items()
    }


def _py_changelog(events, split):
    s1 = _py_state([e for e in events if e["lsn"] in split])
    s2 = _py_state(events)
    out = {}
    for k, (role, text, live2) in s2.items():
        old = s1.get(k)
        live1 = old is not None and old[2]
        if not live1 and live2:
            out[k] = ("I", text)
        elif live1 and not live2:
            out[k] = ("D", None)
        elif live1 and live2:
            w1 = max(
                (e["lsn"] for e in events
                 if e["lsn"] in split
                 and (e["conv_id"], e["turn_idx"]) == k),
            )
            w2 = max(
                e["lsn"] for e in events
                if (e["conv_id"], e["turn_idx"]) == k
            )
            if w1 != w2:
                out[k] = ("U", text)
    return out


@st.composite
def changelog_sequences(draw):
    n = draw(st.integers(min_value=2, max_value=30))
    events = []
    for lsn in range(n):
        conv = draw(st.integers(min_value=0, max_value=2))
        turn = draw(st.integers(min_value=0, max_value=2))
        op = draw(st.sampled_from(["I", "U", "D"]))
        events.append(
            {
                "lsn": lsn, "op": op, "source_part": 0,
                "conv_id": f"conv_{conv}", "turn_idx": turn,
                "role": None if op == "D" else "user",
                "text": None if op == "D" else f"t {conv}/{turn} @ {lsn}",
                "ts": BASE + datetime.timedelta(seconds=lsn),
            }
        )
    split = set(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=n - 1),
                min_size=1, max_size=n - 1, unique=True,
            )
        )
    )
    return events, split


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.data_too_large,
    ],
)
@given(changelog_sequences())
def test_changelog_equals_python_diff(spark, tmp_path_factory, seq):
    events, split = seq
    tmp = tmp_path_factory.mktemp("chprop")
    table = SnapshotTable.create(
        spark, str(tmp / "t"), TRANSCRIPTS_V1, "conv_id", num_buckets=4
    )
    rows = [
        (e["lsn"], e["op"], e["source_part"], e["conv_id"], e["turn_idx"],
         e["role"], e["text"], e["ts"])
        for e in events
    ]
    df = spark.createDataFrame(rows, CHANGE_EVENT_V1)
    apply_changes(df.filter(df.lsn.isin(list(split))), table,
                  batch_id="p1", mode="mor")
    v1 = table.current().version
    apply_changes(df.filter(~df.lsn.isin(list(split))), table,
                  batch_id="p2", mode="mor")
    got = {
        (r.conv_id, r.turn_idx): (r.op, r.text)
        for r in table.changelog(v1).collect()
    }
    assert got == _py_changelog(events, split)


def test_changelog_chain_reconstructs_state(spark, tmp_path):
    """CDC-feed completeness: applying every per-version changelog in order
    onto the state at v0 must reconstruct the final state exactly — proves
    no change is ever dropped or duplicated across commits (incl. a
    compaction commit in the middle, which must contribute zero rows)."""
    full, table = setup(spark, tmp_path)
    apply_changes(full.filter("lsn < 15"), table, batch_id="c1", mode="mor")
    v0 = table.current().version
    state = {
        (r.conv_id, r.turn_idx): r.text for r in table.read().collect()
    }
    apply_changes(full.filter("lsn >= 15 and lsn < 30"), table, batch_id="c2",
                  mode="mor")
    table.compact()  # mid-chain maintenance commit: must diff to nothing
    apply_changes(full.filter("lsn >= 30"), table, batch_id="c3", mode="mor")
    n_versions = 0
    for v, chlog in table.iter_changelogs(v0):
        n_versions += 1
        for r in chlog.collect():
            k = (r.conv_id, r.turn_idx)
            if r.op == "D":
                state.pop(k, None)
            else:
                state[k] = r.text
    assert n_versions == table.current().version - v0
    final = {
        (r.conv_id, r.turn_idx): r.text for r in table.read().collect()
    }
    assert state == final
