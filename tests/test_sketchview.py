"""Streamed histogram-sketch maintenance: the maintained cell table reads
back a histogram EXACTLY equal to the batch recompute over source live
rows — through inserts, value-changing updates, deletes, replays, and
streaming kill-and-resume. Plus the changelog_delta pre-image contract it
builds on."""

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from orientdb_neo4j_importer_plugin_spark.cdc import apply_changes
from orientdb_neo4j_importer_plugin_spark.lake import SnapshotTable
from orientdb_neo4j_importer_plugin_spark.lake.sketchview import StreamedHistView
from orientdb_neo4j_importer_plugin_spark.operators.temporal import (
    value_quantiles_hist,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), False),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
    ]
)

TYPES = ["click", "purchase", "error"]


def _feed(spark, n, lsn0=0, op="I", value_shift=0.0):
    """Deterministic event batch: values collide across event_ids (cents
    grid) so multiset counts > 1 are exercised."""
    rows = [
        Row(
            lsn=lsn0 + i,
            op=op,
            event_id=i,
            event_type=TYPES[i % 3],
            value=None if i % 11 == 10 else round((i * 7 % 50) / 4 + value_shift, 2),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def _setup(spark, tmp_path):
    source = SnapshotTable.create(
        spark,
        str(tmp_path / "src"),
        EVENTS_SCHEMA,
        "event_id",
        num_buckets=8,
        key_columns=["event_id"],
    )
    state = StreamedHistView.create_state(
        spark, str(tmp_path / "hist"), num_buckets=4
    )
    return source, StreamedHistView(source, state)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _expect(source):
    return _rows(value_quantiles_hist(source.read()))


def test_changelog_delta_preimages(spark, tmp_path):
    source = SnapshotTable.create(
        spark,
        str(tmp_path / "t"),
        EVENTS_SCHEMA,
        "event_id",
        num_buckets=4,
        key_columns=["event_id"],
    )
    apply_changes(_feed(spark, 6), source, batch_id="b1", mode="mor")
    v1 = source.current().version
    # update id 0 (value change), delete id 1, insert id 100
    batch = spark.createDataFrame(
        [
            Row(lsn=100, op="U", event_id=0, event_type="click", value=9.5),
            Row(lsn=101, op="D", event_id=1, event_type=None, value=None),
            Row(lsn=102, op="I", event_id=100, event_type="error", value=3.25),
        ]
    )
    apply_changes(batch, source, batch_id="b2", mode="mor")
    got = {
        (r.event_id, r._change_type): (r.event_type, r.value)
        for r in source.changelog_delta(v1).collect()
    }
    old0 = round((0 * 7 % 50) / 4, 2)
    old1 = round((1 * 7 % 50) / 4, 2)
    assert got[(0, "update_preimage")] == ("click", old0)
    assert got[(0, "update_postimage")] == ("click", 9.5)
    # delete carries the OLD payload — the pre-image a decrementing
    # consumer needs (changelog() would emit nulls here)
    assert got[(1, "delete")] == ("purchase", old1)
    assert got[(100, "insert")] == ("error", 3.25)
    assert len(got) == 4


def test_hist_tracks_source_through_iud(spark, tmp_path):
    source, view = _setup(spark, tmp_path)
    apply_changes(_feed(spark, 60), source, batch_id="b1", mode="mor")
    r1 = view.refresh()
    assert not r1["skipped"] and r1["cells_changed"] > 0
    assert _rows(view.hist()) == _expect(source)

    # value-changing updates + deletes, including the current max values
    # (bin boundaries move — a cells-only sketch could not survive this)
    upd = spark.createDataFrame(
        [
            Row(lsn=1000 + i, op="U", event_id=i, event_type=TYPES[i % 3],
                value=round(i * 1.31 + 50, 2))
            for i in range(0, 20, 2)
        ]
        + [
            Row(lsn=2000 + i, op="D", event_id=i, event_type=None, value=None)
            for i in range(1, 20, 2)
        ]
    )
    apply_changes(upd, source, batch_id="b2", mode="mor")
    view.refresh()
    assert _rows(view.hist()) == _expect(source)

    # replayed refresh with no new source version: committed no-op
    r3 = view.refresh()
    assert r3["skipped"]
    assert _rows(view.hist()) == _expect(source)

    # cell-count invariant: sum(cnt) == live rows with a value
    total = view.state.read().agg(F.sum("cnt")).first()[0]
    assert total == source.read().filter(F.col("value").isNotNull()).count()


def test_update_same_value_touches_no_cells(spark, tmp_path):
    source, view = _setup(spark, tmp_path)
    apply_changes(_feed(spark, 12), source, batch_id="b1", mode="mor")
    view.refresh()
    # re-write every row with the SAME value: pre/post pairs cancel
    apply_changes(
        _feed(spark, 12, lsn0=500, op="U"), source, batch_id="b2", mode="mor"
    )
    r = view.refresh()
    assert not r["skipped"] and r["cells_changed"] == 0
    assert _rows(view.hist()) == _expect(source)


def test_streamed_kill_and_resume(spark, tmp_path):
    source, view = _setup(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    apply_changes(_feed(spark, 40), source, batch_id="s1", mode="mor")
    apply_changes(
        _feed(spark, 40, lsn0=100, op="U", value_shift=2.0),
        source,
        batch_id="s2",
        mode="mor",
    )
    q = view.stream(ckpt)
    q.awaitTermination(120)
    assert _rows(view.hist()) == _expect(source)
    wm = view.last_refreshed_version()

    # "kill": the query is gone; new commits land while it's down
    deletes = spark.createDataFrame(
        [(900 + i, "D", i) for i in range(0, 40, 5)],
        "lsn long, op string, event_id long",
    ).select(
        "lsn",
        "op",
        "event_id",
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
    )
    apply_changes(deletes, source, batch_id="s3", mode="mor")
    # resume from the same checkpoint: picks up only the new versions
    q2 = view.stream(ckpt)
    q2.awaitTermination(120)
    assert view.last_refreshed_version() > wm
    assert _rows(view.hist()) == _expect(source)

    # a third drain with nothing new leaves state untouched (ledger no-op)
    v = view.state.current().version
    q3 = view.stream(ckpt)
    q3.awaitTermination(120)
    assert view.state.current().version == v
    assert _rows(view.hist()) == _expect(source)


def _cms_expect(source, spark):
    from orientdb_neo4j_importer_plugin_spark.operators.sketches import (
        cms_estimate,
    )

    probes = (
        source.read()
        .select("event_type")
        .filter(F.col("event_type").isNotNull())
        .distinct()
    )
    return _rows(
        cms_estimate(
            source.read(), F.col("event_type"), probes, F.col("event_type")
        )
    )


def test_cms_view_tracks_source_through_iud(spark, tmp_path):
    from orientdb_neo4j_importer_plugin_spark.lake.sketchview import (
        StreamedCmsView,
    )

    source = SnapshotTable.create(
        spark,
        str(tmp_path / "src"),
        EVENTS_SCHEMA,
        "event_id",
        num_buckets=8,
        key_columns=["event_id"],
    )
    state = StreamedCmsView.create_state(spark, str(tmp_path / "cms"))
    view = StreamedCmsView(source, state, value_col="event_type")

    def got():
        probes = (
            source.read()
            .select("event_type")
            .filter(F.col("event_type").isNotNull())
            .distinct()
        )
        return _rows(view.estimate(probes, F.col("event_type")))

    apply_changes(_feed(spark, 60), source, batch_id="b1", mode="mor")
    r1 = view.refresh()
    assert not r1["skipped"] and r1["cells_changed"] > 0
    assert got() == _cms_expect(source, spark)

    # deletes decrement counters; updates that keep event_type cancel
    batch = spark.createDataFrame(
        [(900 + i, "D", i) for i in range(0, 60, 4)],
        "lsn long, op string, event_id long",
    ).select(
        "lsn", "op", "event_id",
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
    )
    apply_changes(batch, source, batch_id="b2", mode="mor")
    view.refresh()
    assert got() == _cms_expect(source, spark)

    # counter invariant: every sketch row's total == live row count
    # (null event_type rows land in the sentinel cell, same as cms_build
    # hashing them — the probe comparison above already covers non-null)
    per_row = {
        r.r: r.total
        for r in view.cells().groupBy("r").agg(F.sum("cnt").alias("total")).collect()
    }
    live = source.read().count()
    assert all(v == live for v in per_row.values())

    # replay with no new version: committed no-op
    r3 = view.refresh()
    assert r3["skipped"]


def test_cms_view_streamed_resume(spark, tmp_path):
    from orientdb_neo4j_importer_plugin_spark.lake.sketchview import (
        StreamedCmsView,
    )

    source = SnapshotTable.create(
        spark,
        str(tmp_path / "src"),
        EVENTS_SCHEMA,
        "event_id",
        num_buckets=8,
        key_columns=["event_id"],
    )
    state = StreamedCmsView.create_state(spark, str(tmp_path / "cms"))
    view = StreamedCmsView(source, state, value_col="event_type")
    ckpt = str(tmp_path / "ckpt")
    apply_changes(_feed(spark, 30), source, batch_id="s1", mode="mor")
    q = view.stream(ckpt)
    q.awaitTermination(120)
    assert got_equal(view, source)
    wm = view.last_refreshed_version()
    apply_changes(
        _feed(spark, 30, lsn0=500, op="U", value_shift=1.0),
        source,
        batch_id="s2",
        mode="mor",
    )
    q2 = view.stream(ckpt)
    q2.awaitTermination(120)
    assert view.last_refreshed_version() > wm
    assert got_equal(view, source)


def got_equal(view, source):
    probes = (
        source.read()
        .select("event_type")
        .filter(F.col("event_type").isNotNull())
        .distinct()
    )
    return _rows(view.estimate(probes, F.col("event_type"))) == _cms_expect(
        source, source.spark
    )


# ---------------------------------------------------------------------------
# StreamedVocabView (third family member: per-token corpus counters)
# ---------------------------------------------------------------------------

TEXT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
    ]
)

PHRASES = [
    "the cat sat on the mat",
    "the dog ran",
    "cat and dog and cat",
    None,  # null text contributes nothing
    "mat mat mat",
]


def _text_feed(spark, n, lsn0=0, op="I", rev=""):
    rows = [
        Row(
            lsn=lsn0 + i,
            op=op,
            doc_id=i,
            text=(PHRASES[i % 5] + rev) if PHRASES[i % 5] is not None else None,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def _vocab_setup(spark, tmp_path):
    from orientdb_neo4j_importer_plugin_spark.lake.sketchview import (
        StreamedVocabView,
    )

    source = SnapshotTable.create(
        spark, str(tmp_path / "vsrc"), TEXT_SCHEMA, "doc_id",
        num_buckets=8, key_columns=["doc_id"],
    )
    state = StreamedVocabView.create_state(
        spark, str(tmp_path / "vstate"), num_buckets=4
    )
    return source, StreamedVocabView(source, state)


def _vocab_expect(source, k=1000):
    """Batch recompute over live rows via the existing corpus operator."""
    from orientdb_neo4j_importer_plugin_spark.operators.repetition import (
        vocab_topk,
    )

    live = source.read().filter("text is not null")
    return [
        tuple(r)
        for r in vocab_topk(live, k=k).collect()
    ]


def test_vocab_view_tracks_source_through_iud(spark, tmp_path):
    source, view = _vocab_setup(spark, tmp_path)
    apply_changes(_text_feed(spark, 40), source, batch_id="i", mode="mor")
    r1 = view.refresh()
    assert r1["cells_changed"] > 0 and not r1["skipped"]
    assert [tuple(r) for r in view.topk(1000).collect()] == _vocab_expect(source)

    # updates REWRITE text (old tokens decrement, ' rev' token appears)
    upd = _text_feed(spark, 40, lsn0=1000, op="U", rev=" rev")
    apply_changes(upd.filter("doc_id % 2 = 0"), source, batch_id="u", mode="mor")
    # deletes remove whole rows' counts
    dels = spark.createDataFrame(
        [(2000 + i, "D", i, None) for i in range(0, 40, 7)],
        "lsn long, op string, doc_id long, text string",
    )
    apply_changes(dels, source, batch_id="d", mode="mor")
    view.refresh()
    assert [tuple(r) for r in view.topk(1000).collect()] == _vocab_expect(source)
    # replay: no new source version -> committed no-op
    r3 = view.refresh()
    assert r3["skipped"] and r3["cells_changed"] == 0


def test_vocab_view_update_same_text_touches_no_cells(spark, tmp_path):
    source, view = _vocab_setup(spark, tmp_path)
    apply_changes(_text_feed(spark, 20), source, batch_id="i", mode="mor")
    view.refresh()
    # same text re-asserted at higher lsn: pre/post token counts cancel
    apply_changes(
        _text_feed(spark, 20, lsn0=500, op="U"), source, batch_id="u", mode="mor"
    )
    r = view.refresh()
    assert r["cells_changed"] == 0 and not r["skipped"]
    assert [tuple(r) for r in view.topk(1000).collect()] == _vocab_expect(source)


def test_vocab_view_streamed_kill_and_resume(spark, tmp_path):
    source, view = _vocab_setup(spark, tmp_path)
    ckpt = str(tmp_path / "vckpt")

    def wave():
        q = view.stream(ckpt)
        q.awaitTermination(600)
        if q.isActive:  # pragma: no cover - hang guard
            q.stop()
            raise AssertionError("vocab stream did not drain")

    apply_changes(_text_feed(spark, 30), source, batch_id="i", mode="mor")
    wave()
    # maintainer down: an update+delete wave lands, then checkpoint resume
    apply_changes(
        _text_feed(spark, 30, lsn0=1000, op="U", rev=" extra").filter(
            "doc_id % 3 = 0"
        ),
        source,
        batch_id="u",
        mode="mor",
    )
    wave()
    assert [tuple(r) for r in view.topk(1000).collect()] == _vocab_expect(source)


# StreamedToolUsageView (fourth family member: per-tool usage counters) ------


def _tu_setup(spark, tmp_path):
    from orientdb_neo4j_importer_plugin_spark.lake.sketchview import (
        StreamedToolUsageView,
    )
    from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS

    source = SnapshotTable.create(
        spark, str(tmp_path / "tu_src"), TRANSCRIPTS, "conv_id", num_buckets=8
    )
    state = StreamedToolUsageView.create_state(
        spark, str(tmp_path / "tu_state"), num_buckets=8
    )
    return source, StreamedToolUsageView(source, state)


def _tu_feed(spark, n, lsn0=0, op="I", tool_mod=3, rev=""):
    import datetime

    ts = datetime.datetime(2026, 1, 1)
    rows = [
        (
            lsn0 + i,
            op,
            f"conv_{i % 5}",
            i // 5,
            "tool",
            f"out {i}{rev}",
            (f"t{i % tool_mod}" if i % 4 != 0 else None),
            ts,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    )


def _tu_expect(source):
    from orientdb_neo4j_importer_plugin_spark.operators import transcripts as TR

    return [
        (r["tool"], r["n_calls"], r["n_convs"], r["n_tokens"])
        for r in TR.tool_usage_stats(source.read()).collect()
    ]


def _tu_got(view):
    return [
        (r["tool"], r["n_calls"], r["n_convs"], r["n_tokens"])
        for r in view.usage().collect()
    ]


def test_tool_usage_view_tracks_source_through_iud(spark, tmp_path):
    source, view = _tu_setup(spark, tmp_path)
    apply_changes(_tu_feed(spark, 40), source, batch_id="i", mode="mor")
    r1 = view.refresh()
    assert r1["cells_changed"] > 0 and not r1["skipped"]
    assert _tu_got(view) == _tu_expect(source)

    # updates RETOOL half the turns (tool_mod changes t-assignment) and
    # rewrite text; deletes remove whole turns
    upd = _tu_feed(spark, 40, lsn0=1000, op="U", tool_mod=2, rev=" rev x")
    apply_changes(upd.filter("pmod(lsn, 2) = 0"), source, batch_id="u", mode="mor")
    import datetime

    dels = spark.createDataFrame(
        [
            (2000 + i, "D", f"conv_{i % 5}", i // 5, None, None, None,
             datetime.datetime(2026, 1, 1))
            for i in range(0, 40, 7)
        ],
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    )
    apply_changes(dels, source, batch_id="d", mode="mor")
    view.refresh()
    assert _tu_got(view) == _tu_expect(source)
    r3 = view.refresh()
    assert r3["skipped"] and r3["cells_changed"] == 0


def test_tool_usage_view_same_image_touches_no_cells(spark, tmp_path):
    source, view = _tu_setup(spark, tmp_path)
    apply_changes(_tu_feed(spark, 20), source, batch_id="i", mode="mor")
    view.refresh()
    # same (tool, text) re-asserted at higher lsn: pre/post cancel
    apply_changes(
        _tu_feed(spark, 20, lsn0=500, op="U"), source, batch_id="u", mode="mor"
    )
    r = view.refresh()
    assert r["cells_changed"] == 0 and not r["skipped"]
    assert _tu_got(view) == _tu_expect(source)


def test_tool_usage_view_streamed_kill_and_resume(spark, tmp_path):
    source, view = _tu_setup(spark, tmp_path)
    ckpt = str(tmp_path / "tuckpt")

    def wave():
        q = view.stream(ckpt)
        q.awaitTermination(600)
        if q.isActive:  # pragma: no cover - hang guard
            q.stop()
            raise AssertionError("tool-usage stream did not drain")

    apply_changes(_tu_feed(spark, 30), source, batch_id="a", mode="mor")
    wave()
    assert _tu_got(view) == _tu_expect(source)
    # source advances while the stream is down; a NEW stream resumes
    apply_changes(
        _tu_feed(spark, 30, lsn0=1000, op="U", tool_mod=2),
        source, batch_id="b", mode="mor",
    )
    wave()
    assert _tu_got(view) == _tu_expect(source)


def test_hist_view_over_mirror_tail(spark, tmp_path):
    """The analytics tier rides a FAN-OUT REPLICA instead of the ingest
    primary (the 100 TB topology in SCALE.md: primary takes writes,
    replicas absorb the read/maintenance load): a StreamedHistView fed by
    a MirrorRunner-maintained replica converges to cell state and
    histogram IDENTICAL to a view fed by the primary, through inserts,
    value-changing updates, and deletes."""
    from orientdb_neo4j_importer_plugin_spark.streaming import MirrorRunner

    source, primary_view = _setup(spark, tmp_path)
    replica = SnapshotTable.create(
        spark, str(tmp_path / "replica"), EVENTS_SCHEMA, "event_id",
        num_buckets=4, key_columns=["event_id"],
    )
    replica_state = StreamedHistView.create_state(
        spark, str(tmp_path / "rhist"), num_buckets=4
    )
    replica_view = StreamedHistView(replica, replica_state)

    def mirror():
        MirrorRunner(
            spark, source, replica,
            checkpoint_dir=str(tmp_path / "ck_mirror"), mode="mor",
        ).run_to_completion(timeout_sec=180)

    def assert_views_equal():
        a = _rows(
            primary_view.state.read().select("event_type", "value", "cnt")
        )
        b = _rows(
            replica_view.state.read().select("event_type", "value", "cnt")
        )
        assert a == b and len(a) > 0
        assert _rows(primary_view.hist()) == _rows(replica_view.hist())
        assert _rows(replica_view.hist()) == _expect(source)

    apply_changes(_feed(spark, 40), source, batch_id="i", mode="mor")
    mirror()
    primary_view.refresh()
    replica_view.refresh()
    assert_views_equal()

    # updates shift values, deletes remove rows — the replica's pre-image
    # changelog must decrement exactly like the primary's
    apply_changes(
        _feed(spark, 15, lsn0=1000, op="U", value_shift=2.5),
        source, batch_id="u", mode="mor",
    )
    dels = spark.createDataFrame(
        [(2000 + i, "D", i, None, None) for i in range(30, 36)],
        "lsn long, op string, event_id long, event_type string, value double",
    )
    apply_changes(dels, source, batch_id="d", mode="mor")
    mirror()
    primary_view.refresh()
    replica_view.refresh()
    assert_views_equal()

# StreamedLangDistView (fifth family member: language mix over live turns) ---


_LV_TEXTS = [
    "the cat and the dog of it",      # en (3+ marker hits)
    "el gato la casa de aqui",        # es
    "der hund die katze und so",      # de
    "le chat la nuit et jour",        # fr
    "zzz qqq xxx",                    # und (no markers)
    "",                               # und, zero tokens
]


def _lv_setup(spark, tmp_path):
    from orientdb_neo4j_importer_plugin_spark.lake.sketchview import (
        StreamedLangDistView,
    )
    from orientdb_neo4j_importer_plugin_spark.schema import TRANSCRIPTS

    source = SnapshotTable.create(
        spark, str(tmp_path / "lv_src"), TRANSCRIPTS, "conv_id", num_buckets=8
    )
    state = StreamedLangDistView.create_state(
        spark, str(tmp_path / "lv_state"), num_buckets=4
    )
    return source, StreamedLangDistView(source, state)


def _lv_feed(spark, n, lsn0=0, op="I", shift=0):
    import datetime

    ts = datetime.datetime(2026, 1, 1)
    rows = [
        (
            lsn0 + i,
            op,
            f"conv_{i % 5}",
            i // 5,
            ("user" if i % 2 == 0 else "assistant"),
            _LV_TEXTS[(i + shift) % len(_LV_TEXTS)],
            None,
            ts,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    )


def _lv_expect(source):
    """Pure-Python from-scratch recompute of the (lang, role) rollup over
    the live rows — independent of every Spark expression in the view."""
    from orientdb_neo4j_importer_plugin_spark.operators.textstats import (
        LANG_MARKERS,
    )

    agg = {}
    for r in source.read().select("role", "text").collect():
        toks = [t for t in (r["text"] or "").lower().split() if t]
        hits = {lg: sum(1 for t in toks if t in ms)
                for lg, ms in LANG_MARKERS.items()}
        best = max(hits.values())
        lang = "und"
        if best > 0:
            lang = next(lg for lg in LANG_MARKERS if hits[lg] == best)
        key = (lang, r["role"])
        turns, tok = agg.get(key, (0, 0))
        agg[key] = (turns + 1, tok + len(toks))
    return sorted(
        [(lg, role, t, k) for (lg, role), (t, k) in agg.items()]
    )


def _lv_got(view):
    return [
        (r["lang"], r["role"], r["n_turns"], r["n_tokens"])
        for r in view.dist().collect()
    ]


def test_lang_view_tracks_source_through_iud(spark, tmp_path):
    source, view = _lv_setup(spark, tmp_path)
    apply_changes(_lv_feed(spark, 40), source, batch_id="i", mode="mor")
    r1 = view.refresh()
    assert r1["cells_changed"] > 0 and not r1["skipped"]
    assert _lv_got(view) == _lv_expect(source)

    # updates RECLASSIFY half the turns (shift rotates the text cycle, so
    # a turn's language flips: one cell decrements, another increments)
    upd = _lv_feed(spark, 40, lsn0=1000, op="U", shift=2)
    apply_changes(upd.filter("pmod(lsn, 2) = 0"), source, batch_id="u", mode="mor")
    import datetime

    dels = spark.createDataFrame(
        [
            (2000 + i, "D", f"conv_{i % 5}", i // 5, None, None, None,
             datetime.datetime(2026, 1, 1))
            for i in range(0, 40, 7)
        ],
        "lsn long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp",
    )
    apply_changes(dels, source, batch_id="d", mode="mor")
    view.refresh()
    assert _lv_got(view) == _lv_expect(source)
    r3 = view.refresh()
    assert r3["skipped"] and r3["cells_changed"] == 0


def test_lang_view_same_text_touches_no_cells(spark, tmp_path):
    source, view = _lv_setup(spark, tmp_path)
    apply_changes(_lv_feed(spark, 20), source, batch_id="i", mode="mor")
    view.refresh()
    # same text re-asserted at higher lsn: pre/post cancel in cell_delta
    apply_changes(
        _lv_feed(spark, 20, lsn0=500, op="U"), source, batch_id="u", mode="mor"
    )
    r = view.refresh()
    assert r["cells_changed"] == 0 and not r["skipped"]
    assert _lv_got(view) == _lv_expect(source)


def test_lang_view_streamed_kill_and_resume(spark, tmp_path):
    source, view = _lv_setup(spark, tmp_path)
    ckpt = str(tmp_path / "lvckpt")

    def wave():
        q = view.stream(ckpt)
        q.awaitTermination(600)
        if q.isActive:  # pragma: no cover - hang guard
            q.stop()
            raise AssertionError("lang stream did not drain")

    apply_changes(_lv_feed(spark, 30), source, batch_id="a", mode="mor")
    wave()
    assert _lv_got(view) == _lv_expect(source)
    # source advances while the stream is down; a NEW stream resumes
    apply_changes(
        _lv_feed(spark, 30, lsn0=1000, op="U", shift=3),
        source, batch_id="b", mode="mor",
    )
    wave()
    assert _lv_got(view) == _lv_expect(source)
