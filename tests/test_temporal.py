"""As-of join semantics: equal-ts tie goes to the right row (ASOF >=),
no-match rows null-fill, and the latest (not first) preceding right wins."""

import datetime

from pyspark.sql import functions as F

from orientdb_neo4j_importer_plugin_spark.operators.temporal import asof_join


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m, 0)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(10), 100.0),  # after r@5 and r@10 -> r@10 (equal ts wins)
            (2, "u1", _ts(7), 200.0),   # between r@5 and r@10 -> r@5
            (3, "u1", _ts(1), 300.0),   # before any right -> null
            (4, "u2", _ts(30), 400.0),  # different key, r@20 -> 20.0
            (5, "u3", _ts(30), 500.0),  # key with no right rows -> null
        ],
        "event_id long, user_id string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(5), 5.0),
            ("u1", _ts(10), 10.0),
            ("u1", _ts(15), 15.0),  # future of every left u1 row
            ("u2", _ts(20), 20.0),
        ],
        "user_id string, ts timestamp, click_value double",
    )
    out = {
        r.event_id: r.last_click
        for r in asof_join(
            left, right, key="user_id", ts="ts",
            right_value="click_value", out_name="last_click",
        ).collect()
    }
    assert out == {1: 10.0, 2: 5.0, 3: None, 4: 20.0, 5: None}


def test_asof_join_is_single_shuffle(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(1), 1.0)],
        "event_id long, user_id string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [("u", _ts(0), 9.0)], "user_id string, ts timestamp, click_value double"
    )
    plan = asof_join(
        left, right, key="user_id", ts="ts", right_value="click_value"
    )._jdf.queryExecution().executedPlan().toString()
    # the union+window form must not degrade into any join operator
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_hist_quantiles_error_bound(spark):
    """The histogram-CDF sketch's error vs exact quantiles is bounded by
    one bin width = (max-min)/bins per group (the sketch's contract)."""
    import os

    from orientdb_neo4j_importer_plugin_spark.operators.temporal import (
        HIST_BINS,
        value_quantiles,
        value_quantiles_hist,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    events = spark.read.parquet(f"{sf}/events.parquet")
    exact = {r["event_type"]: r for r in value_quantiles(events).collect()}
    sketch = {r["event_type"]: r for r in value_quantiles_hist(events).collect()}
    spans = {
        r["event_type"]: (r["hi"] - r["lo"])
        for r in events.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    assert set(exact) == set(sketch) and exact
    for et, e in exact.items():
        s = sketch[et]
        assert s["n"] == e["n"]
        width = spans[et] / HIST_BINS
        for p in ("p25", "p50", "p90"):
            err = abs(s[p] - e[p])
            assert err <= width + 1e-4, (et, p, err, width)


def test_hist_quantiles_deterministic_under_repartition(spark):
    """Sketch output is a pure function of the value multiset — identical
    under arbitrary repartitioning (merge-order independence, unlike
    percentile_approx's t-digest)."""
    import os

    from orientdb_neo4j_importer_plugin_spark.operators.temporal import (
        value_quantiles_hist,
    )

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    events = spark.read.parquet(f"{sf}/events.parquet")
    a = sorted(map(tuple, value_quantiles_hist(events).collect()))
    b = sorted(
        map(tuple, value_quantiles_hist(events.repartition(17, "user_id")).collect())
    )
    assert a == b


def test_interval_join_semantics(spark):
    """Binned interval join: inclusive endpoints, multi-bin intervals
    match without duplicate pairs, key isolation, and the plan is an
    equi-join (no nested loop)."""
    from orientdb_neo4j_importer_plugin_spark.operators.temporal import (
        interval_join,
    )

    W = 100  # bin width (us) deliberately smaller than the intervals
    intervals = spark.createDataFrame(
        [
            ("u1", 10, 250, "i1"),   # spans bins 0,1,2
            ("u1", 240, 260, "i2"),  # overlaps i1's tail
            ("u2", 0, 1000, "i3"),   # other key
        ],
        "k string, s long, e long, iid string",
    )
    points = spark.createDataFrame(
        [
            ("u1", 10, "p_start"),    # == i1.s -> inclusive
            ("u1", 250, "p_end"),     # == i1.e and inside i2
            ("u1", 251, "p_after"),   # only i2
            ("u1", 5, "p_before"),    # no interval
            ("u2", 250, "p_u2"),      # i3 only (key isolation)
        ],
        "k string, p long, pid string",
    )
    pairs = interval_join(
        points, intervals, key="k", point_us="p",
        start_us="s", end_us="e", bin_width_us=W,
    )
    got = sorted((r["pid"], r["iid"]) for r in pairs.collect())
    assert got == [
        ("p_after", "i2"),
        ("p_end", "i1"),
        ("p_end", "i2"),
        ("p_start", "i1"),
        ("p_u2", "i3"),
    ]
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_rejects_bad_inputs(spark):
    from orientdb_neo4j_importer_plugin_spark.operators.temporal import (
        interval_join,
    )
    import pytest

    df = spark.createDataFrame([("u1", 1, 2)], "k string, s long, e long")
    with pytest.raises(ValueError, match="positive"):
        interval_join(df, df, "k", "s", "s", "e", 0)
    with pytest.raises(ValueError, match="overlapping"):
        interval_join(df, df, "k", "s", "s", "e", 10)
