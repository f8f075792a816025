"""cohort_retention: constructed fixtures with hand-computed matrices."""

import datetime as dt

import pytest

from orientdb_neo4j_importer_plugin_spark.operators.sessionize import (
    cohort_retention,
)


def _events(spark, rows):
    """rows: (user_id, iso_ts) -> minimal events frame."""
    return spark.createDataFrame(
        [
            (i, dt.datetime.fromisoformat(ts), uid, "click", 1.0, "{}")
            for i, (uid, ts) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_weekly_matrix(spark):
    # cohort A (w0 = Mon 2024-01-01): u1 active w0+w1, u2 active w0 only
    # cohort B (w1 = Mon 2024-01-08): u3 active w1+w2
    ev = _events(
        spark,
        [
            (1, "2024-01-02T10:00"),  # u1 w0 (first)
            (1, "2024-01-10T10:00"),  # u1 w1
            (2, "2024-01-03T10:00"),  # u2 w0 (first)
            (3, "2024-01-08T10:00"),  # u3 w1 (first)
            (3, "2024-01-17T10:00"),  # u3 w2
            (1, "2024-01-04T10:00"),  # u1 again in w0 (dedup inside period)
        ],
    )
    got = {
        (r.cohort.date().isoformat(), r.period_offset): (
            r.active_users,
            r.cohort_size,
            r.retention_bp,
        )
        for r in cohort_retention(ev, "week").collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 2, 10000),
        ("2024-01-01", 1): (1, 2, 5000),
        ("2024-01-08", 0): (1, 1, 10000),
        ("2024-01-08", 1): (1, 1, 10000),
    }


def test_monthly_offsets(spark):
    # offsets cross a month whose length != 28/31 uniformity
    ev = _events(
        spark,
        [
            (1, "2024-01-15T00:00"),
            (1, "2024-03-01T00:00"),  # offset 2 months
            (2, "2024-02-20T00:00"),
        ],
    )
    got = {
        (r.cohort.date().isoformat(), r.period_offset): r.active_users
        for r in cohort_retention(ev, "month").collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-02-01", 0): 1,
    }


def test_bad_granularity(spark):
    ev = _events(spark, [(1, "2024-01-01T00:00")])
    with pytest.raises(ValueError, match="granularity"):
        cohort_retention(ev, "fortnight")


def test_funnel_ordering_and_window(spark):
    from orientdb_neo4j_importer_plugin_spark.operators.sessionize import (
        funnel,
    )

    ev = _events(
        spark,
        [
            # u1 converts fully, in order
            (1, "2024-01-01T00:00"),
            (1, "2024-01-01T01:00"),
            (1, "2024-01-01T02:00"),
            # u2 has all types but purchase BEFORE click -> stops at click
            (2, "2024-01-01T00:00"),
            (2, "2024-01-01T00:30"),
            (2, "2024-01-01T01:00"),
            # u3 converts but outside the 2h window -> stops at click
            (3, "2024-01-01T00:00"),
            (3, "2024-01-01T01:00"),
            (3, "2024-01-01T03:00"),
            # u4 never starts (no view)
            (4, "2024-01-01T00:00"),
        ],
    )
    # overwrite types: map event_id -> type by position
    types = [
        "view", "click", "purchase",
        "view", "purchase", "click",
        "view", "click", "purchase",
        "click",
    ]
    from pyspark.sql import functions as F

    m = F.create_map(
        *[x for i, t in enumerate(types) for x in (F.lit(i), F.lit(t))]
    )
    ev = ev.withColumn("event_type", m[F.col("event_id")])
    rows = {
        r.step_idx: (r.step, r.users, r.conversion_bp)
        for r in funnel(
            ev, ["view", "click", "purchase"], within_seconds=7200
        ).collect()
    }
    assert rows == {
        1: ("view", 3, 10000),
        2: ("click", 3, 10000),
        3: ("purchase", 1, 3333),
    }


def test_funnel_repeated_step(spark):
    from orientdb_neo4j_importer_plugin_spark.operators.sessionize import (
        funnel,
    )

    # view->view needs TWO distinct view timestamps
    ev = _events(
        spark,
        [(1, "2024-01-01T00:00"), (1, "2024-01-01T01:00"),
         (2, "2024-01-01T00:00")],
    )
    rows = {
        r.step_idx: r.users
        for r in funnel(ev, ["click", "click"]).collect()
    }
    assert rows == {1: 2, 2: 1}
