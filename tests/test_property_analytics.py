"""Property-based equivalence for the events-analytics pair: random event
sets -> cohort_retention / funnel equal pure-Python references computed
with none of the Spark machinery (no windows, no joins — plain dicts)."""

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from orientdb_neo4j_importer_plugin_spark.operators.sessionize import (
    cohort_retention,
    funnel,
)

BASE = datetime.datetime(2024, 1, 1)
TYPES = ["view", "click", "purchase"]


@st.composite
def event_sets(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for i in range(n):
        rows.append(
            (
                i,  # event_id
                BASE
                + datetime.timedelta(
                    hours=draw(st.integers(min_value=0, max_value=21 * 24))
                ),
                draw(st.integers(min_value=0, max_value=5)),  # user_id
                draw(st.sampled_from(TYPES)),
                1.0,
                "{}",
            )
        )
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _day(ts):
    return datetime.datetime(ts.year, ts.month, ts.day)


def _cohort_ref(rows):
    first = {}
    for _, ts, uid, *_ in rows:
        if uid not in first or ts < first[uid]:
            first[uid] = ts
    cohort = {u: _day(t) for u, t in first.items()}
    active = {(uid, _day(ts)) for _, ts, uid, *_ in rows}
    per = {}
    for uid, day in active:
        key = (cohort[uid], (day - cohort[uid]).days)
        per[key] = per.get(key, 0) + 1
    sizes = {}
    for c in cohort.values():
        sizes[c] = sizes.get(c, 0) + 1
    return {
        (c, off): (n, sizes[c], n * 10000 // sizes[c])
        for (c, off), n in per.items()
    }


def _funnel_ref(rows, steps, within):
    by_user = {}
    for _, ts, uid, typ, *_ in rows:
        by_user.setdefault(uid, []).append((ts, typ))
    counts = [0] * len(steps)
    for evs in by_user.values():
        evs.sort()
        t = t0 = None
        reached = 0
        for step in steps:
            cand = [
                ts
                for ts, typ in evs
                if typ == step
                and (t is None or ts > t)
                and (
                    t0 is None
                    or within is None
                    or ts <= t0 + datetime.timedelta(seconds=within)
                )
            ]
            if not cand:
                break
            t = min(cand)
            if t0 is None:
                t0 = t
            reached += 1
        for i in range(reached):
            counts[i] += 1
    return counts


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(event_sets())
def test_cohort_equals_python_reference(spark, rows):
    got = {
        (r.cohort, r.period_offset): (
            r.active_users,
            r.cohort_size,
            r.retention_bp,
        )
        for r in cohort_retention(_df(spark, rows), "day").collect()
    }
    assert got == _cohort_ref(rows)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(event_sets(), st.sampled_from([None, 86400, 3 * 86400]))
def test_funnel_equals_python_reference(spark, rows, within):
    got = [
        r.users
        for r in funnel(_df(spark, rows), TYPES, within_seconds=within)
        .orderBy("step_idx")
        .collect()
    ]
    assert got == _funnel_ref(rows, TYPES, within)
