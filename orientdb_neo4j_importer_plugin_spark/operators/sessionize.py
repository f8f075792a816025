"""Event-stream operators over the `events` table.

CDC-shaped relational semantics the engine's pipeline uses internally,
exposed as standalone operators with SQL oracle twins:

* ``latest_state`` — LWW snapshot per key (the engine's core semantics, as a
  pure query; reference analogue: rebuild-to-latest,
  ``ONeo4jImporter.java:105-112``).
* ``sessionize`` — gap-based sessions via lag window (streaming-shaped).
* ``tumbling_counts`` — time-bucketed aggregation (windowed agg twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def _epoch(c):
    """Seconds since epoch for timestamp or timestamp_ntz columns (ntz is
    interpreted in the session timezone, pinned to UTC in session.py — the
    same reading DuckDB's epoch() gives the naive fixture timestamps)."""
    return F.unix_timestamp(c.cast("timestamp"))


def latest_state(events: DataFrame) -> DataFrame:
    """Last event per (user_id, event_type) by event_id (monotone = lsn).

    Columns: user_id, event_type, last_event_id, last_value, last_ts.
    Algebraic argmax — see cdc/lww.py for why this beats row_number at scale.
    """
    w = F.max(
        F.struct(F.col("event_id"), F.col("value"), F.col("ts"))
    ).alias("__w")
    return (
        events.groupBy("user_id", "event_type")
        .agg(w)
        .select(
            "user_id",
            "event_type",
            F.col("__w.event_id").alias("last_event_id"),
            F.col("__w.value").alias("last_value"),
            F.col("__w.ts").alias("last_ts"),
        )
    )


LATEST_STATE_SQL = """
WITH ranked AS (
  SELECT user_id, event_type, event_id, value, ts,
         row_number() OVER (
           PARTITION BY user_id, event_type ORDER BY event_id DESC
         ) AS rn
  FROM events
)
SELECT user_id, event_type,
       event_id AS last_event_id, value AS last_value, ts AS last_ts
FROM ranked WHERE rn = 1
ORDER BY user_id, event_type
"""


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the gap
    from the previous event exceeds `gap_minutes`.

    Columns: user_id, session_id (ordinal per user), n_events,
    session_start, session_end.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = _epoch(F.col("ts")) - F.lag(_epoch(F.col("ts"))).over(w)
    with_start = events.withColumn(
        "is_start",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    with_sid = with_start.withColumn(
        "session_id", F.sum("is_start").over(w)
    )
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def sessionize_sql(gap_minutes: int = SESSION_GAP_MIN) -> str:
    return f"""
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > {gap_minutes * 60}
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         CAST(sum(is_start) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM s GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


def session_window_agg(
    events: DataFrame, gap_minutes: int = SESSION_GAP_MIN
) -> DataFrame:
    """Gap sessionization through Spark's NATIVE session_window operator
    (dynamic-gap merging inside the aggregation, the streaming-capable
    form) — same semantics as `sessionize` but the window merge happens in
    the aggregate instead of a lag/cumsum window pair, so it needs no
    total per-user sort and works under `groupBy` partial aggregation.

    Spark's rule: an event extends the session while ts < prev_end
    (prev_ts + gap); session_end = last ts + gap. Columns: user_id,
    session_start, session_end, n_events.
    """
    sw = F.session_window(F.col("ts"), f"{gap_minutes} minutes")
    return (
        events.groupBy("user_id", sw.alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


def session_window_agg_sql(gap_minutes: int = SESSION_GAP_MIN) -> str:
    """DuckDB twin: lag-gap-cumsum with the >= boundary Spark uses (a gap
    of exactly `gap` starts a NEW session), micros-exact arithmetic;
    session_end = max(ts) + gap."""
    gap_us = gap_minutes * 60 * 1_000_000
    return f"""
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('microsecond', lag(ts) OVER w, ts) >= {gap_us}
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         sum(is_start) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING
         ) AS sid
  FROM g
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL {gap_minutes} MINUTE AS session_end,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def pivot_type_by_hour(events: DataFrame) -> DataFrame:
    """Hour x event-type count matrix via the PIVOT operator.

    The pivot values are DECLARED (EVENT_TYPES) rather than discovered, so
    Spark skips the extra distinct-scan job and the output schema is
    stable — both required at 100 TB (a discovery pass over the fact table
    costs a full scan; an inferred schema breaks downstream contracts).
    One shuffle on the hour key.
    """
    hour = F.date_trunc("hour", F.col("ts")).alias("hour")
    out = (
        events.select(hour, "event_type")
        .groupBy("hour")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return out.na.fill(0, EVENT_TYPES).select(
        "hour", *[F.col(t).cast("long").alias(t) for t in EVENT_TYPES]
    ).orderBy("hour")


def pivot_type_by_hour_sql() -> str:
    conds = ",\n       ".join(
        f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS {t}"
        for t in EVENT_TYPES
    )
    return f"""
SELECT date_trunc('hour', ts) AS hour,
       {conds}
FROM events
GROUP BY 1
ORDER BY hour
"""


def props_parse(events: DataFrame) -> DataFrame:
    """Parse the JSON `props` column and aggregate — the property-map
    explode analogue (reference P2, `Migrator:243-248`: iterate property
    map, convert each value; here: from_json + typed projection).

    Columns: event_type, n_events, avg_k, max_k.
    """
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


PROPS_PARSE_SQL = """
SELECT event_type, count(*) AS n_events,
       round(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 4) AS avg_k,
       max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def first_value_sample(events: DataFrame) -> DataFrame:
    """First (lowest-event_id) value per event_type — the reference's
    sample-one-record type inference (W2, ``ONeo4jImporterUtils.java:158-201``)
    made deterministic via argmin instead of order-dependent first().

    Columns: event_type, first_event_id, first_value, inferred_type.
    """
    w = F.min(F.struct(F.col("event_id"), F.col("value"))).alias("__w")
    return (
        events.filter(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(w)
        .select(
            "event_type",
            F.col("__w.event_id").alias("first_event_id"),
            F.col("__w.value").alias("first_value"),
            F.lit("DOUBLE").alias("inferred_type"),  # instance-of the sample
        )
    )


FIRST_VALUE_SAMPLE_SQL = """
WITH ranked AS (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS rn
  FROM events WHERE value IS NOT NULL
)
SELECT event_type, event_id AS first_event_id, value AS first_value,
       'DOUBLE' AS inferred_type
FROM ranked WHERE rn = 1
ORDER BY event_type
"""


def span_summary(events: DataFrame) -> DataFrame:
    """Per-type time span formatted HH:mm:ss + formatted avg value — the
    HMS/decimal formatting analogues (F3 ``OFunctionsHandler.java:35-63``,
    F6 ``ONeo4jImporter.java:78-79``).

    Columns: event_type, span_hms, avg_value_fmt.
    """
    span = _epoch(F.max("ts")) - _epoch(F.min("ts"))
    hms = F.concat_ws(
        ":",
        F.lpad(F.floor(span / 3600).cast("string"), 2, "0"),
        F.lpad(F.floor(span % 3600 / 60).cast("string"), 2, "0"),
        F.lpad((span % 60).cast("string"), 2, "0"),
    )
    return events.groupBy("event_type").agg(
        hms.alias("span_hms"),
        F.format_number(F.avg("value"), 2).alias("avg_value_fmt"),
    )


SPAN_SUMMARY_SQL = """
WITH s AS (
  SELECT event_type,
         CAST(floor(epoch(max(ts))) AS BIGINT)
           - CAST(floor(epoch(min(ts))) AS BIGINT) AS span,
         avg(value) AS av
  FROM events GROUP BY event_type
)
SELECT event_type,
       lpad(CAST(span // 3600 AS VARCHAR), 2, '0') || ':' ||
       lpad(CAST((span % 3600) // 60 AS VARCHAR), 2, '0') || ':' ||
       lpad(CAST(span % 60 AS VARCHAR), 2, '0') AS span_hms,
       printf('%.2f', av) AS avg_value_fmt
FROM s
ORDER BY event_type
"""


def tumbling_counts(events: DataFrame, hours: int = 6) -> DataFrame:
    """Events + value sum per event_type per N-hour tumbling window.

    Columns: event_type, window_start, n_events, sum_value.
    Uses arithmetic time-bucketing (epoch-truncation) rather than F.window's
    struct output so the SQL twin is byte-identical.
    """
    secs = hours * 3600
    # cast to ntz: naive timestamps on both engines (driver compares values)
    bucket = F.timestamp_seconds(
        (_epoch(F.col("ts")) / secs).cast("long") * secs
    ).cast("timestamp_ntz")
    return (
        events.groupBy("event_type", bucket.alias("window_start"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def tumbling_counts_sql(hours: int = 6) -> str:
    secs = hours * 3600
    return f"""
SELECT event_type,
       CAST(to_timestamp((CAST(floor(epoch(ts)) AS BIGINT) // {secs}) * {secs}) AS TIMESTAMP) AS window_start,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY event_type, window_start
"""


def rolling_stats(events: DataFrame, window_rows: int = 5) -> DataFrame:
    """Frame-spec window breadth: per-user rolling mean/max of `value` over
    the previous `window_rows` events plus lag/lead deltas — the
    moving-aggregate family the reference lacks entirely (SURVEY §2.5) but
    any event-analytics user expects.

    One shuffle on user_id; frame evaluation is O(frame) per row inside the
    sorted partition (Spark re-aggregates the buffered frame — fine for
    small windows; for window_rows in the thousands pre-aggregate instead).
    Ties on ts are broken by event_id so both engines order identically.

    Parity note: the rolling MEAN is built as an explicit lag-chain sum
    (left-to-right association) rather than avg() OVER a frame — engines
    disagree on frame-aggregate summation order (DuckDB segment tree vs
    Spark sequential), and a float ULP at a round(.,4) half-boundary would
    flip the last digit. An identical expression tree is bit-identical.
    max() is association-free and stays a frame aggregate.

    Columns: event_id, user_id, ts, value, roll_avg, roll_max, prev_gap_s,
    next_gap_s.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(-window_rows, 0)
    ep = _epoch(F.col("ts"))
    total = F.col("value")
    n = F.lit(1)
    for i in range(1, window_rows + 1):
        lv = F.lag("value", i).over(w)
        total = total + F.coalesce(lv, F.lit(0.0))
        n = n + F.when(lv.isNotNull(), 1).otherwise(0)
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round(total / n, 4).alias("roll_avg"),
        F.round(F.max("value").over(frame), 4).alias("roll_max"),
        (ep - F.lag(ep).over(w)).alias("prev_gap_s"),
        (F.lead(ep).over(w) - ep).alias("next_gap_s"),
    )


def rolling_stats_sql(window_rows: int = 5) -> str:
    lag_sum = "value" + "".join(
        f" + coalesce(lag(value, {i}) OVER w_order, 0.0)"
        for i in range(1, window_rows + 1)
    )
    lag_n = "1" + "".join(
        f" + CASE WHEN lag(value, {i}) OVER w_order IS NOT NULL THEN 1 ELSE 0 END"
        for i in range(1, window_rows + 1)
    )
    return f"""
SELECT event_id, user_id, ts, value,
       round(({lag_sum}) / ({lag_n}), 4) AS roll_avg,
       round(max(value) OVER w_frame, 4) AS roll_max,
       CAST(floor(epoch(ts)) AS BIGINT)
         - CAST(floor(epoch(lag(ts) OVER w_order)) AS BIGINT) AS prev_gap_s,
       CAST(floor(epoch(lead(ts) OVER w_order)) AS BIGINT)
         - CAST(floor(epoch(ts)) AS BIGINT) AS next_gap_s
FROM events
WINDOW
  w_order AS (PARTITION BY user_id ORDER BY ts, event_id),
  w_frame AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN {window_rows} PRECEDING AND CURRENT ROW)
ORDER BY user_id, ts, event_id
"""


def cohort_retention(events: DataFrame, granularity: str = "week") -> DataFrame:
    """Cohort-retention matrix: users grouped by the period of their FIRST
    event (the cohort), then counted per subsequent activity period.

    Columns: cohort (date), period_offset (int periods since the cohort
    period), active_users, cohort_size, retention_bp (basis points,
    INTEGER ``active*10000 div size`` — exact integer arithmetic, so the
    DuckDB oracle twin is hash-identical where a double ratio could
    diverge in the last bit).

    The product-analytics consumer the reference's one-shot copy cannot
    serve (no history, no time axis; ``ONeo4jImporter.java:105-112``
    rebuilds latest state only).

    Scale shape (10^10 events): two user_id-partitioned aggregations
    (first-event and distinct user-periods — both map-side combinable),
    one co-keyed join, then a tiny (cohort, offset) aggregate where
    ``count(*)`` suffices — a user contributes at most ONE row per
    period by construction, so there is NO countDistinct expand. Cohort
    sizes broadcast (O(#periods) rows). Nothing scales with users on
    the driver.
    """
    if granularity not in ("day", "week", "month"):
        raise ValueError(f"unsupported granularity {granularity!r}")
    # date_trunc stays TIMESTAMP in both engines (the fixture's own date
    # columns are timestamps; a DATE cast maps to mismatched pandas dtypes)
    trunc = lambda c: F.date_trunc(granularity, c)  # noqa: E731
    firsts = events.groupBy("user_id").agg(F.min("ts").alias("__first_ts"))
    cohorts = firsts.select(
        "user_id", trunc(F.col("__first_ts")).alias("cohort")
    )
    active = events.select(
        "user_id", trunc(F.col("ts")).alias("period")
    ).distinct()
    if granularity == "month":
        offset = F.round(F.months_between("period", "cohort")).cast("int")
    else:
        days = 7 if granularity == "week" else 1
        offset = (F.datediff("period", "cohort") / days).cast("int")
    per = (
        active.join(cohorts, "user_id")
        .groupBy("cohort", offset.alias("period_offset"))
        .agg(F.count("*").alias("active_users"))
    )
    sizes = cohorts.groupBy("cohort").agg(
        F.count("*").alias("cohort_size")
    )
    return per.join(F.broadcast(sizes), "cohort").select(
        "cohort",
        "period_offset",
        "active_users",
        "cohort_size",
        F.expr("(active_users * 10000) div cohort_size")
        .cast("int")
        .alias("retention_bp"),
    )


def cohort_retention_sql(granularity: str = "week") -> str:
    offset = {
        "day": "date_diff('day', cohort, period)",
        "week": "date_diff('day', cohort, period) / 7",
        "month": "date_diff('month', cohort, period)",
    }[granularity]
    return f"""
WITH firsts AS (
  SELECT user_id, date_trunc('{granularity}', min(ts)) AS cohort
  FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, date_trunc('{granularity}', ts) AS period
  FROM events
),
per AS (
  SELECT cohort,
         CAST({offset} AS INT) AS period_offset,
         count(*) AS active_users
  FROM active JOIN firsts USING (user_id)
  GROUP BY 1, 2
),
sizes AS (SELECT cohort, count(*) AS cohort_size FROM firsts GROUP BY 1)
SELECT cohort, period_offset, active_users, cohort_size,
       CAST((active_users * 10000) // cohort_size AS INT) AS retention_bp
FROM per JOIN sizes USING (cohort)
ORDER BY cohort, period_offset
"""


def funnel(
    events: DataFrame,
    steps: list[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered-funnel conversion: per user, does a chain of `steps` events
    exist with strictly increasing timestamps (optionally all within
    `within_seconds` of the user's FIRST step-1 event)?

    Matching is greedy-earliest per step, which is exact for existence:
    if ANY valid chain exists, the chain built from each step's earliest
    admissible occurrence also exists (each greedy prefix finishes
    no later than any other chain's prefix, so it never forecloses a
    continuation). Ties between chains don't matter — the question is
    per-user reachability, not which chain.

    Columns: step_idx (1-based), step, users, conversion_bp
    (``users*10000 div step-1 users`` — integer-exact, oracle-stable).

    Scale shape: one filtered, map-side-combinable min-aggregate per
    step plus one user_id-co-keyed join per step transition (k-1 joins
    for k steps, each input pre-filtered to that step's events at the
    scan). The final frame is k rows; its window is driver-trivial.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    first = (
        events.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("__t"))
        .withColumn("__t0", F.col("__t"))
    )
    reached = [first]
    for step in steps[1:]:
        prev = reached[-1].select("user_id", "__t", "__t0")
        nxt = (
            events.filter(F.col("event_type") == step)
            .select("user_id", "ts")
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col("__t"))
        )
        if within_seconds is not None:
            nxt = nxt.filter(
                F.col("ts")
                <= F.col("__t0")
                + F.expr(f"INTERVAL {int(within_seconds)} SECOND")
            )
        reached.append(
            nxt.groupBy("user_id").agg(
                F.min("ts").alias("__t"), F.min("__t0").alias("__t0")
            )
        )
    parts = [
        df.agg(F.count("*").alias("users")).select(
            F.lit(i + 1).alias("step_idx"),
            F.lit(step).alias("step"),
            F.col("users"),
        )
        for i, (step, df) in enumerate(zip(steps, reached))
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    w = Window.orderBy("step_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return out.select(
        "step_idx",
        "step",
        "users",
        F.expr("users * 10000").cast("long").alias("__n"),
        F.first("users").over(w).alias("__d"),
    ).select(
        "step_idx",
        "step",
        "users",
        F.expr("case when __d = 0 then 0 else __n div __d end")
        .cast("int")
        .alias("conversion_bp"),
    )


def funnel_sql(steps: list[str], within_seconds: int | None = None) -> str:
    ctes, prev = [], None
    for i, step in enumerate(steps):
        name = f"s{i + 1}"
        if i == 0:
            ctes.append(
                f"{name} AS (SELECT user_id, min(ts) AS t, min(ts) AS t0 "
                f"FROM events WHERE event_type = '{step}' GROUP BY 1)"
            )
        else:
            win = (
                ""
                if within_seconds is None
                else (
                    f" AND e.ts <= {prev}.t0 + "
                    f"INTERVAL {int(within_seconds)} SECOND"
                )
            )
            ctes.append(
                f"{name} AS (SELECT e.user_id, min(e.ts) AS t, "
                f"min({prev}.t0) AS t0 "
                f"FROM events e JOIN {prev} ON e.user_id = {prev}.user_id "
                f"WHERE e.event_type = '{step}' AND e.ts > {prev}.t{win} "
                f"GROUP BY 1)"
            )
        prev = name
    unions = " UNION ALL ".join(
        f"SELECT {i + 1} AS step_idx, '{s}' AS step, "
        f"(SELECT count(*) FROM s{i + 1}) AS users"
        for i, s in enumerate(steps)
    )
    return f"""
WITH {", ".join(ctes)},
counts AS ({unions})
SELECT CAST(step_idx AS INT) AS step_idx, step, users,
       CAST(CASE WHEN first_value(users) OVER (ORDER BY step_idx) = 0
                 THEN 0
                 ELSE (users * 10000)
                      // first_value(users) OVER (ORDER BY step_idx)
            END AS INT) AS conversion_bp
FROM counts
ORDER BY step_idx
"""
