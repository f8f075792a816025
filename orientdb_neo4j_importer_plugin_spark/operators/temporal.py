"""Temporal operators: as-of join and exact quantiles.

The as-of join is the canonical operator Spark lacks as a built-in (the
mandate's "operator the reference/engine has no analogue for" class): for
each left row, attach the latest right row with right.ts <= left.ts for the
same key. A naive implementation is a range join (quadratic blowup per
key); the Spark-first form here is the UNION + WINDOW trick:

    tag right rows, union with left, ONE window over (key, ts) carrying
    ``last(right_value, ignoreNulls=True)``, keep left rows.

One shuffle on the key, map-side sortable, no range explosion — at 100 TB
this is a single exchange of left+right instead of a per-key cartesian band.
The DuckDB oracle uses its NATIVE ``ASOF LEFT JOIN`` — a genuinely
independent evaluation of the same semantics.

Tie semantics (matching DuckDB ASOF, which matches on >=): a right row at
exactly left.ts wins; the right side is pre-deduped per (key, ts) with
``max(value)`` so equal-ts ties are deterministic in BOTH engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_value: str,
    out_name: str | None = None,
) -> DataFrame:
    """Generic backward as-of join: left columns + the latest `right_value`
    at or before each left row's `ts` for the same `key` (null if none).

    `right` must be unique per (key, ts) — pre-aggregate if not.
    """
    out_name = out_name or f"asof_{right_value}"
    lcols = left.columns
    tagged_r = right.select(
        F.col(key),
        F.col(ts),
        F.col(right_value).alias("__rv"),
        F.lit(1).alias("__is_r"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c not in (key, ts)],
    )
    tagged_l = left.select(
        F.col(key),
        F.col(ts),
        F.lit(None).cast(dict(right.dtypes)[right_value]).alias("__rv"),
        F.lit(0).alias("__is_r"),
        *[F.col(c) for c in lcols if c not in (key, ts)],
    )
    # right rows sort BEFORE left rows at equal ts (is_r desc) -> a right row
    # at exactly left.ts is visible to it, matching ASOF's >= match
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__is_r").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged_r.unionByName(tagged_l)
        .withColumn("__asof", F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__is_r") == 0)
        .select(*lcols, F.col("__asof").alias(out_name))
    )


def purchase_asof_click(events: DataFrame) -> DataFrame:
    """Contract query: each purchase event joined (as-of, backward) to the
    same user's latest click value at or before the purchase time.
    Columns: event_id, user_id, ts, value, last_click_value."""
    left = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    return (
        asof_join(
            left, right, key="user_id", ts="ts",
            right_value="click_value", out_name="last_click_value",
        )
        .select("event_id", "user_id", "ts", "value", "last_click_value")
        .orderBy("event_id")
    )


PURCHASE_ASOF_CLICK_SQL = """
WITH r AS (
  SELECT user_id, ts, max(value) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT l.event_id, l.user_id, l.ts, l.value, r.click_value AS last_click_value
FROM (SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase') l
ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY event_id
"""


def value_quantiles(events: DataFrame) -> DataFrame:
    """Exact per-type value quantiles (linear interpolation — Spark
    `percentile` == DuckDB `quantile_cont`). Exact quantiles shuffle the
    group's values to one reducer per group; at 100 TB swap in
    `percentile_approx` (t-digest sketch, map-side combinable) and keep
    this form as the small-data oracle.
    Columns: event_type, n, p25, p50, p90."""
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.expr("percentile(value, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        )
        .orderBy("event_type")
    )


VALUE_QUANTILES_SQL = """
SELECT event_type, count(*) AS n,
       round(quantile_cont(value, 0.25), 4) AS p25,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.9), 4) AS p90
FROM events
GROUP BY event_type
ORDER BY event_type
"""
