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


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_us: str,
    start_us: str,
    end_us: str,
    bin_width_us: int,
) -> DataFrame:
    """Point-in-interval equi-ized range join (Spark's missing built-in —
    a raw `p.ts BETWEEN i.s AND i.e` join plans as BroadcastNestedLoop).

    Each interval is exploded to every time bin of width `bin_width_us` it
    overlaps; each point lands in exactly one bin; the join is then a pure
    EQUI-join on (key, bin) with an exact residual BETWEEN filter —
    hash-partitionable, AQE-skew-splittable, no nested loop anywhere.
    A (point, interval) pair appears exactly once: the pair can only meet
    in the point's own bin.

    Inclusive on both interval endpoints. Time columns are BIGINT epoch
    MICROSECONDS (tz-free integer arithmetic on both engines). Cost:
    shuffle of points + intervals × ceil(len/bin_width); pick
    `bin_width_us` near the typical interval length so intervals explode
    to ~2 bins.
    """
    if bin_width_us <= 0:
        raise ValueError("bin_width_us must be positive")
    overlap = [
        c for c in points.columns if c in intervals.columns and c != key
    ]
    if overlap:
        raise ValueError(f"rename overlapping non-key columns: {overlap}")
    if "__ij_bin" in points.columns or "__ij_bin" in intervals.columns:
        raise ValueError("'__ij_bin' is reserved by interval_join")
    binned_i = intervals.withColumn(
        "__ij_bin",
        F.explode(
            F.sequence(
                F.expr(f"{start_us} div {int(bin_width_us)}"),
                F.expr(f"{end_us} div {int(bin_width_us)}"),
            )
        ),
    )
    binned_p = points.withColumn(
        "__ij_bin", F.expr(f"{point_us} div {int(bin_width_us)}")
    )
    return (
        binned_p.join(binned_i, on=[key, "__ij_bin"], how="inner")
        .filter(
            (F.col(point_us) >= F.col(start_us))
            & (F.col(point_us) <= F.col(end_us))
        )
        .drop("__ij_bin")
    )


ERROR_WINDOW_SEC = 14400  # contract constant (4 h: ~137 windows at sf0.01), shared verbatim with the oracle


def error_window_hits(events: DataFrame) -> DataFrame:
    """Contract query: for every `error` event, the purchases the SAME
    user made within the following ERROR_WINDOW_SEC seconds (inclusive) — an interval
    join of purchase points against per-error windows, aggregated per
    window. Columns: error_id, user_id, n_purchases, cents (exact integer
    cents — no float-sum order sensitivity), first_purchase_id.
    Windows with zero purchases are absent (inner join), same as the SQL
    twin."""
    win_us = ERROR_WINDOW_SEC * 1_000_000
    intervals = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__iw_s"),
        (F.unix_micros(F.col("ts").cast("timestamp")) + F.lit(win_us)).alias("__iw_e"),
    )
    points = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__iw_p"),
        F.round(F.col("value") * 100).cast("long").alias("__iw_cents"),
    )
    pairs = interval_join(
        points,
        intervals,
        key="user_id",
        point_us="__iw_p",
        start_us="__iw_s",
        end_us="__iw_e",
        bin_width_us=win_us,
    )
    return (
        pairs.groupBy("error_id", "user_id")
        .agg(
            F.count("*").cast("long").alias("n_purchases"),
            F.sum("__iw_cents").cast("long").alias("cents"),
            F.min("purchase_id").cast("long").alias("first_purchase_id"),
        )
        .orderBy("error_id")
    )


ERROR_WINDOW_HITS_SQL = f"""
SELECT e.event_id AS error_id, e.user_id,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(CAST(round(p.value * 100, 0) AS BIGINT)) AS BIGINT) AS cents,
       CAST(min(p.event_id) AS BIGINT) AS first_purchase_id
FROM (SELECT * FROM events WHERE event_type = 'error') e
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = e.user_id
 AND epoch_us(p.ts) >= epoch_us(e.ts)
 AND epoch_us(p.ts) <= epoch_us(e.ts) + {ERROR_WINDOW_SEC * 1_000_000}
GROUP BY e.event_id, e.user_id
ORDER BY error_id
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


HIST_BINS = 512


def value_quantiles_hist(events: DataFrame, bins: int = HIST_BINS) -> DataFrame:
    """DETERMINISTIC approximate quantiles — the oracle-checked 100 TB
    swap-in for `value_quantiles`. A fixed-bin histogram-CDF sketch:

      1. per-group min/max/count (algebraic, map-side combinable),
      2. bin every value into `bins` equal-width cells — the histogram is
         ONE combinable shuffle of at most `groups x bins` cells,
         regardless of data size (vs the exact form shuffling every value
         to one reducer per group),
      3. read each quantile off the cumulative histogram with within-bin
         linear interpolation.

    No RNG, no order dependence: the sketch is a pure function of the
    value multiset (counts are exact ints; min/max are exact doubles), so
    the DuckDB twin reproduces it BIT-identically — unlike
    `percentile_approx`, whose t-digest result depends on merge order.
    Error is bounded by one bin width = (max-min)/bins per group
    (tested); the cells are trivially mergeable across partitions/days.
    Columns: event_type, n, p25, p50, p90.
    """
    stats = events.filter(F.col("value").isNotNull()).groupBy("event_type").agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count("value").alias("n"),
    )
    binned = (
        events.filter(F.col("value").isNotNull())
        .select("event_type", "value")
        .join(F.broadcast(stats), "event_type")
        .withColumn(
            "bin",
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.floor(
                        (F.col("value") - F.col("lo"))
                        / (F.col("hi") - F.col("lo"))
                        * bins
                    ),
                )
            )
            .cast("int"),
        )
        .groupBy("event_type", "lo", "hi", "n", "bin")
        .agg(F.count("*").alias("cnt"))
    )
    return _hist_read(binned, bins)


def hist_from_cells(cells: DataFrame, bins: int = HIST_BINS) -> DataFrame:
    """`value_quantiles_hist` computed from a WEIGHTED value multiset —
    rows (event_type, value, cnt) with cnt = how many source rows carry
    that exact value. Bit-identical to the row form: the sketch is a pure
    function of the value multiset, a bin is a function of the value
    alone, and the counts are exact longs either way (sum of cell counts
    == row count; min/max over distinct values == min/max over rows).

    This is the read side of `lake.sketchview.StreamedHistView`: the
    multiset is the smallest DELETE-ALGEBRAIC sufficient statistic for
    the sketch (bin cells alone cannot survive a min/max-widening insert
    or any delete), so a streamed maintainer keeps cells and reads the
    histogram through here. Cost is O(distinct values), never O(rows)."""
    cells = cells.filter(F.col("value").isNotNull())
    stats = cells.groupBy("event_type").agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.sum("cnt").alias("n"),
    )
    binned = (
        cells.select("event_type", "value", "cnt")
        .join(F.broadcast(stats), "event_type")
        .withColumn(
            "bin",
            F.when(F.col("hi") == F.col("lo"), F.lit(0))
            .otherwise(
                F.least(
                    F.lit(bins - 1),
                    F.floor(
                        (F.col("value") - F.col("lo"))
                        / (F.col("hi") - F.col("lo"))
                        * bins
                    ),
                )
            )
            .cast("int"),
        )
        .groupBy("event_type", "lo", "hi", "n", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return _hist_read(binned, bins)


def _hist_read(binned: DataFrame, bins: int) -> DataFrame:
    """Quantile read-off shared by the row and cells forms: cumulative
    histogram + within-bin rank interpolation over a frame of per-bin
    counts (event_type, lo, hi, n, bin, cnt)."""
    from pyspark.sql.window import Window as W

    wcum = (
        W.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = binned.withColumn("cum", F.sum("cnt").over(wcum))

    # Exact percentile interpolates between the values at integer ranks
    # r0=floor(t), r1=ceil(t) of the continuous rank t = q*(n-1)+1. The
    # sketch does the SAME rank interpolation, estimating each integer
    # rank's value inside its own occupied bin (cum - cnt < r <= cum,
    # within-bin uniform) — so each rank estimate errs by < 1 bin width
    # and the convex combination keeps the provable <= width bound even
    # across sparse regions where adjacent occupied bins are far apart
    # (a one-bin estimate of t itself loses that bound exactly there).
    # Every parenthesization is mirrored verbatim in the SQL twin for FP
    # bit-parity.
    def rank_val(r):
        inside = (F.col("cum") >= r) & ((F.col("cum") - F.col("cnt")) < r)
        val = F.col("lo") + ((F.col("hi") - F.col("lo")) / bins) * (
            F.col("bin") + (r - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
        )
        return F.max(F.when(inside, val))

    def t_expr(q: float):
        return F.lit(q) * (F.col("n") - 1) + 1

    aggs = []
    for q, nm in ((0.25, "p25"), (0.5, "p50"), (0.9, "p90")):
        t = t_expr(q)
        aggs.append(rank_val(F.floor(t)).alias(f"__v0_{nm}"))
        aggs.append(rank_val(F.ceil(t)).alias(f"__v1_{nm}"))

    def combine(q: float, nm: str):
        t = t_expr(q)
        v0, v1 = F.col(f"__v0_{nm}"), F.col(f"__v1_{nm}")
        return F.round(
            F.when(F.col("hi") == F.col("lo"), F.col("lo")).otherwise(
                v0 + (t - F.floor(t)) * (v1 - v0)
            ),
            4,
        ).alias(nm)

    return (
        cum.groupBy("event_type", "n", "lo", "hi")
        .agg(*aggs)
        .select(
            "event_type",
            "n",
            combine(0.25, "p25"),
            combine(0.5, "p50"),
            combine(0.9, "p90"),
        )
        .orderBy("event_type")
    )


def _hist_rank_sql(r: str, name: str) -> str:
    """Conditional aggregate estimating the value at integer rank `r`
    (the rank's occupied bin, within-bin uniform). Parenthesization
    mirrors the Spark `rank_val` expression verbatim."""
    return f"""
  max(CASE WHEN cum >= {r} AND (cum - cnt) < {r} THEN
    lo + ((hi - lo) / {HIST_BINS}) * (bin + ({r} - (cum - cnt)) / cnt)
  END) AS {name}"""


def _hist_q_sql(q: float, name: str) -> tuple[str, str]:
    """(rank-aggregate clauses, final combine clause) for one quantile.
    The q literal is cast to DOUBLE — DuckDB would otherwise evaluate
    0.25*(n-1) in exact DECIMAL arithmetic while Spark uses doubles, a
    boundary-comparison hazard."""
    t = f"(CAST({q} AS DOUBLE)*(n-1)+1)"
    ranks = (
        _hist_rank_sql(f"floor({t})", f"v0_{name}")
        + ","
        + _hist_rank_sql(f"ceil({t})", f"v1_{name}")
    )
    combine = f"""
  round(CASE WHEN hi = lo THEN lo ELSE
    v0_{name} + ({t} - floor({t})) * (v1_{name} - v0_{name})
  END, 4) AS {name}"""
    return ranks, combine


_Q_PARTS = [_hist_q_sql(0.25, "p25"), _hist_q_sql(0.5, "p50"), _hist_q_sql(0.9, "p90")]


def value_quantiles_hist_sql(relation: str = "events") -> str:
    """The DuckDB twin of `value_quantiles_hist`, parameterized over the
    input relation so callers can point it at a CTE (e.g. a replayed CDC
    live state). Returns the CTE list + final SELECT WITHOUT the leading
    `WITH`, so a caller can prepend its own CTEs:
    ``f"WITH live AS (...), {value_quantiles_hist_sql('live')}"``."""
    return f"""
stats AS (
  SELECT event_type, min(value) AS lo, max(value) AS hi,
         count(value) AS n
  FROM {relation} WHERE value IS NOT NULL GROUP BY event_type
),
counts AS (
  SELECT e.event_type, s.lo, s.hi, s.n,
         CASE WHEN s.hi = s.lo THEN 0
              ELSE CAST(least({HIST_BINS - 1},
                   floor((e.value - s.lo) / (s.hi - s.lo) * {HIST_BINS}))
                   AS INT)
         END AS bin,
         count(*) AS cnt
  FROM {relation} e JOIN stats s USING (event_type)
  WHERE e.value IS NOT NULL
  GROUP BY e.event_type, s.lo, s.hi, s.n, 5
),
cum AS (
  SELECT *, sum(cnt) OVER (
    PARTITION BY event_type ORDER BY bin
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS cum
  FROM counts
),
ranked AS (
  SELECT event_type, n, lo, hi,{",".join(p[0] for p in _Q_PARTS)}
  FROM cum
  GROUP BY event_type, n, lo, hi
)
SELECT event_type, n,{",".join(p[1] for p in _Q_PARTS)}
FROM ranked
ORDER BY event_type"""


VALUE_QUANTILES_HIST_SQL = "WITH " + value_quantiles_hist_sql("events")
