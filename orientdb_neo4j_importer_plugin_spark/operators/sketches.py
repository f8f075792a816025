"""KMV (k-minimum-values) cardinality sketches — approximate distinct
counts and set-overlap estimates that are DETERMINISTIC and bit-identical
across engines.

Why not HyperLogLog? Spark's `approx_count_distinct` (HLL) is cheaper on
the wire (a fixed sketch per group) but its estimate is engine-internal —
no independent oracle can reproduce it. KMV built on the portable `h64`
hash (functions/hashes.py) gives the same mergeable-sketch architecture
with a value-for-value DuckDB twin: both engines keep the k smallest
distinct 60-bit hashes and evaluate the same floor'd estimator, so the
driver's hash-compare gate applies to an *approximate* operator. The
reference's deep-equality oracle discipline (``OFunctionsHandler.java:
65-109``) extended to sketches.

Estimator: with hashes uniform on [0, 2^60) and h_k the k-th smallest
distinct hash, est = floor((k-1) * 2^60 / (h_k + 1)); exact count when a
group has fewer than k distinct values (the sketch IS the set). The
division is one IEEE-754 double op — exactly specified, so both engines
produce the same integer.

Scale shape: `distinct()` on (group, hash) partial-aggregates map-side, so
the shuffle carries per-partition-distinct 8-byte hashes, not rows; the
per-group rank then keeps k per group. The per-group sort over distinct
hashes is the honest cost vs HLL (which shuffles a fixed sketch) — at
100 TB use `approx_count_distinct` when cross-engine reproducibility
doesn't matter, KMV when it must be auditable.

Set overlap (theta-sketch style): the k smallest of the UNION of two
sketches is itself the union's KMV sketch; the fraction of its members
present in both sides estimates the Jaccard similarity, and
intersection ≈ jaccard * union. All counting is exact integer arithmetic;
ratios are emitted in basis points (floor) for bit-stable comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashes import (
    h64,
    h64_sql,
    minhash_apply,
    minhash_apply_sql,
    minhash_params,
)

DEFAULT_K = 16
CMS_DEPTH = 4
CMS_WIDTH = 64
_H_SPACE = float(2**60)  # hash domain size as an exact double


def _est_expr(n_col: Column, hk_col: Column, k: int) -> Column:
    """floor((k-1)*2^60 / (h_k+1)) when the sketch saturated, exact n below."""
    numer = float(k - 1) * _H_SPACE  # exact double, mirrored verbatim in SQL
    return F.when(n_col < k, n_col).otherwise(
        F.floor(F.lit(numer) / (hk_col.cast("double") + F.lit(1.0))).cast("long")
    )


def _est_sql(n_expr: str, hk_expr: str, k: int) -> str:
    numer = repr(float(k - 1) * _H_SPACE)
    return (
        f"CASE WHEN {n_expr} < {k} THEN {n_expr} "
        f"ELSE CAST(floor({numer} / (CAST({hk_expr} AS DOUBLE) + 1.0)) AS BIGINT) END"
    )


def _sketch(df: DataFrame, group_col: str, value: Column, k: int) -> DataFrame:
    """Per-group KMV sketch rows: (group, h, rn) with rn <= k over distinct
    hashes ascending. The downstream aggregate only needs count + max."""
    hashes = df.select(F.col(group_col), h64(value).alias("h")).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    return hashes.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def kmv_distinct_by(
    df: DataFrame, group_col: str, value: Column, k: int = DEFAULT_K
) -> DataFrame:
    """Approximate distinct-count of `value` per group.

    Returns (group_col, n_kept, kth_hash, distinct_est) — n_kept/kth_hash
    expose the sketch so estimates are auditable.
    """
    sk = _sketch(df, group_col, value, k)
    agg = sk.groupBy(group_col).agg(
        F.count("*").alias("n_kept"), F.max("h").alias("kth_hash")
    )
    return agg.select(
        group_col,
        "n_kept",
        "kth_hash",
        _est_expr(F.col("n_kept"), F.col("kth_hash"), k).alias("distinct_est"),
    ).orderBy(group_col)


def kmv_distinct_by_sql(
    table: str, group_col: str, value_expr: str, k: int = DEFAULT_K
) -> str:
    """DuckDB twin of ``kmv_distinct_by`` (same hash, same estimator)."""
    return f"""
WITH hashes AS (
  SELECT DISTINCT {group_col}, {h64_sql(value_expr)} AS h FROM {table}
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY {group_col} ORDER BY h) AS rn
  FROM hashes
),
sk AS (
  SELECT {group_col}, CAST(count(*) AS BIGINT) AS n_kept, max(h) AS kth_hash
  FROM ranked WHERE rn <= {k} GROUP BY {group_col}
)
SELECT {group_col}, n_kept, kth_hash,
       {_est_sql("n_kept", "kth_hash", k)} AS distinct_est
FROM sk ORDER BY {group_col}
"""


def kmv_overlap(
    df: DataFrame,
    group_col: str,
    value: Column,
    group_a: str,
    group_b: str,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Theta-style overlap estimate between the `value` sets of two groups.

    One row: (a_est, b_est, union_est, inter_est, jaccard_bp). The union
    sketch is the k smallest distinct hashes of A ∪ B; members present on
    both sides estimate the Jaccard numerator. jaccard_bp is basis points
    (floor), inter_est = floor(union_est * inter_members / union_members).

    Plan shape: everything folds into ONE aggregation over the <=2k-row
    hash-membership frame — side sketches are recovered from the in_a/in_b
    flags (sum(in_a) = |SA|, max(h where in_a) = SA's theta), so there are
    no joins at all (the contract-wide plan gate forbids cartesian/BNLJ
    even for 1-row combines).
    """
    filtered = df.filter(F.col(group_col).isin(group_a, group_b))
    sk = _sketch(filtered, group_col, value, k)
    # side membership per hash (each side's sketch is distinct already)
    sides = sk.groupBy("h").agg(
        F.max(F.when(F.col(group_col) == group_a, 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col(group_col) == group_b, 1).otherwise(0)).alias("in_b"),
    )
    w = Window.orderBy("h")  # union of two k-sketches: <= 2k rows, tiny
    ranked = sides.withColumn("rn", F.row_number().over(w))
    in_union = F.col("rn") <= k
    agg = ranked.agg(
        F.sum("in_a").cast("long").alias("n_a"),
        F.max(F.when(F.col("in_a") == 1, F.col("h"))).alias("hk_a"),
        F.sum("in_b").cast("long").alias("n_b"),
        F.max(F.when(F.col("in_b") == 1, F.col("h"))).alias("hk_b"),
        F.sum(F.when(in_union, 1).otherwise(0)).cast("long").alias("u_n"),
        F.max(F.when(in_union, F.col("h"))).alias("u_hk"),
        F.sum(F.when(in_union, F.col("in_a") * F.col("in_b")).otherwise(0))
        .cast("long")
        .alias("inter_members"),
    )
    return agg.select(
        _est_expr(F.col("n_a"), F.col("hk_a"), k).alias("a_est"),
        _est_expr(F.col("n_b"), F.col("hk_b"), k).alias("b_est"),
        _est_expr(F.col("u_n"), F.col("u_hk"), k).alias("union_est"),
        F.floor(
            _est_expr(F.col("u_n"), F.col("u_hk"), k).cast("double")
            * F.col("inter_members")
            / F.col("u_n")
        )
        .cast("long")
        .alias("inter_est"),
        F.floor(F.lit(10000.0) * F.col("inter_members") / F.col("u_n"))
        .cast("long")
        .alias("jaccard_bp"),
    )


def kmv_overlap_sql(
    table: str,
    group_col: str,
    value_expr: str,
    group_a: str,
    group_b: str,
    k: int = DEFAULT_K,
) -> str:
    """DuckDB twin of ``kmv_overlap``."""
    return f"""
WITH hashes AS (
  SELECT DISTINCT {group_col}, {h64_sql(value_expr)} AS h FROM {table}
  WHERE {group_col} IN ('{group_a}', '{group_b}')
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY {group_col} ORDER BY h) AS rn
  FROM hashes
),
sk AS (SELECT * FROM ranked WHERE rn <= {k}),
sides AS (
  SELECT h,
         max(CASE WHEN {group_col} = '{group_a}' THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN {group_col} = '{group_b}' THEN 1 ELSE 0 END) AS in_b
  FROM sk GROUP BY h
),
ranked_u AS (
  SELECT *, row_number() OVER (ORDER BY h) AS rn FROM sides
),
agg AS (
  SELECT CAST(sum(in_a) AS BIGINT) AS n_a,
         max(CASE WHEN in_a = 1 THEN h END) AS hk_a,
         CAST(sum(in_b) AS BIGINT) AS n_b,
         max(CASE WHEN in_b = 1 THEN h END) AS hk_b,
         CAST(sum(CASE WHEN rn <= {k} THEN 1 ELSE 0 END) AS BIGINT) AS u_n,
         max(CASE WHEN rn <= {k} THEN h END) AS u_hk,
         CAST(sum(CASE WHEN rn <= {k} THEN in_a * in_b ELSE 0 END) AS BIGINT)
           AS inter_members
  FROM ranked_u
)
SELECT {_est_sql("n_a", "hk_a", k)} AS a_est,
       {_est_sql("n_b", "hk_b", k)} AS b_est,
       {_est_sql("u_n", "u_hk", k)} AS union_est,
       CAST(floor(CAST({_est_sql("u_n", "u_hk", k)} AS DOUBLE)
                  * inter_members / u_n) AS BIGINT) AS inter_est,
       CAST(floor(10000.0 * inter_members / u_n) AS BIGINT) AS jaccard_bp
FROM agg
"""


# -- count-min sketch (frequency estimation) ---------------------------------
# Same discipline as KMV: the hash family is the shared Carter-Wegman one
# (functions/hashes.minhash_params), so the sketch cells AND the estimates
# are bit-identical in DuckDB. Overestimates only (classic CMS guarantee);
# with depth=4, width=64 the expected overcount is ~2n/width per row,
# min'd over 4 independent rows.
#
# Scale shape: building the sketch is ONE map-side-combinable shuffle over
# (row, cell) pairs — the sketch is depth*width cells total regardless of
# input size, and cells are mergeable across partitions/feeds by addition
# (partial aggregation IS the merge). Estimation joins the tiny cell table
# (broadcast) against the probe set.


def _cms_cell(h: Column, a: int, b: int, width: int) -> Column:
    return minhash_apply(h, a, b) % width


def _cms_cell_sql(h_expr: str, a: int, b: int, width: int) -> str:
    return f"({minhash_apply_sql(h_expr, a, b)}) % {width}"


# internal column names prefixed so arbitrary probe schemas can't collide
_CMS_R, _CMS_C, _CMS_CNT, _CMS_CELL = "__cms_r", "__cms_c", "__cms_cnt", "__cms_cell"


def _cms_addresses(value: Column, depth: int, width: int) -> Column:
    """The depth (row, cell) addresses of one value — the ONE definition
    shared by build and probe sides (diverging addressing would zero every
    estimate)."""
    h = h64(value)
    return F.array(
        *[
            F.struct(
                F.lit(i).alias(_CMS_R), _cms_cell(h, a, b, width).alias(_CMS_C)
            )
            for i, (a, b) in enumerate(minhash_params(depth))
        ]
    )


def cms_build(
    df: DataFrame,
    value: Column,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min sketch cells of `value`'s frequency distribution:
    (r, c, cnt) with depth*width rows. One explode + one grouped sum."""
    cells = _cms_addresses(value, depth, width)
    return (
        df.select(F.explode(cells).alias(_CMS_CELL))
        .groupBy(
            F.col(f"{_CMS_CELL}.{_CMS_R}").alias("r"),
            F.col(f"{_CMS_CELL}.{_CMS_C}").alias("c"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    df: DataFrame,
    value: Column,
    probes: DataFrame,
    probe_value: Column,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Estimated frequency of each probe row's value: min over the sketch
    rows of the addressed cell. Returns probes' columns + cms_est (0 for a
    value hashing to never-written cells). The sketch side is tiny and
    broadcast; probes can be arbitrarily large."""
    return cms_estimate_from_cells(
        cms_build(df, value, depth, width), probes, probe_value, depth, width
    )


def cms_estimate_from_cells(
    cells: DataFrame,
    probes: DataFrame,
    probe_value: Column,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """`cms_estimate`'s probe side over PRE-BUILT sketch cells (r, c, cnt)
    — the read path of `lake.sketchview.StreamedCmsView`, whose cells are
    maintained incrementally instead of recomputed per query. Counter
    cells are exact longs, so estimates from maintained cells are
    bit-identical to a fresh `cms_build` over the same rows."""
    sketch = cells.select(
        F.col("r").alias(_CMS_R),
        F.col("c").alias(_CMS_C),
        F.col("cnt").alias(_CMS_CNT),
    )
    addressed = probes.select(
        "*",
        F.explode(_cms_addresses(probe_value, depth, width)).alias(_CMS_CELL),
    ).select("*", f"{_CMS_CELL}.{_CMS_R}", f"{_CMS_CELL}.{_CMS_C}")
    probe_cols = list(probes.columns)
    joined = addressed.join(
        F.broadcast(sketch), on=[_CMS_R, _CMS_C], how="left"
    )
    return (
        joined.groupBy(*probe_cols)
        .agg(
            F.min(F.coalesce(F.col(_CMS_CNT), F.lit(0)))
            .cast("long")
            .alias("cms_est")
        )
        .orderBy(*probe_cols)
    )


def cms_estimate_sql(
    table: str,
    value_expr: str,
    probes_sql: str,
    probe_cols: list[str],
    probe_value_expr: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    """DuckDB twin of ``cms_estimate``. `probes_sql` selects the probe rows
    (columns = `probe_cols`); `probe_value_expr` hashes a probe row's value
    exactly as the Spark side does."""
    params = minhash_params(depth)
    cols = ", ".join(probe_cols)
    # internal names prefixed like the Spark side: a probe column named
    # r/c/cnt must not collide with the sketch plumbing (an unprefixed
    # duplicate silently joined on the wrong cell index — caught live)
    build_rows = "\nUNION ALL\n".join(
        f"SELECT {i} AS __cms_r, {_cms_cell_sql('h', a, b, width)} AS __cms_c "
        f"FROM hashed"
        for i, (a, b) in enumerate(params)
    )
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT {cols}, {i} AS __cms_r, "
        f"{_cms_cell_sql('__cms_ph', a, b, width)} AS __cms_c FROM probes_h"
        for i, (a, b) in enumerate(params)
    )
    return f"""
WITH hashed AS (
  SELECT {h64_sql(value_expr)} AS h FROM {table}
),
cells AS (
  SELECT __cms_r, __cms_c, CAST(count(*) AS BIGINT) AS __cms_cnt
  FROM ({build_rows}) GROUP BY __cms_r, __cms_c
),
probes AS ({probes_sql}),
probes_h AS (
  SELECT *, {h64_sql(probe_value_expr)} AS __cms_ph FROM probes
),
addressed AS ({probe_rows}),
est AS (
  SELECT {cols}, coalesce(cells.__cms_cnt, 0) AS __cms_cell_cnt
  FROM addressed LEFT JOIN cells USING (__cms_r, __cms_c)
)
SELECT {cols}, CAST(min(__cms_cell_cnt) AS BIGINT) AS cms_est
FROM est
GROUP BY {cols}
ORDER BY {cols}
"""
