"""Relational breadth beyond the reference's surface: rollup aggregation,
set operators, distinct aggregation, and the agg-then-join-back (argmin)
shape — mandate breadth (the reference has none of these, SURVEY §2.4/§2.6),
each with an exact DuckDB oracle twin.

Scale notes: rollup is one shuffle with map-side partials per grouping set
(Spark plans Expand + hash agg); the set ops are distinct aggregations
(hash shuffles on the key); count(DISTINCT) plans Expand + two-phase agg;
the argmin join-back broadcasts the tiny min-per-part side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALL = "ALL"  # rollup total marker: null group keys surface as a sentinel so
# both engines emit identical values (and no engine-specific null ordering)


def rollup_returns(lineitem: DataFrame) -> DataFrame:
    """Quantity/count by (returnflag, linestatus) with rollup subtotals and
    grand total. Columns: l_returnflag, l_linestatus, n_rows, sum_qty."""
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit(ALL)).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit(ALL)).alias("l_linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


ROLLUP_RETURNS_SQL = f"""
SELECT coalesce(l_returnflag, '{ALL}') AS l_returnflag,
       coalesce(l_linestatus, '{ALL}') AS l_linestatus,
       count(*) AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag, l_linestatus
"""


def setop_customer_segments(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Set-operator suite in one query: (BUILDING customers INTERSECT 1996+
    orderers) UNION (negative-balance customers EXCEPT any orderer).
    Column: custkey."""
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    orderers_96 = orders.filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("custkey"))
    negative = customer.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("custkey")
    )
    any_orderer = orders.select(F.col("o_custkey").alias("custkey"))
    # intersect/subtract are SQL INTERSECT/EXCEPT (distinct); UNION distinct
    return (
        building.intersect(orderers_96)
        .union(negative.subtract(any_orderer))
        .distinct()
    )


SETOP_CUSTOMER_SEGMENTS_SQL = """
(SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
 INTERSECT
 SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01')
UNION
(SELECT c_custkey FROM customer WHERE c_acctbal < 0
 EXCEPT
 SELECT o_custkey FROM orders)
ORDER BY custkey
"""


def q10_returned_items(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame
) -> DataFrame:
    """TPC-H Q10 (adapted): revenue lost to returned items per customer.
    Broadcast nation into customer, broadcast the customer dim into the
    orders<->lineitem fact join; top-20 via TakeOrderedAndProject.
    Columns: c_custkey, c_name, n_name, revenue."""
    cust = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select("c_custkey", "c_name", "n_name")
    ord_ = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(ord_, li.l_orderkey == ord_.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q16_supplier_cnt(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q16 (adapted: the fixture has no partsupp, so lineitem is the
    part<->supplier link): distinct-supplier counts per (brand, size).
    count(DISTINCT) plans an Expand + two-phase aggregate — partials still
    combine map-side. Columns: p_brand, p_size, supplier_cnt."""
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(
            F.broadcast(
                part.filter(
                    (F.col("p_size") <= 25) & (F.col("p_type") != "PROMO")
                ).select("p_partkey", "p_brand", "p_size")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= 25 AND p_type <> 'PROMO'
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
"""


def q2_min_cost_supplier(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q2 shape (adapted): for each small part, the cheapest EUROPE
    supplier — the correlated-min subquery expressed as an algebraic argmin
    (min of (price, suppkey, name) structs: one combinable aggregate, no
    window sort, no correlated rescan).
    Columns: p_partkey, p_brand, min_price, s_suppkey, s_name."""
    eu_supp = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            supplier.s_nationkey == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    offers = (
        lineitem.select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(F.broadcast(eu_supp), F.col("l_suppkey") == eu_supp.s_suppkey)
        .join(
            F.broadcast(
                part.filter(F.col("p_size") <= 5).select("p_partkey", "p_brand")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    w = F.min(
        F.struct(
            F.col("l_extendedprice"), F.col("s_suppkey"), F.col("s_name")
        )
    ).alias("__w")
    return (
        offers.groupBy("p_partkey", "p_brand")
        .agg(w)
        .select(
            "p_partkey",
            "p_brand",
            F.col("__w.l_extendedprice").alias("min_price"),
            F.col("__w.s_suppkey").alias("s_suppkey"),
            F.col("__w.s_name").alias("s_name"),
        )
    )


Q2_SQL = """
WITH eu_supp AS (
  SELECT s_suppkey, s_name
  FROM supplier, nation, region
  WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
    AND r_name = 'EUROPE'
),
offers AS (
  SELECT p_partkey, p_brand, l_extendedprice, s_suppkey, s_name
  FROM lineitem
  JOIN eu_supp ON l_suppkey = s_suppkey
  JOIN part ON l_partkey = p_partkey
  WHERE p_size <= 5
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY p_partkey ORDER BY l_extendedprice, s_suppkey
  ) AS rn
  FROM offers
)
SELECT p_partkey, p_brand, l_extendedprice AS min_price, s_suppkey, s_name
FROM ranked WHERE rn = 1
ORDER BY p_partkey
"""
