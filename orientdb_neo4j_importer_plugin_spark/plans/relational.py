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


def q8_market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    target_nation: str = "NATION_3",
) -> DataFrame:
    """TPC-H Q8 shape (adapted): supplier-nation share of ECONOMY-part
    revenue sold to AMERICA customers, per order year. Numerator and
    denominator are emitted separately (the q14 convention: no in-query
    division of unrounded double sums, which risks 4dp-boundary drift
    between engines). All dimension hops broadcast.
    Columns: o_year, target_volume, total_volume."""
    cust_am = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            customer.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_n = supplier.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"), "n_name")),
        supplier.s_nationkey == F.col("s_nk"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        lineitem.select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(
            F.broadcast(part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_am), F.col("o_custkey") == cust_am.c_custkey)
        .join(F.broadcast(supp_n), F.col("l_suppkey") == supp_n.s_suppkey)
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == target_nation, vol).otherwise(0.0)), 4
            ).alias("target_volume"),
            F.round(F.sum(vol), 4).alias("total_volume"),
        )
        .orderBy("o_year")
    )


def q8_sql(target_nation: str = "NATION_3") -> str:
    return f"""
SELECT year(o_orderdate) AS o_year,
       round(sum(CASE WHEN n2.n_name = '{target_nation}'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 4) AS target_volume,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_volume
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
GROUP BY o_year
ORDER BY o_year
"""


def q13_order_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13: distribution of order counts per customer — LEFT OUTER
    join (customers with zero orders count at c_count=0) then a second
    aggregation over the counts. Columns: c_count, custdist."""
    per_cust = (
        customer.select("c_custkey")
        .join(
            orders.select("o_custkey", "o_orderkey"),
            customer.c_custkey == orders.o_custkey,
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """TPC-H Q15: revenue view + scalar max subquery — the supplier(s)
    with the highest shipped revenue in a quarter.
    Columns: s_suppkey, s_name, total_rev."""
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("total_rev")
        )
    )
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.join(F.broadcast(top), rev.total_rev == F.col("max_rev"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              rev.l_suppkey == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
ORDER BY s_suppkey
"""


def q17_small_quantity_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q17 (adapted): revenue from orders of less than 20% of a
    part's average quantity — the correlated scalar-avg subquery expressed
    as an aggregate + broadcast join back (no correlated rescan).
    Columns: avg_yearly."""
    li = lineitem.select("l_partkey", "l_quantity", "l_extendedprice").join(
        F.broadcast(
            part.filter(F.col("p_brand") == "Brand#3").select("p_partkey")
        ),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    avg_qty = li.groupBy("p_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    ).withColumnRenamed("p_partkey", "cut_partkey")
    return (
        li.join(F.broadcast(avg_qty), li.l_partkey == F.col("cut_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


Q17_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""
