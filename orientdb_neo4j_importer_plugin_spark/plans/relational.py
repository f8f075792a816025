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


def cube_ship_years(lineitem: DataFrame) -> DataFrame:
    """Quantity/count over EVERY subset of (ship year, returnflag) — the full
    cube (4 grouping sets in one shuffle with map-side partials; Catalyst
    expands the sets, Tungsten aggregates each partial in the same exchange).
    Columns: ship_year, l_returnflag, n_rows, sum_qty."""
    return (
        lineitem.withColumn(
            "ship_year", F.year("l_shipdate").cast("string")
        )
        .cube("ship_year", "l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("ship_year", F.lit(ALL)).alias("ship_year"),
            F.coalesce("l_returnflag", F.lit(ALL)).alias("l_returnflag"),
            "n_rows",
            "sum_qty",
        )
    )


CUBE_SHIP_YEARS_SQL = f"""
SELECT coalesce(CAST(year(l_shipdate) AS VARCHAR), '{ALL}') AS ship_year,
       coalesce(l_returnflag, '{ALL}') AS l_returnflag,
       count(*) AS n_rows,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (year(l_shipdate), l_returnflag)
ORDER BY ship_year, l_returnflag
"""


def gsets_order_mix(orders: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS — two independent one-column breakdowns
    ((o_orderpriority), (o_orderstatus)) computed in ONE pass over orders
    instead of two scans + union. Columns: o_orderpriority, o_orderstatus,
    n_orders, sum_total."""
    return (
        orders.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"]],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit(ALL)).alias("o_orderpriority"),
            F.coalesce("o_orderstatus", F.lit(ALL)).alias("o_orderstatus"),
            "n_orders",
            "sum_total",
        )
    )


GSETS_ORDER_MIX_SQL = f"""
SELECT coalesce(o_orderpriority, '{ALL}') AS o_orderpriority,
       coalesce(o_orderstatus, '{ALL}') AS o_orderstatus,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS sum_total
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
ORDER BY o_orderpriority, o_orderstatus
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


def q9_product_type_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q9 shape (adapted — fixtures have no partsupp, so supply cost
    is the deterministic proxy 0.6 * p_retailprice): profit by supplier
    nation and order year for '%bolt%' parts. Part and supplier-nation
    dims broadcast; the only fact shuffle is lineitem<->orders.
    Columns: n_name, o_year, sum_profit."""
    p = part.filter(F.col("p_name").like("%bolt%")).select(
        "p_partkey", "p_retailprice"
    )
    supp_n = supplier.join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("s_nk"), "n_name")),
        supplier.s_nationkey == F.col("s_nk"),
    ).select("s_suppkey", "n_name")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        lineitem.select(
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_extendedprice", "l_discount", "l_quantity",
        )
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_n), F.col("l_suppkey") == supp_n.s_suppkey)
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount), 4).alias("sum_profit"))
        .orderBy("n_name", F.desc("o_year"))
    )


Q9_SQL = """
SELECT n_name, year(o_orderdate) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity), 4) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%bolt%'
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, o_year
ORDER BY n_name, o_year DESC
"""


def q11_important_parts(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    fraction: float = 0.001,
) -> DataFrame:
    """TPC-H Q11 shape (adapted — shipped value from lineitem stands in for
    partsupp stock value): parts whose shipped value from EUROPE suppliers
    exceeds `fraction` of the region's total. The global total is a one-row
    aggregate broadcast back over the per-part aggregate (no second scan
    of the grouped data, no correlated rescan).
    Columns: l_partkey, part_value."""
    supp7 = supplier.join(
        F.broadcast(
            nation.join(
                F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
                nation.n_regionkey == region.r_regionkey,
            ).select("n_nationkey")
        ),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey")
    val = (
        lineitem.select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(F.broadcast(supp7), F.col("l_suppkey") == supp7.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("raw_value"))
    )
    total = val.agg(F.sum("raw_value").alias("total_value"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("raw_value") > F.col("total_value") * fraction)
        .select(
            "l_partkey", F.round("raw_value", 4).alias("part_value")
        )
        .orderBy(F.desc("part_value"), "l_partkey")
    )


def q11_sql(fraction: float = 0.001) -> str:
    return f"""
WITH val AS (
  SELECT l_partkey, sum(l_extendedprice) AS raw_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
  GROUP BY l_partkey
)
SELECT l_partkey, round(raw_value, 4) AS part_value
FROM val
WHERE raw_value > (SELECT sum(raw_value) FROM val) * {fraction}
ORDER BY part_value DESC, l_partkey
"""


def q20_promo_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    min_qty: float = 500.0,
) -> DataFrame:
    """TPC-H Q20 shape (adapted): suppliers who shipped more than `min_qty`
    units of PROMO parts during 1996 — the IN-subquery-on-an-aggregate
    expressed as grouped agg -> left-semi join into the supplier dim.
    Columns: s_suppkey, s_name."""
    promo = part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    qualified = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > min_qty)
        .select("l_suppkey")
    )
    return (
        supplier.join(
            qualified, supplier.s_suppkey == F.col("l_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q20_sql(min_qty: float = 500.0) -> str:
    return f"""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
  HAVING sum(l_quantity) > {min_qty}
)
ORDER BY s_suppkey
"""


def q21_waiting_suppliers(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    late_days: int = 90,
) -> DataFrame:
    """TPC-H Q21 shape (adapted — fixtures lack commit/receipt dates, so
    "late" is l_shipdate > o_orderdate + late_days): suppliers who were the
    SOLE late supplier on a multi-supplier finished order. EXISTS -> left
    semi join (another supplier on the order), NOT EXISTS -> left anti join
    (another LATE supplier on the order); both non-equi conditions ride the
    orderkey equi-join. Top 20. Columns: s_name, numwait."""
    f_orders = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(f_orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    other = lineitem.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    other_late = late.select(
        F.col("l_orderkey").alias("o3_orderkey"),
        F.col("l_suppkey").alias("o3_suppkey"),
    )
    sole_late = (
        late.join(
            other,
            (late.l_orderkey == other.o2_orderkey)
            & (late.l_suppkey != other.o2_suppkey),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == other_late.o3_orderkey)
            & (F.col("l_suppkey") != other_late.o3_suppkey),
            "left_anti",
        )
    )
    return (
        sole_late.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            sole_late.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


def q21_sql(late_days: int = 90) -> str:
    return f"""
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL {late_days} DAY
)
SELECT s_name, count(*) AS numwait
FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q22_global_sales_opportunity(
    customer: DataFrame, orders: DataFrame, cutoff: str = "2000-06-01"
) -> DataFrame:
    """TPC-H Q22 shape (adapted — cntrycode := c_nationkey % 5 instead of
    phone substring, and "never ordered" means no order since `cutoff`
    because every fixture customer has SOME order): count + balance of
    above-average-balance customers in codes (0,1,2) with no recent order.
    Scalar avg broadcast back; NOT EXISTS -> left anti join on the orders
    key. Columns: cntrycode, numcust, totacctbal."""
    base = customer.filter(
        (F.col("c_nationkey") % 5).isin(0, 1, 2) & (F.col("c_acctbal") > 0)
    ).select("c_custkey", "c_acctbal", (F.col("c_nationkey") % 5).alias("cntrycode"))
    avg_bal = base.agg(F.avg("c_acctbal").alias("avg_bal"))
    return (
        base.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(
                F.col("o_orderdate") >= F.lit(cutoff).cast("timestamp")
            ).select(F.col("o_custkey")),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def q22_sql(cutoff: str = "2000-06-01") -> str:
    return f"""
WITH base AS (
  SELECT c_custkey, c_acctbal, c_nationkey % 5 AS cntrycode
  FROM customer
  WHERE c_nationkey % 5 IN (0, 1, 2) AND c_acctbal > 0
)
SELECT cntrycode, count(*) AS numcust, round(sum(c_acctbal), 4) AS totacctbal
FROM base
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM base)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '{cutoff}'
  )
GROUP BY cntrycode
ORDER BY cntrycode
"""
