"""Flagship query: revenue by nation (scan -> filter -> 3 joins -> agg -> sort).

TPC-H Q5-flavored: lineitem joined to orders (fact-fact, shuffle hash /
sort-merge — Spark picks, AQE can switch at runtime), then to customer,
then to the 25-row nation dim which we broadcast explicitly — at 100 TB
the lineitem/orders join is the only unavoidable shuffle here; dims must
never shuffle the fact side.

Reference parity: this is the relational shape of a D-SPARQ inter-star
pipeline (SURVEY.md §2 A5/A6) — filters pushed into the scans, selective
side first, small side broadcast instead of replicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d_sparq_spark.queries.helpers import DEC, dsum, sql_dsum
from d_sparq_spark.registry import register
from d_sparq_spark.sources.tables import load_table

_ORACLE = f"""
SELECT n.n_name AS nation,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND l.l_shipdate  >= TIMESTAMP '1995-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
"""


_ORACLE_Q5 = f"""
SELECT n.n_name AS nation,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1994-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
"""


@register("q_tpch_q5", oracle=_ORACLE_Q5)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full TPC-H Q5 (local supplier volume): the 6-table join with the
    local-supplier correlation (customer and supplier in the SAME nation
    — an extra equi-key on the lineitem/supplier join, not a filter after
    the fact). Scale shape: lineitem/orders is the one fact-fact shuffle;
    supplier/nation/region broadcast; the region filter prunes nations
    BEFORE the fact join via the broadcast chain."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    orders_f = orders.filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    asia_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey", "n_name")
    return (
        lineitem.join(orders_f, lineitem.l_orderkey == orders_f.o_orderkey)
        .join(customer, orders_f.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(asia_nations), supplier.s_nationkey == asia_nations.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


@register("q_flagship", oracle=_ORACLE)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    # Filters applied before the joins so they push down into the scans.
    orders_f = orders.filter(F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
    lineitem_f = lineitem.filter(F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))

    return (
        lineitem_f.join(orders_f, lineitem_f.l_orderkey == orders_f.o_orderkey)
        .join(customer, orders_f.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


_ORACLE_Q3 = f"""
SELECT l.l_orderkey AS o_key, o.o_orderdate, o.o_orderpriority,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_key
LIMIT 10
"""


@register("q_tpch_q3", oracle=_ORACLE_Q3)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority; o_orderpriority stands in for the
    o_shippriority column the driver tables omit). Scale shape: both
    date filters push into the parquet scans; the BUILDING customers
    reduce to a bare c_custkey key list BEFORE joining orders (never
    carry dim payload through a fact shuffle); lineitem/orders is the
    one fact-fact shuffle; ORDER BY + LIMIT plans as
    TakeOrderedAndProject — per-partition top-10, then a 10-row merge on
    the driver, no global sort at any scale."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders_f = orders.filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    lineitem_f = lineitem.filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        lineitem_f.join(orders_f, lineitem_f.l_orderkey == orders_f.o_orderkey)
        .join(building, orders_f.o_custkey == building.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("o_key"),
            F.col("o_orderdate"),
            F.col("o_orderpriority"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_key"))
        .limit(10)
    )


_ORACLE_Q10 = f"""
SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name AS nation,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate <  TIMESTAMP '1995-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q_tpch_q10", oracle=_ORACLE_Q10)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): who returned the most revenue
    in a quarter. Scale shape: the returnflag + quarter filters cut
    lineitem/orders at the scan; the grouping key is c_custkey (unique),
    so the customer-attribute columns ride the aggregate for free; the
    25-row nation broadcasts onto the post-aggregate rows (one row per
    customer, not per lineitem) — dims join AFTER the reduction when the
    aggregate doesn't need them."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")

    orders_f = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    returned = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    per_cust = (
        returned.join(orders_f, returned.l_orderkey == orders_f.o_orderkey)
        .groupBy("o_custkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    return (
        per_cust.join(customer, per_cust.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"), "revenue"
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


_ORACLE_Q18 = """
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(25,6))) > 250
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       big.total_qty
FROM big
JOIN orders o   ON big.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


@register("q_tpch_q18", oracle=_ORACLE_Q18)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds a threshold. Q18's classic trap is the correlated IN
    subquery; the scale-correct plan aggregates lineitem ONCE (map-side
    partial combine shrinks the shuffle to one row per order), filters
    the aggregate (o_orderkey is the grouping key, so no second
    lineitem pass or self-semi-join is needed), and only then joins the
    few surviving orders — the threshold filter runs BEFORE any join.
    The quantity sum is an exact decimal on both engines, so the
    HAVING boundary (> 250) cannot flap on float accumulation order."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")

    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("_q"))
        .filter(F.col("_q") > 250)
        .select("l_orderkey", F.col("_q").cast("double").alias("total_qty"))
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )
