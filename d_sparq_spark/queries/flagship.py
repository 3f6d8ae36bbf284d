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

from d_sparq_spark.queries.helpers import dsum, sql_dsum
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
