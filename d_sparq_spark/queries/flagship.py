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
