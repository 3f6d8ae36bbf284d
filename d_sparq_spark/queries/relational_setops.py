"""Set operations (SURVEY §2.C): union / unionByName / intersect / except."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d_sparq_spark.registry import register
from d_sparq_spark.sources.tables import load_table

# --- q_set_ops: tagged union of intersect/except results ------------------------

_ORACLE_SET_OPS = """
WITH c AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
     s AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
SELECT 'both' AS tag, nk FROM (SELECT nk FROM c INTERSECT SELECT nk FROM s)
UNION ALL
SELECT 'cust_only' AS tag, nk FROM (SELECT nk FROM c EXCEPT SELECT nk FROM s)
UNION ALL
SELECT 'supp_only' AS tag, nk FROM (SELECT nk FROM s EXCEPT SELECT nk FROM c)
"""


@register("q_set_ops", oracle=_ORACLE_SET_OPS)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    both = c.intersect(s).select(F.lit("both").alias("tag"), "nk")
    cust_only = c.subtract(s).select(F.lit("cust_only").alias("tag"), "nk")
    supp_only = s.subtract(c).select(F.lit("supp_only").alias("tag"), "nk")
    return both.unionByName(cust_only).unionByName(supp_only)


# --- q_union_by_name: schema-merging union with missing columns -----------------

_ORACLE_UNION_BY_NAME = """
SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind,
       c_mktsegment AS mktsegment
FROM customer WHERE c_acctbal > 9000
UNION ALL
SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS kind,
       CAST(NULL AS VARCHAR) AS mktsegment
FROM supplier WHERE s_acctbal > 9000
"""


@register("q_union_by_name", oracle=_ORACLE_UNION_BY_NAME)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
            F.lit("customer").alias("kind"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(
            F.col("s_name").alias("name"),
            F.col("s_acctbal").alias("acctbal"),
            F.lit("supplier").alias("kind"),
        )
    )
    return cust.unionByName(supp, allowMissingColumns=True)


# --- q_distinct: DISTINCT over a projection --------------------------------------

_ORACLE_DISTINCT_PROJ = """
SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
"""


@register("q_distinct", oracle=_ORACLE_DISTINCT_PROJ)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").dropDuplicates()
