"""Aggregation surface (SURVEY §2.C): hash aggregates, distinct, having,
rollup, cube, order statistics.

All double-valued aggregates go through the exact-decimal-sum helpers so
results are independent of partial-aggregation order (helpers.py). Spark
plans these as partial (map-side) + final hash aggregates automatically —
the 100 TB concern is only key cardinality, and every groupBy here keys on
low-cardinality dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d_sparq_spark.queries.helpers import DEC, davg, dsum, sql_davg, sql_dsum
from d_sparq_spark.registry import register
from d_sparq_spark.sources.tables import load_table

# --- q_agg_basic: TPC-H Q1 pricing summary -----------------------------------

_ORACLE_BASIC = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_davg('l_quantity')} AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("q_agg_basic", oracle=_ORACLE_BASIC)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- q_agg_distinct ------------------------------------------------------------

_ORACLE_DISTINCT = """
SELECT c_mktsegment,
       COUNT(*) AS n_cust,
       COUNT(DISTINCT c_nationkey) AS n_nations
FROM customer
GROUP BY c_mktsegment
"""


@register("q_agg_distinct", oracle=_ORACLE_DISTINCT)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )


# --- q_agg_having ---------------------------------------------------------------

_ORACLE_HAVING = f"""
SELECT o_custkey, COUNT(*) AS n_orders, {sql_dsum('o_totalprice')} AS spent
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 12
"""


@register("q_agg_having", oracle=_ORACLE_HAVING)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum(F.col("o_totalprice")).alias("spent"))
        .filter(F.col("n_orders") >= 12)
    )


# --- q_agg_rollup / q_agg_cube ---------------------------------------------------

_ORACLE_ROLLUP = f"""
SELECT r.r_name, n.n_name,
       COUNT(c.c_custkey) AS n_cust,
       {sql_dsum('c.c_acctbal')} AS sum_bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
"""


@register("q_agg_rollup", oracle=_ORACLE_ROLLUP)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count("c_custkey").alias("n_cust"), dsum(F.col("c_acctbal")).alias("sum_bal")
    )


_ORACLE_CUBE = f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items, {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("q_agg_cube", oracle=_ORACLE_CUBE)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"), dsum(F.col("l_quantity")).alias("sum_qty")
    )


# --- q_agg_stats: min/max + manual stddev via exact sums --------------------
# stddev_samp's streaming accumulation differs between engines in the last
# ulps; computing it from exact decimal SUM(x) / SUM(x^2) makes both sides
# bit-identical (same formula, same doubles in, same doubles out).

_ORACLE_STATS = f"""
SELECT c_nationkey,
       COUNT(*) AS n,
       MIN(c_acctbal) AS min_bal,
       MAX(c_acctbal) AS max_bal,
       CASE WHEN COUNT(*) > 1 THEN
         sqrt(({sql_dsum('c_acctbal * c_acctbal')}
               - {sql_dsum('c_acctbal')} * {sql_dsum('c_acctbal')} / COUNT(*))
              / (COUNT(*) - 1))
       END AS std_bal
FROM customer
GROUP BY c_nationkey
"""


@register("q_agg_stats", oracle=_ORACLE_STATS)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    n = F.count(F.lit(1))
    sx = dsum(F.col("c_acctbal"))
    sx2 = dsum(F.col("c_acctbal") * F.col("c_acctbal"))
    return customer.groupBy("c_nationkey").agg(
        n.alias("n"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        F.when(n > 1, F.sqrt((sx2 - sx * sx / n) / (n - 1))).alias("std_bal"),
    )


# --- q_agg_median: exact interpolated percentile ------------------------------

_ORACLE_MEDIAN = """
SELECT c_mktsegment,
       quantile_cont(c_acctbal, 0.5) AS median_bal,
       quantile_cont(c_acctbal, 0.9) AS p90_bal
FROM customer
GROUP BY c_mktsegment
"""


@register("q_agg_median", oracle=_ORACLE_MEDIAN)
def q_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.groupBy("c_mktsegment").agg(
        F.percentile("c_acctbal", F.lit(0.5)).alias("median_bal"),
        F.percentile("c_acctbal", F.lit(0.9)).alias("p90_bal"),
    )


# --- q_agg_group_concat: ordered string aggregation ---------------------------

_ORACLE_GROUP_CONCAT = """
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation
GROUP BY n_regionkey
"""


@register("q_agg_group_concat", oracle=_ORACLE_GROUP_CONCAT)
def q_agg_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations")
    )
