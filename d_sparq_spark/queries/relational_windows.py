"""Window-function surface (SURVEY §2.C): ranking, frames, lag/lead, ntile,
top-k. Every window ORDER BY includes a unique tiebreak column — without
it, row_number/lag results are nondeterministic and can't hash-match any
oracle (and at scale, nondeterminism across retries corrupts results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from d_sparq_spark.queries.helpers import DEC
from d_sparq_spark.registry import register
from d_sparq_spark.sources.tables import load_table

# --- q_window_rank -------------------------------------------------------------

_ORACLE_RANK = """
SELECT c_custkey, c_nationkey,
       CAST(rank()       OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(row_number() OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC)
"""


@register("q_window_rank", oracle=_ORACLE_RANK)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    w_unique = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return customer.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.row_number().over(w_unique).cast("long").alias("rn"),
    )


# --- q_window_frame: running revenue per customer ------------------------------

_ORACLE_FRAME = f"""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_spent
FROM orders
"""


@register("q_window_frame", oracle=_ORACLE_FRAME)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("running_spent"),
    )


# --- q_window_lag: inter-event gap in exact microseconds ------------------------

_ORACLE_LAG = """
WITH e AS (SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts FROM events)
SELECT user_id, event_id,
       epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id) AS gap_us
FROM e
"""


@register("q_window_lag", oracle=_ORACLE_LAG)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return events.select(
        "user_id", "event_id", (us - F.lag(us).over(w)).alias("gap_us")
    )


# --- q_window_ntile --------------------------------------------------------------

_ORACLE_NTILE = """
SELECT c_custkey, c_mktsegment,
       CAST(ntile(4) OVER (PARTITION BY c_mktsegment
                           ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile
FROM customer
"""


@register("q_window_ntile", oracle=_ORACLE_NTILE)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey", "c_mktsegment", F.ntile(4).over(w).cast("long").alias("quartile")
    )


# --- q_topk: global top-k (TakeOrderedAndProject — no full sort at scale) --------

_ORACLE_TOPK = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@register("q_topk", oracle=_ORACLE_TOPK)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# --- q_topk_per_group: per-customer top-3 orders ----------------------------------

_ORACLE_TOPK_GROUP = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey)
                  AS BIGINT) AS rn
      FROM orders)
WHERE rn <= 3
"""


@register("q_topk_per_group", oracle=_ORACLE_TOPK_GROUP)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# --- q_window_dist: percent_rank + cume_dist + dense_rank ---------------------
# Exact doubles: both functions divide small exact integers ((rank-1)/(n-1),
# rows<=x/n), so the quotients are bit-identical across engines.

_ORACLE_WINDOW_DIST = """
SELECT c_custkey,
       CAST(dense_rank() OVER w AS BIGINT) AS dr,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
"""


@register("q_window_dist", oracle=_ORACLE_WINDOW_DIST)
def q_window_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        F.dense_rank().over(w).cast("long").alias("dr"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


_ORACLE_SKYLINE = """
SELECT p.p_brand, p.p_partkey, p.p_retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_brand = p.p_brand
    AND q.p_retailprice <= p.p_retailprice
    AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
"""


def pareto_sweep(
    df: DataFrame, group_col: str, price_col: str, size_col: str
) -> DataFrame:
    """Rows of ``df`` not dominated within their group: some same-group row
    <= on price, >= on size, strictly better on one. O(n log n): collapse
    to max size per (group, price), running max over strictly-cheaper
    prices (rows frame ending at -1 over distinct prices), dominance by
    comparison. Exported so the hypothesis property test drives the SAME
    sweep the query uses against the quadratic definition.

    NULL handling follows the NOT EXISTS definition exactly (review r4):
    every comparison against a NULL group/price/size is NULL there, so
    such rows can neither dominate nor be dominated — they bypass the
    sweep straight into the skyline and are excluded from the running
    max (the previous version equi-join-dropped NULL prices and let
    NULLS-FIRST window ordering poison _prev_max). The no-cheaper-price
    case is an explicit isNotNull gate, not a magic sentinel a legitimate
    INT_MIN size would collide with."""
    incomparable = df.filter(
        F.col(group_col).isNull()
        | F.col(price_col).isNull()
        | F.col(size_col).isNull()
    )
    comparable = df.filter(
        F.col(group_col).isNotNull()
        & F.col(price_col).isNotNull()
        & F.col(size_col).isNotNull()
    )
    per_price = comparable.groupBy(group_col, price_col).agg(
        F.max(size_col).alias("_msize")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(price_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_price = per_price.withColumn("_prev_max", F.max("_msize").over(w))
    swept = (
        comparable.join(per_price, [group_col, price_col])
        .filter(
            ~(
                (F.col("_prev_max").isNotNull() & (F.col("_prev_max") >= F.col(size_col)))
                | (F.col("_msize") > F.col(size_col))
            )
        )
        .drop("_msize", "_prev_max")
    )
    return swept.unionByName(incomparable)


@register("q_skyline", oracle=_ORACLE_SKYLINE)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pareto skyline (cheapest AND largest parts): a part is
    dominated when some same-brand part is <= on price, >= on size, and
    strictly better on at least one.

    The oracle states the definition as the quadratic NOT EXISTS
    dominance join; the Spark plan is the O(n log n) sweep — collapse to
    one row per (brand, price) keeping the max size, take the running
    max of that over strictly-cheaper prices (rows-frame window ending
    at -1, partitioned by brand — no single-partition window), and a row
    is dominated iff that running max reaches its size, or an equal-price
    part strictly exceeds it. At 100 TB the quadratic join is impossible
    and the sweep is one narrow shuffle on (brand, price)."""
    part = load_table(spark, sf_dir, "part")
    return pareto_sweep(part, "p_brand", "p_retailprice", "p_size").select(
        "p_brand", "p_partkey", "p_retailprice", "p_size"
    )
