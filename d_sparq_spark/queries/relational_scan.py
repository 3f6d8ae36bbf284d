"""Projection / filter / predicate / JSON-extraction queries (SURVEY §2.C).

These exercise the scan path: every filter here must reach the parquet
scan as a pushed filter, and the projection must prune the read schema
(checked by tests/test_plans.py). At 100 TB these two properties — not
the operator code — decide whether a query reads 100 TB or 2 GB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d_sparq_spark.registry import register
from d_sparq_spark.sources.tables import load_table

# --- q_project: projection with computed columns (column pruning) ----------

_ORACLE_PROJECT = """
SELECT p_partkey,
       upper(p_brand)                        AS brand_uc,
       CAST(round(CAST(p_retailprice AS DECIMAL(12,2)) * CAST(1.1 AS DECIMAL(3,1)), 2)
            AS DOUBLE)                       AS uplift_price,
       CASE WHEN p_size < 10 THEN 'small'
            WHEN p_size < 30 THEN 'medium'
            ELSE 'large' END                 AS size_class
FROM part
"""


@register("q_project", oracle=_ORACLE_PROJECT)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        # decimal-exact uplift: double round() diverges between engines on
        # 3rd-decimal shortest-repr ties (e.g. 1.15 * 1.1); the decimal
        # product is exact and both engines round it half-away identically
        F.round(
            F.col("p_retailprice").cast("decimal(12,2)")
            * F.lit("1.1").cast("decimal(3,1)"),
            2,
        ).cast("double").alias("uplift_price"),
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "medium")
        .otherwise("large")
        .alias("size_class"),
    )


# --- q_filter_pred: compound predicates (pushdown) --------------------------

_ORACLE_FILTER = """
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
  AND c_acctbal BETWEEN 0 AND 5000
  AND NOT (c_nationkey = 3)
  AND c_name LIKE 'Customer#%'
"""


@register("q_filter_pred", oracle=_ORACLE_FILTER)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
        & F.col("c_acctbal").between(0, 5000)
        & ~(F.col("c_nationkey") == 3)
        & F.col("c_name").like("Customer#%")
    ).select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")


# --- q_filter_rlike: regex + null-safe predicates ---------------------------

_ORACLE_RLIKE = """
SELECT o_orderkey, o_orderpriority
FROM orders
WHERE regexp_matches(o_orderpriority, '^[12]-')
  AND o_totalprice >= 1000
"""


@register("q_filter_rlike", oracle=_ORACLE_RLIKE)
def q_filter_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        F.col("o_orderpriority").rlike("^[12]-") & (F.col("o_totalprice") >= 1000)
    ).select("o_orderkey", "o_orderpriority")


# --- q_json_extract: JSON string column -> typed field ----------------------

_ORACLE_JSON = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
"""


@register("q_json_extract", oracle=_ORACLE_JSON)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return events.select("event_id", k.alias("k_val")).filter(F.col("k_val") >= 50)


# --- q_case_when: conditional bucketing with null production -----------------

_ORACLE_CASE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000  THEN 'low'
            WHEN o_totalprice < 200000 THEN 'mid'
            ELSE 'high' END AS price_band,
       nullif(o_orderstatus, 'O') AS status_or_null
FROM orders
"""


@register("q_case_when", oracle=_ORACLE_CASE)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 200000, "mid")
        .otherwise("high")
        .alias("price_band"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
    )


# --- q_filter_nullsafe: null-safe equality (<=>) ------------------------------

_ORACLE_NULLSAFE = """
WITH t AS (
  SELECT o_orderkey, nullif(o_orderstatus, 'O') AS st FROM orders
)
SELECT a.o_orderkey AS k1, b.o_orderkey AS k2
FROM t a JOIN t b
  ON a.st IS NOT DISTINCT FROM b.st
 AND a.o_orderkey < b.o_orderkey AND a.o_orderkey <= 50 AND b.o_orderkey <= 50
"""


@register("q_filter_nullsafe", oracle=_ORACLE_NULLSAFE)
def q_filter_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL <=> NULL
    is TRUE — the orderstatus 'O' rows are nulled out and must still pair."""
    orders = load_table(spark, sf_dir, "orders")
    t = orders.select(
        "o_orderkey", F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("st")
    ).filter(F.col("o_orderkey") <= 50)
    a = t.select(F.col("o_orderkey").alias("k1"), F.col("st").alias("s1"))
    b = t.select(F.col("o_orderkey").alias("k2"), F.col("st").alias("s2"))
    return (
        a.join(b, a.s1.eqNullSafe(b.s2) & (a.k1 < b.k2))
        .select("k1", "k2")
    )
