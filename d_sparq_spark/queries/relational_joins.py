"""Join surface (SURVEY §2.C): inner / broadcast / outer / semi / anti /
range / as-of / cross.

Scale notes (the 100 TB design point):
- dims (nation, region, part at low SF) are broadcast — the fact side never
  shuffles for them;
- fact-fact joins (lineitem x orders) shuffle on the join key; AQE handles
  skew splitting;
- the range join keeps an equi-key (user_id) so Spark plans a hash join
  with a range residual, never a cartesian BNLJ;
- the as-of join is the union + last(ignorenulls) window trick: O(n log n)
  sort within user partitions, no pairwise blow-up (the naive join +
  row_number approach materializes |views|x|purchases| pairs per user).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from d_sparq_spark.queries.helpers import dsum, sql_dsum
from d_sparq_spark.registry import register
from d_sparq_spark.sources.tables import load_table

# --- q_join_inner: fact-fact equi join --------------------------------------

_ORACLE_INNER = """
SELECT o.o_orderkey, c.c_name, o.o_totalprice
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
"""


@register("q_join_inner", oracle=_ORACLE_INNER)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "o_orderkey", "c_name", "o_totalprice"
    )


# --- q_join_broadcast: dim chain fully broadcast -----------------------------

_ORACLE_BROADCAST = """
SELECT s.s_name, n.n_name, r.r_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name IN ('ASIA', 'EUROPE')
"""


@register("q_join_broadcast", oracle=_ORACLE_BROADCAST)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_name", "n_name", "r_name")
    )


# --- q_join_outer: left outer with aggregation over the null side -----------

_ORACLE_OUTER = f"""
SELECT c.c_custkey,
       COUNT(o.o_orderkey) AS n_orders,
       {sql_dsum('COALESCE(o.o_totalprice, 0)')} AS total_spent
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
"""


@register("q_join_outer", oracle=_ORACLE_OUTER)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, orders.o_custkey == customer.c_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))).alias("total_spent"),
        )
    )


# --- q_join_full: full outer of two aggregates -------------------------------

_ORACLE_FULL = """
WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
           FROM supplier WHERE s_acctbal > 5000 GROUP BY 1)
SELECT COALESCE(c.nk, s.nk) AS nationkey,
       COALESCE(c.n_cust, 0) AS n_cust,
       COALESCE(s.n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c.nk = s.nk
"""


@register("q_join_full", oracle=_ORACLE_FULL)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cust.join(supp, cust.nk == supp.nk, "full_outer").select(
        F.coalesce(cust.nk, supp.nk).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


# --- q_join_semi / q_join_anti ------------------------------------------------

_ORACLE_SEMI = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
"""


@register("q_join_semi", oracle=_ORACLE_SEMI)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return customer.join(
        big_orders, customer.c_custkey == big_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


_ORACLE_ANTI = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""


@register("q_join_anti", oracle=_ORACLE_ANTI)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    # threshold chosen so the anti side is non-empty at every SF (a trivially
    # empty result would "match" any oracle).
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --- q_join_range: equi-key + time-range residual ----------------------------
# events.ts has ns precision in parquet; Spark truncates to us. Oracles
# therefore compare date_trunc('microseconds', ts) so both engines see the
# same instants (see tests/test_queries_oracle.py docstring).

_ORACLE_RANGE = """
WITH e AS (SELECT user_id, event_id, event_type,
                  date_trunc('microseconds', ts) AS ts FROM events)
SELECT s.event_id AS signup_id, p.event_id AS purchase_id, s.user_id
FROM e s
JOIN e p ON p.user_id = s.user_id
        AND p.ts >= s.ts AND p.ts < s.ts + INTERVAL 1 HOUR
WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
"""


@register("q_join_range", oracle=_ORACLE_RANGE)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream funnel — ONE shared implementation
    (streaming/joins.py) so the stream-vs-batch equivalence test compares
    the same join shape, not two independently-written queries."""
    from d_sparq_spark.streaming.joins import funnel_join, funnel_sides

    events = load_table(spark, sf_dir, "events")
    return funnel_join(*funnel_sides(events))


# --- q_join_asof: latest prior view per purchase (union + last() trick) ------

_ORACLE_ASOF = """
WITH v AS (SELECT user_id, event_id AS vid, date_trunc('microseconds', ts) AS vts
           FROM events WHERE event_type = 'view'),
     p AS (SELECT user_id, event_id AS pid, date_trunc('microseconds', ts) AS pts
           FROM events WHERE event_type = 'purchase'),
     j AS (SELECT p.pid, p.user_id, v.vid,
                  row_number() OVER (PARTITION BY p.pid
                                     ORDER BY v.vts DESC, v.vid DESC) AS rn
           FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.vts <= p.pts)
SELECT pid AS purchase_id, user_id, vid AS last_view_id
FROM j WHERE rn = 1
"""


@register("q_join_asof", oracle=_ORACLE_ASOF)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join without pairwise blow-up: tag both streams, sort once per
    user, carry the last view id forward with last(ignorenulls=True).

    A view at the exact same (us-truncated) instant as a purchase counts as
    prior — hence views sort before purchases on ties (kind 0 < 1)."""
    events = load_table(spark, sf_dir, "events")
    tagged = events.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "view", 0).otherwise(1).alias("kind"),
        F.when(F.col("event_type") == "view", F.col("event_id")).alias("view_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_view_id", F.last("view_id", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(F.col("event_id").alias("purchase_id"), "user_id", "last_view_id")
    )


# --- q_join_cross: bounded cross join ----------------------------------------

_ORACLE_CROSS = """
SELECT a.r_name AS r1, b.r_name AS r2
FROM region a CROSS JOIN region b
WHERE a.r_name < b.r_name
"""


@register("q_join_cross", oracle=_ORACLE_CROSS)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    a = region.select(F.col("r_name").alias("r1"))
    b = region.select(F.col("r_name").alias("r2"))
    return a.crossJoin(b).filter(F.col("r1") < F.col("r2"))


# --- q_merge_upsert: lakehouse MERGE shape (full-outer-join upsert) ----------

_ORACLE_MERGE = """
WITH changes AS (
  SELECT c_custkey AS k, c_acctbal + 100 AS bal
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 0.0 FROM customer WHERE c_custkey % 1000 = 1
)
SELECT COALESCE(ch.k, c.c_custkey) AS c_custkey,
       COALESCE(ch.bal, c.c_acctbal) AS acctbal,
       CASE WHEN c.c_custkey IS NULL THEN 'insert'
            WHEN ch.k IS NULL THEN 'keep'
            ELSE 'update' END AS action
FROM customer c FULL OUTER JOIN changes ch ON ch.k = c.c_custkey
"""


@register("q_merge_upsert", oracle=_ORACLE_MERGE)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as plain DataFrames: a changes batch (updates
    + brand-new keys) full-outer-joined with the base table; matched rows
    take the change, unmatched-by-source keep, unmatched-by-target
    insert. This is exactly the join a lakehouse MERGE plans under the
    hood — at scale the change batch is usually small, so AQE broadcasts
    it and only the touched partitions rewrite."""
    cust = load_table(spark, sf_dir, "customer")
    changes = (
        cust.filter(F.col("c_custkey") % 3 == 0)
        .select(F.col("c_custkey").alias("k"), (F.col("c_acctbal") + 100).alias("bal"))
        .unionByName(
            cust.filter(F.col("c_custkey") % 1000 == 1).select(
                (F.col("c_custkey") + 1000000).alias("k"), F.lit(0.0).alias("bal")
            )
        )
    )
    base = cust.select("c_custkey", "c_acctbal")
    return base.join(changes, base.c_custkey == changes.k, "full_outer").select(
        F.coalesce(changes.k, base.c_custkey).alias("c_custkey"),
        F.coalesce(changes.bal, base.c_acctbal).alias("acctbal"),
        F.when(base.c_custkey.isNull(), "insert")
        .when(changes.k.isNull(), "keep")
        .otherwise("update")
        .alias("action"),
    )
