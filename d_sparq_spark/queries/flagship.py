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


# ---- round-4 TPC-H widening: Q6 / Q4 / Q17 / Q21 shapes -------------------
# The synthetic schema lacks l_commitdate / l_receiptdate / p_container, so
# Q4/Q17/Q21 are faithful ADAPTATIONS on the available columns (the join/
# subquery shapes — EXISTS semi-join, correlated average, only-one-late
# double correlation — are the point, not the literal predicates).

_ORACLE_Q6 = f"""
SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q_tpch_q6", oracle=_ORACLE_Q6)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the pure scan-filter-agg
    query — its whole point at scale is that every predicate reaches the
    parquet scan (min/max row-group pruning on shipdate, dictionary
    filters on the rest) and the aggregate is one map-side-combined pass
    with NO shuffle beyond the final 1-row merge. Plan-asserted in
    tests/test_plans.py."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    return lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


_ORACLE_Q4 = """
SELECT o.o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate <  TIMESTAMP '1995-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""


@register("q_tpch_q4", oracle=_ORACLE_Q4)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): EXISTS over lineitem
    with a correlated inequality (shipped after the order date — the
    schema's stand-in for commit<receipt). Scale shape: the quarter
    filter cuts orders at the scan; the EXISTS is one LEFT SEMI hash
    join on l_orderkey with the inequality as a join residual — never a
    per-order subquery, never a count-then-filter over all of lineitem."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = lineitem.select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


_ORACLE_Q17 = f"""
WITH pa AS (
  SELECT l_partkey, 0.5 * AVG(l_quantity) AS half_avg
  FROM lineitem GROUP BY l_partkey
)
SELECT {sql_dsum('l.l_extendedprice')} / 7.0 AS avg_yearly,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pa   ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#4' AND p.p_size < 20
  AND l.l_quantity < pa.half_avg
"""


@register("q_tpch_q17", oracle=_ORACLE_Q17)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): the correlated
    per-part average. Scale shape: the correlation is ONE aggregate over
    lineitem keyed by partkey joined back (never a per-row subquery); the
    brand filter reduces part BEFORE the join and that reduced dim
    broadcasts. The threshold average is exact here (integer-valued
    quantities sum exactly in doubles), so the comparison cannot flap on
    partial-agg order."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pa = lineitem.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    brand = part.filter((F.col("p_brand") == "Brand#4") & (F.col("p_size") < 20)).select(
        "p_partkey"
    )
    li = lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
    return (
        li.join(F.broadcast(brand), li.l_partkey == brand.p_partkey)
        .join(pa, "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (dsum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_ORACLE_Q21 = """
WITH li AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CAST(l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY AS INT) AS is_late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END) AS n_late
  FROM li GROUP BY l_orderkey
),
waiting AS (
  SELECT DISTINCT li.l_orderkey, li.l_suppkey
  FROM li JOIN per_order po ON li.l_orderkey = po.l_orderkey
  WHERE li.is_late = 1 AND po.n_supp > 1 AND po.n_late = 1
)
SELECT s.s_name, COUNT(*) AS numwait
FROM waiting w JOIN supplier s ON w.l_suppkey = s.s_suppkey
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 10
"""


@register("q_tpch_q21", oracle=_ORACLE_Q21)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the classic
    EXISTS (another supplier in the order) + NOT EXISTS (no OTHER late
    supplier) double correlation — rewritten as per-order counts, the
    set-based form that scales: one aggregate over the order's suppliers
    replaces two correlated semi/anti joins, so lineitem is shuffled
    once on l_orderkey instead of three times. 'Late' is shipped >90
    days after the order date (the schema's stand-in for
    receipt>commit)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")

    li = lineitem.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .cast("int")
        .alias("is_late"),
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("n_late"),
    )
    waiting = (
        li.filter(F.col("is_late") == 1)
        .join(per_order, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        waiting.join(F.broadcast(supplier), waiting.l_suppkey == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


_ORACLE_Q13 = """
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q_tpch_q13", oracle=_ORACLE_Q13)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): the LEFT join with a
    predicate ON THE JOIN (not a post-filter — customers whose orders all
    fail it must still appear with count 0), then a histogram of the
    counts. The classic skew benchmark: per-customer counts are a
    map-side-combinable aggregate; the second aggregate's key space is the
    tiny count domain (bounded-key hash agg)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderpriority") != "4-NOT SPECIFIED").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        customer.select("c_custkey")
        .join(o, customer.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_ORACLE_Q14 = f"""
SELECT 100.0 * {sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
       / {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS promo_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
  AND l.l_shipdate <  TIMESTAMP '1995-10-01'
"""


@register("q_tpch_q14", oracle=_ORACLE_Q14)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): conditional revenue share in one
    month. Scale shape: the month filter reaches the lineitem scan; part
    joins only the filtered slice; both sums are exact decimals so the
    ratio is bit-stable whatever the aggregation order."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(part.select("p_partkey", "p_type"), li.l_partkey == part.p_partkey)
        .agg((100.0 * dsum(promo) / dsum(rev)).alias("promo_revenue"))
    )


_ORACLE_Q15 = f"""
WITH rev AS (
  SELECT l_suppkey, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_rev
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
ORDER BY s.s_suppkey
"""


@register("q_tpch_q15", oracle=_ORACLE_Q15)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the revenue 'view' materialized as one
    keyed aggregate, its max as a 1-row broadcast crossed back in —
    lineitem is scanned ONCE (the naive form scans it twice: once for the
    view, once for the scalar subquery). The quarter sums are exact
    decimals, so the max-equality cannot flap across engines."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_rev"))
    )
    rev = rev.persist()  # the view + its max: one lineitem scan, not two
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("_mx"))
        .join(F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )
