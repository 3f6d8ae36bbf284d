"""TPC-H completion: the 11 queries not yet covered (Q1, Q2, Q7, Q8, Q9,
Q11, Q12, Q16, Q19, Q20, Q22) — with flagship.py's Q3/Q4/Q5/Q6/Q10/Q13/
Q14/Q15/Q17/Q18/Q21 this makes the full 22-query suite.

The synthetic schema has no partsupp table and lacks l_shipmode /
l_commitdate / l_receiptdate / c_phone / p_container, so Q2/Q11/Q16/Q20
derive the part-supplier relationship from lineitem and Q12/Q22 use
faithful stand-in predicates — as with Q4/Q17/Q21 (flagship.py:270), the
join/subquery SHAPES are the point: min-cost correlated subquery (Q2),
global-fraction threshold (Q11), NOT-IN anti join (Q16), correlated
half-sum threshold (Q20), scalar-average + NOT-EXISTS (Q22).

Cross-engine determinism: every money aggregate is an exact decimal sum
(helpers.dsum / sql_dsum); averages divide a decimal-exact sum by a count
in double (helpers.davg); year() is cast to INT on both sides (DuckDB's
returns BIGINT); conditional counts use COUNT(CASE ...) rather than
SUM(CASE ...) because DuckDB sums integers into HUGEINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d_sparq_spark.queries.helpers import davg, dsum, sql_davg, sql_dsum
from d_sparq_spark.registry import register
from d_sparq_spark.sources.tables import load_table

# --- Q1: pricing summary report ---------------------------------------------------

_ORACLE_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_davg('l_quantity')} AS avg_qty,
       {sql_davg('l_extendedprice')} AS avg_price,
       {sql_davg('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q_tpch_q1", oracle=_ORACLE_Q1)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary): THE scan-heavy aggregation benchmark.
    Scale shape: one pass over lineitem, shipdate pushed to the scan,
    6-group key space so the map-side partial aggregate reduces ~everything
    before the (tiny) shuffle; 8 aggregates computed in the same hash-agg
    operator, no second pass. All money sums are exact decimals so the
    8-way result is bit-stable under any partial-agg order."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("2000-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- Q2: minimum-cost supplier ----------------------------------------------------

_ORACLE_Q2 = """
WITH supply AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
),
cand AS (
  SELECT p.p_partkey, p.p_name, eu.s_name, eu.s_acctbal, eu.n_name AS nation, su.cost
  FROM part p
  JOIN supply su ON su.l_partkey = p.p_partkey
  JOIN eu ON eu.s_suppkey = su.l_suppkey
  WHERE p.p_size = 8 AND p.p_type = 'LARGE'
),
mn AS (SELECT p_partkey, MIN(cost) AS min_cost FROM cand GROUP BY p_partkey)
SELECT c.s_acctbal, c.s_name, c.nation, c.p_partkey, c.p_name, c.cost
FROM cand c JOIN mn ON c.p_partkey = mn.p_partkey AND c.cost = mn.min_cost
ORDER BY c.s_acctbal DESC, c.s_name, c.p_partkey
LIMIT 100
"""


@register("q_tpch_q2", oracle=_ORACLE_Q2)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): the correlated MIN subquery
    — who supplies this part cheapest in this region. No partsupp table, so
    the part-supplier relation and its unit cost derive from lineitem
    (MIN(l_extendedprice / l_quantity) per pair — per-row IEEE division is
    identical on both engines and MIN is order-insensitive, so the
    min-equality join cannot flap). Scale shape: the correlation is ONE
    keyed MIN joined back (never per-part subqueries); part and the
    region-filtered supplier dim both reduce BEFORE touching the big
    supply relation and broadcast; ORDER+LIMIT is TakeOrderedAndProject."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    supply = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    eu = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
              nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    sized = part.filter((F.col("p_size") == 8) & (F.col("p_type") == "LARGE")).select(
        "p_partkey", "p_name"
    )
    cand = (
        supply.join(F.broadcast(sized), supply.l_partkey == sized.p_partkey)
        .join(F.broadcast(eu), supply.l_suppkey == eu.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "nation", "cost")
    )
    mn = cand.groupBy(F.col("p_partkey").alias("_pk")).agg(F.min("cost").alias("min_cost"))
    return (
        cand.join(
            mn, (cand.p_partkey == mn._pk) & (cand.cost == mn.min_cost)
        )
        .select("s_acctbal", "s_name", "nation", "p_partkey", "p_name", "cost")
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(100)
    )


# --- Q7: volume shipping between two nations --------------------------------------

_ORACLE_Q7 = f"""
SELECT supp_nation, cust_nation, l_year,
       {sql_dsum('volume')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l.l_shipdate) AS INT) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
      OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20'))
    AND l.l_shipdate >= TIMESTAMP '1995-01-01'
    AND l.l_shipdate <  TIMESTAMP '1997-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("q_tpch_q7", oracle=_ORACLE_Q7)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade between two nations by
    year. Scale shape: both nation filters push through the BROADCAST dim
    joins onto the fact sides BEFORE the fact-fact shuffle — supplier
    reduces to the two nations' keys and cuts lineitem at its first join;
    the customer side cuts orders the same way; only then do the two
    pre-filtered facts meet on l_orderkey. year() is cast to INT on both
    engines (DuckDB's returns BIGINT)."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    two = nation.filter(F.col("n_name").isin("NATION_20", "NATION_11")).select(
        "n_nationkey", "n_name"
    )
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    supp_side = (
        li.join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
                li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(two.withColumnRenamed("n_name", "supp_nation")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("l_orderkey", "l_shipdate", "l_extendedprice", "l_discount", "supp_nation")
    )
    cust_side = (
        orders.select("o_orderkey", "o_custkey")
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(two.withColumnRenamed("n_name", "cust_nation")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("o_orderkey", "cust_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        supp_side.join(cust_side, supp_side.l_orderkey == cust_side.o_orderkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dsum(volume).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- Q8: national market share ----------------------------------------------------

_ORACLE_Q8 = f"""
SELECT o_year,
       {sql_dsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
       / {sql_dsum('volume')} AS mkt_share
FROM (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1995-01-01'
    AND o.o_orderdate <  TIMESTAMP '1997-01-01'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@register("q_tpch_q8", oracle=_ORACLE_Q8)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's share of a region's
    market for a part type, by year. Scale shape: the three dims that
    FILTER (part by type, customer-nation by region) broadcast and cut the
    facts before the lineitem/orders shuffle; the supplier-nation dim that
    only LABELS joins last. The share is a ratio of two decimal-exact sums
    computed in the same aggregate — one pass, bit-stable."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    econ = part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    asia_keys = (
        nation.join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                    nation.n_regionkey == region.r_regionkey)
        .select(F.col("n_nationkey").alias("_cnk"))
    )
    orders_f = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(asia_keys), F.col("c_nationkey") == F.col("_cnk"))
        .select("o_orderkey", "o_orderdate")
    )
    supp_nation = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    natl = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(F.lit(0.0))
    return (
        lineitem.join(F.broadcast(econ), lineitem.l_partkey == econ.p_partkey)
        .join(orders_f, lineitem.l_orderkey == orders_f.o_orderkey)
        .join(F.broadcast(supp_nation), lineitem.l_suppkey == supp_nation.s_suppkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg((dsum(natl) / dsum(volume)).alias("mkt_share"))
        .orderBy("o_year")
    )


# --- Q9: product-type profit ------------------------------------------------------

_ORACLE_Q9 = f"""
SELECT nation, o_year, {sql_dsum('amount')} AS sum_profit
FROM (
  SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) - p.p_retailprice * l.l_quantity AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE p.p_name LIKE '%ring%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@register("q_tpch_q9", oracle=_ORACLE_Q9)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit on a part-name family
    by supplier nation and year. No partsupp, so unit cost is
    p_retailprice (the amount expression keeps Q9's sum-of-differences
    form; per-row doubles are IEEE-identical on both engines and the sum
    is decimal-exact). Scale shape: the name filter reduces part to a
    broadcast key list that cuts lineitem FIRST; supplier->nation
    broadcasts as a label; lineitem/orders is the one fact-fact shuffle."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")

    named = part.filter(F.col("p_name").like("%ring%")).select(
        "p_partkey", "p_retailprice"
    )
    supp_nation = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        lineitem.join(F.broadcast(named), lineitem.l_partkey == named.p_partkey)
        .join(orders.select("o_orderkey", "o_orderdate"),
              lineitem.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp_nation), lineitem.l_suppkey == supp_nation.s_suppkey)
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(dsum(amount).alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


# --- Q11: important stock identification ------------------------------------------

_ORACLE_Q11 = f"""
WITH val AS (
  SELECT l.l_partkey, {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS value
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY l.l_partkey
)
SELECT v.l_partkey AS p_partkey, v.value
FROM val v CROSS JOIN (SELECT {sql_dsum('value')} AS tot, COUNT(*) AS n FROM val) t
WHERE v.value * t.n > t.tot * 2
ORDER BY v.value DESC, p_partkey
"""


@register("q_tpch_q11", oracle=_ORACLE_Q11)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part value for one nation's
    suppliers vs a fraction of the GLOBAL total — the scalar-subquery
    threshold. No partsupp, so value is discounted revenue from lineitem.
    Scale shape: the keyed aggregate is computed ONCE and persisted; its
    1-row total broadcasts back as a cross join (Q15's pattern) — the
    naive form scans lineitem twice. The threshold is SCALE-FREE (r8,
    found by the sf0.1 oracle lap): a fixed fraction of the global total
    goes vacuously empty as the part count grows (TPC-H's own spec scales
    it by 1/SF), so keep parts above 2x the MEAN share instead —
    value * n_parts > total * 2, multiplication only, so both engines
    compare decimal-exact values and the threshold cannot flap."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    keys = (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
            supplier.s_nationkey == nation.n_nationkey,
        ).select("s_suppkey")
    )
    val = (
        lineitem.join(F.broadcast(keys), lineitem.l_suppkey == keys.s_suppkey)
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    )
    val = val.persist()  # value list + its total: one lineitem pass, not two
    total = val.agg(
        (dsum(F.col("value")) * 2).alias("_tot2"),
        F.count(F.lit(1)).alias("_n"),
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value") * F.col("_n") > F.col("_tot2"))
        .select(F.col("l_partkey").alias("p_partkey"), "value")
        .orderBy(F.col("value").desc(), "p_partkey")
    )


# --- Q12: shipping-priority classes -----------------------------------------------

_ORACLE_Q12 = """
SELECT l.l_linestatus AS ship_class,
       COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
         AS high_line_count,
       COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
         AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
"""


@register("q_tpch_q12", oracle=_ORACLE_Q12)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes vs priority): conditional counts of
    high/low-priority orders per shipping class among late lines. No
    l_shipmode/commitdate/receiptdate: l_linestatus stands in for the mode
    and 'late' is shipped >30 days after ordering (a join residual — it
    compares columns from BOTH sides, so it cannot be a scan filter; the
    year bounds DO push to the lineitem scan). Conditional counts use
    COUNT(CASE...) — identical BIGINT on both engines, where SUM(int)
    would be HUGEINT in DuckDB."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_shipdate", "l_linestatus")
    o = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        )
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


# --- Q16: part/supplier relationship ----------------------------------------------

_ORACLE_Q16 = """
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type <> 'ECONOMY'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
"""


@register("q_tpch_q16", oracle=_ORACLE_Q16)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier diversity per part group): distinct
    suppliers per (brand, type, size) excluding a blacklist — the NOT IN
    anti join. The part-supplier relation derives from lineitem (no
    partsupp); negative-balance suppliers stand in for the complaints
    pattern. Scale shape: part (filtered) broadcasts and the blacklist is
    a LEFT ANTI broadcast join (s_suppkey is non-null, so NOT IN == anti
    join) — both row-local, so they run BEFORE the only wide op and the
    shuffle carries just the surviving pairs (a distinct over ALL raw
    pairs first would shuffle the ~84% the part filter discards, and
    Catalyst won't push a join below an aggregate on its own);
    COUNT(DISTINCT) dedups pairs inside its own partial aggregate."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")

    pairs = lineitem.select("l_partkey", "l_suppkey")
    pf = part.filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "ECONOMY")
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    blacklist = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        pairs.join(F.broadcast(pf), pairs.l_partkey == pf.p_partkey)
        .join(F.broadcast(blacklist), pairs.l_suppkey == blacklist.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --- Q19: discounted revenue (disjunctive brackets) -------------------------------

_ORACLE_Q19 = f"""
SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("q_tpch_q19", oracle=_ORACLE_Q19)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): the disjunctive-predicate join —
    three OR'd brackets each constraining BOTH sides. Scale shape:
    Catalyst derives the single-side implications (brand IN the 3 values,
    size <= 15, quantity 1..30) and pushes them to the scans even though
    the full OR is a join residual; part reduced by its derived filter is
    a broadcast. The residual OR evaluates inside whole-stage codegen —
    no UDF, no row explosion."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    li = lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    p = part.select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(bracket)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --- Q20: excess-inventory suppliers ----------------------------------------------

_ORACLE_Q20 = f"""
WITH shipped AS (
  SELECT l_suppkey, l_partkey,
         {sql_dsum('l_quantity')} AS total_qty,
         {sql_dsum("CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'"
                    " AND l_shipdate < TIMESTAMP '1997-01-01'"
                    " THEN l_quantity ELSE 0 END")} AS qty_1996
  FROM lineitem GROUP BY l_suppkey, l_partkey
)
SELECT DISTINCT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN shipped sh ON sh.l_suppkey = s.s_suppkey
JOIN part p ON p.p_partkey = sh.l_partkey
WHERE n.n_name = 'NATION_3'
  AND p.p_name LIKE 'red%'
  AND sh.qty_1996 > 0.5 * sh.total_qty
ORDER BY s.s_name
"""


@register("q_tpch_q20", oracle=_ORACLE_Q20)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess inventory): suppliers in one nation who
    moved more than half of a part family's quantity in one year — the
    correlated half-sum threshold (availqty > 0.5 * sum(shipped) in the
    original; here 1996 volume vs all-time per pair). Scale shape: ONE
    keyed aggregate computes both the conditional-year and total sums
    (never two lineitem passes); the name-filtered part and nation's
    suppliers broadcast; the final DISTINCT is a left-semi reduction on
    an already-tiny set. Both sums are decimal-exact so the 0.5x boundary
    cannot flap."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")

    in_1996 = (
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = lineitem.groupBy("l_suppkey", "l_partkey").agg(
        dsum(F.col("l_quantity")).alias("total_qty"),
        dsum(F.when(in_1996, F.col("l_quantity")).otherwise(F.lit(0.0))).alias("qty_1996"),
    )
    red = part.filter(F.col("p_name").like("red%")).select("p_partkey")
    nat_supp = (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
            supplier.s_nationkey == nation.n_nationkey,
        ).select("s_suppkey", "s_name", "s_acctbal")
    )
    qualifying = (
        shipped.join(F.broadcast(red), shipped.l_partkey == red.p_partkey)
        .filter(F.col("qty_1996") > 0.5 * F.col("total_qty"))
        .select("l_suppkey")
    )
    return (
        nat_supp.join(qualifying, nat_supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# --- Q22: global sales opportunity ------------------------------------------------

_NATION_SET = "(1, 3, 5, 7, 9, 11, 13)"

_ORACLE_Q22 = f"""
SELECT c.c_nationkey AS cntrycode,
       COUNT(*) AS numcust,
       {sql_dsum('c.c_acctbal')} AS totacctbal
FROM customer c
WHERE c.c_nationkey IN {_NATION_SET}
  AND c.c_acctbal > (
    SELECT {sql_davg('c_acctbal')} FROM customer
    WHERE c_acctbal > 0.0 AND c_nationkey IN {_NATION_SET}
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2001-01-01'
  )
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
"""


@register("q_tpch_q22", oracle=_ORACLE_Q22)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): above-average-balance
    customers in a country set with no recent orders — scalar-average
    subquery + NOT EXISTS. c_nationkey stands in for the phone prefix;
    'no orders since 2001' keeps the anti join selective on this data
    (every customer has SOME order). Scale shape: the average is a 1-row
    broadcast (computed once from the filtered scan); NOT EXISTS is a
    LEFT ANTI hash join against the date-filtered orders projection —
    never a per-customer probe. The average and the balance sums are
    decimal-exact/deterministic-double, so the > boundary is stable."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nats = [1, 3, 5, 7, 9, 11, 13]

    in_set = customer.filter(F.col("c_nationkey").isin(nats))
    avg_bal = in_set.filter(F.col("c_acctbal") > 0.0).agg(
        davg(F.col("c_acctbal")).alias("_avg")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        in_set.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(recent, in_set.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
