"""Scalar-function surface (SURVEY §2.C): string, date/time, math, array
(incl. higher-order functions). Everything stays JVM-side / codegen-able —
no Python UDFs on this path.

Cross-engine hash-stability rules baked in here:
- integer-valued results cast to BIGINT on both sides (Spark year() is int,
  DuckDB's is bigint; Spark ceil() is long, DuckDB's is double),
- no log/pow in compared output (libm vs JVM differ in last ulp);
  sqrt/abs/round/floor/ceil are IEEE-exact and safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d_sparq_spark.registry import register
from d_sparq_spark.sources.tables import load_table

# --- q_scalar_string --------------------------------------------------------------

_ORACLE_STRING = """
SELECT c_custkey,
       lower(c_name)                                   AS name_lc,
       substring(c_name, 10, 9)                        AS id_part,
       concat_ws('|', c_mktsegment, c_name)            AS tagged,
       regexp_extract(c_name, '#(0*)([0-9]+)$', 2)     AS id_digits,
       CAST(length(c_name) AS BIGINT)                  AS name_len,
       CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS lev_building,
       trim(concat('  ', c_mktsegment, ' '))           AS trimmed
FROM customer
"""


@register("q_scalar_string", oracle=_ORACLE_STRING)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.lower("c_name").alias("name_lc"),
        F.substring("c_name", 10, 9).alias("id_part"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("tagged"),
        F.regexp_extract("c_name", r"#(0*)([0-9]+)$", 2).alias("id_digits"),
        F.length("c_name").cast("long").alias("name_len"),
        F.levenshtein(F.col("c_mktsegment"), F.lit("BUILDING")).cast("long").alias("lev_building"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("trimmed"),
    )


# --- q_scalar_date ------------------------------------------------------------------

_ORACLE_DATE = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT)    AS yr,
       CAST(month(o_orderdate) AS BIGINT)   AS mon,
       CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
       date_trunc('month', o_orderdate)     AS month_start,
       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS BIGINT)
                                            AS days_to_cutoff,
       CAST(epoch(o_orderdate) AS BIGINT)   AS epoch_s
FROM orders
"""


@register("q_scalar_date", oracle=_ORACLE_DATE)
def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("1998-12-01").cast("date"), F.col("o_orderdate"))
        .cast("long")
        .alias("days_to_cutoff"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


# --- q_scalar_math ------------------------------------------------------------------

_ORACLE_MATH = """
SELECT s_suppkey,
       abs(s_acctbal)                       AS abs_bal,
       round(s_acctbal, 1)                  AS round_bal,
       CAST(ceil(s_acctbal) AS BIGINT)      AS ceil_bal,
       CAST(floor(s_acctbal) AS BIGINT)     AS floor_bal,
       sqrt(abs(s_acctbal))                 AS sqrt_bal,
       s_suppkey % 7                        AS key_mod
FROM supplier
"""


@register("q_scalar_math", oracle=_ORACLE_MATH)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    return supplier.select(
        "s_suppkey",
        F.abs("s_acctbal").alias("abs_bal"),
        F.round("s_acctbal", 1).alias("round_bal"),
        F.ceil("s_acctbal").cast("long").alias("ceil_bal"),
        F.floor("s_acctbal").cast("long").alias("floor_bal"),
        F.sqrt(F.abs("s_acctbal")).alias("sqrt_bal"),
        (F.col("s_suppkey") % 7).alias("key_mod"),
    )


# --- q_scalar_array: split/explode + higher-order functions --------------------------

_ORACLE_ARRAY = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT)                    AS n_tokens,
       list_contains(toks, 'data')                  AS has_data,
       toks[1]                                      AS first_tok,
       CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS char_sum
FROM t
"""


@register("q_scalar_array", oracle=_ORACLE_ARRAY)
def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    documents = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.array_contains(toks, "data").alias("has_data"),
        toks.getItem(0).alias("first_tok"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("char_sum"),
    )


# --- q_explode: explode + re-aggregate (token frequencies) ----------------------------

_ORACLE_EXPLODE = """
SELECT tok, COUNT(*) AS freq
FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
GROUP BY tok
HAVING COUNT(*) >= 5
"""


@register("q_explode", oracle=_ORACLE_EXPLODE)
def q_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    documents = load_table(spark, sf_dir, "documents")
    return (
        documents.select(F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= 5)
    )
