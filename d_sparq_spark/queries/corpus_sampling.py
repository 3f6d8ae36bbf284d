"""Round-3 corpus/pipeline additions: exact-quota stratified sampling,
per-language top-k n-grams, and cohort retention — the three remaining
shapes a training-data pipeline runs constantly that the registry did not
yet cover as first-class oracled operators.

All three are pure built-in-function plans (no UDFs): sampling is a
window rank over a deterministic content hash, n-grams are higher-order
array functions, retention is two grouped aggregations over event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from d_sparq_spark.registry import register
from d_sparq_spark.sources.tables import load_table

# --- q_sample_stratified: exact 10% quota per language ----------------------
# q_sample_hash draws a ~rate sample (hash-prefix filter: zero shuffle but
# binomial-sized output). The stratified form guarantees an EXACT ceil(10%)
# quota per stratum: rank documents inside each language by content hash
# (deterministic, engine-independent) and keep the first ceil(n/10). At
# scale this is one shuffle by the stratum key — the window never sees a
# global sort, and the hash order makes reruns reproducible bit-for-bit.

_ORACLE_STRATIFIED = """
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT doc_id, lang FROM ranked WHERE rn <= CAST(ceil(n * 0.1) AS BIGINT)
"""


@register("q_sample_stratified", oracle=_ORACLE_STRATIFIED)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified sample: ceil(10%) of every language, chosen
    by deterministic content-hash order (reproducible across engines,
    reruns, and partitionings — unlike rand()-based sampleBy)."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5("text"), "doc_id")
    wc = Window.partitionBy("lang")
    ranked = docs.select(
        "doc_id",
        "lang",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    return ranked.filter(
        F.col("rn") <= F.ceil(F.col("n") * 0.1).cast("long")
    ).select("doc_id", "lang")


# --- q_ngram_topk: top-5 bigrams per language -------------------------------
# The vocabulary/contamination primitive: tokenize, form bigrams with
# higher-order array functions (JVM-side, no UDF), count, keep the top 5
# per language with a deterministic tie-break. At scale the bigram counts
# are a map-side-combinable groupBy and the top-k is a per-group window
# over the (small) distinct-bigram aggregate, never a global sort.

_ORACLE_NGRAM_TOPK = """
WITH toks AS (
  SELECT lang,
         list_filter(
           string_split_regex(lower(regexp_replace(text, '[^a-zA-Z0-9]+', ' ', 'g')), ' '),
           x -> x <> ''
         ) AS w
  FROM documents
),
bi AS (
  SELECT lang, w[i] || ' ' || w[i + 1] AS bigram
  FROM toks, UNNEST(range(1, len(w))) AS u(i)
  WHERE len(w) >= 2
),
cnt AS (
  SELECT lang, bigram, COUNT(*) AS n FROM bi GROUP BY lang, bigram
)
SELECT lang, bigram, n FROM (
  SELECT lang, bigram, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rk
  FROM cnt
) WHERE rk <= 5
"""


@register("q_ngram_topk", oracle=_ORACLE_NGRAM_TOPK)
def q_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 bigrams per language: tokenize -> higher-order-function
    bigrams -> count -> per-group top-k window with deterministic ties."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.filter(
        F.split(F.lower(F.regexp_replace("text", "[^a-zA-Z0-9]+", " ")), " "),
        lambda x: x != "",
    )
    toks = docs.select("lang", words.alias("w")).filter(F.size("w") >= 2)
    bi = toks.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - 2),
                lambda i: F.concat(
                    F.element_at("w", i + 1), F.lit(" "), F.element_at("w", i + 2)
                ),
            )
        ).alias("bigram"),
    )
    cnt = bi.groupBy("lang", "bigram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "bigram")
    return (
        cnt.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("lang", "bigram", "n")
    )


# --- q_retention_cohort: weekly cohort retention ----------------------------
# The engagement matrix every events pipeline reports: cohort = the week
# of a user's first event, cell = distinct users from that cohort active
# in each later week. Two grouped aggregations — first-seen per user
# (map-side combinable min), then distinct users per (cohort, week).
# Event ts is nanosecond-precision parquet that Spark reads at micros;
# date_trunc to week on BOTH engines before comparing (see q_join_range).

_ORACLE_RETENTION = """
WITH e AS (
  SELECT user_id,
         CAST(CAST(date_trunc('week', date_trunc('microseconds', ts)) AS DATE) AS VARCHAR) AS wk
  FROM events
),
first_seen AS (
  SELECT user_id, MIN(wk) AS cohort_wk FROM e GROUP BY user_id
)
SELECT f.cohort_wk, e.wk AS active_wk,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM e JOIN first_seen f USING (user_id)
GROUP BY f.cohort_wk, e.wk
"""


@register("q_retention_cohort", oracle=_ORACLE_RETENTION)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix over the events table."""
    # weeks serialize as 'YYYY-MM-DD' strings on both engines (a DuckDB
    # DATE round-trips through pandas as a midnight Timestamp otherwise)
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("week", F.col("ts")).cast("date").cast("string").alias("wk"),
    )
    first_seen = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        ev.join(first_seen, "user_id")
        .groupBy("cohort_wk", F.col("wk").alias("active_wk"))
        .agg(F.count_distinct("user_id").alias("n_users"))
    )
