"""Inventory-completing harness queries (SURVEY §2.C rows not yet covered
elsewhere): all-table scans, CSV/JSON sources, map functions, grouping
sets, TF-IDF, DESCRIBE."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d_sparq_spark import TABLES
from d_sparq_spark.engine import SparqlEngine
from d_sparq_spark.functions.numeric import dsum, sql_dsum
from d_sparq_spark.operators.layout import sql_zorder_interleave, zorder_interleave
from d_sparq_spark.registry import register
from d_sparq_spark.sources.derived_rdf import derive_triples_cached
from d_sparq_spark.sources.tables import load_table

# --- q_scan_counts: every table scans ------------------------------------------

_ORACLE_SCANS = "\nUNION ALL\n".join(
    f"SELECT '{t}' AS tbl, COUNT(*) AS n FROM {t}" for t in TABLES
)


@register("q_scan_counts", oracle=_ORACLE_SCANS)
def q_scan_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one static agg per table (NOT a groupBy over a row union): an empty
    # table must still emit its n=0 row, exactly like the oracle's
    # per-table COUNT(*) — a group over zero rows emits nothing
    parts = [
        load_table(spark, sf_dir, t).agg(
            F.lit(t).alias("tbl"), F.count(F.lit(1)).alias("n")
        )
        for t in TABLES
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --- q_csv_source / q_json_source: non-parquet sources roundtrip ------------------

_ORACLE_NATION = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


@register("q_csv_source", oracle=_ORACLE_NATION)
def q_csv_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write nation out as CSV, read it back with an explicit schema —
    exercises the header/schema path of the CSV source."""
    path = os.path.join("/tmp", "d_sparq_csv_cache", os.path.basename(sf_dir.rstrip("/")))
    load_table(spark, sf_dir, "nation").write.mode("overwrite").option("header", True).csv(path)
    return spark.read.schema("n_nationkey int, n_name string, n_regionkey int").option(
        "header", True
    ).csv(path)


_ORACLE_SUPPLIER = "SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"


@register("q_json_source", oracle=_ORACLE_SUPPLIER)
def q_json_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink -> source roundtrip (doubles survive via shortest-
    roundtrip formatting)."""
    path = os.path.join("/tmp", "d_sparq_json_cache", os.path.basename(sf_dir.rstrip("/")))
    load_table(spark, sf_dir, "supplier").write.mode("overwrite").json(path)
    return spark.read.schema(
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
    ).json(path)


_ORACLE_REGION = "SELECT r_regionkey, r_name FROM region"


@register("q_orc_source", oracle=_ORACLE_REGION)
def q_orc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink -> source roundtrip (the columnar alternative to parquet;
    same pushdown/pruning machinery applies). Avro is NOT registered: the
    external spark-avro module isn't deployable in this offline
    environment — probed and gated, per the build mandate."""
    path = os.path.join("/tmp", "d_sparq_orc_cache", os.path.basename(sf_dir.rstrip("/")))
    load_table(spark, sf_dir, "region").select("r_regionkey", "r_name").write.mode(
        "overwrite"
    ).orc(path)
    return spark.read.orc(path)


@register("q_text_source", oracle="SELECT CAST(doc_id AS VARCHAR) || '\t' || lang AS value FROM documents")
def q_text_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text sink -> source roundtrip: one string column named `value` per
    line — the raw-line surface the N-Triples reader builds on."""
    path = os.path.join("/tmp", "d_sparq_text_cache", os.path.basename(sf_dir.rstrip("/")))
    load_table(spark, sf_dir, "documents").select(
        F.concat_ws("\t", F.col("doc_id").cast("string"), F.col("lang")).alias("value")
    ).write.mode("overwrite").text(path)
    return spark.read.text(path)


_ORACLE_BINARYFILE = """
SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
       sha256(text) AS digest
FROM documents WHERE doc_id < 20
"""


@register("q_binaryfile_source", oracle=_ORACLE_BINARYFILE)
def q_binaryfile_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile source — how media blobs actually enter a multimodal
    pipeline (one file per object, content as BINARY + path metadata).
    Fixture: the first 20 documents are materialized as individual .bin
    files (bounded driver-side write, load-phase work); the scan then
    recovers doc_id from the file name and digests the content JVM-side."""
    base = os.path.join(
        "/tmp", "d_sparq_bin_cache", os.path.basename(sf_dir.rstrip("/"))
    )
    # wholesale replace (like every write.mode('overwrite') cache in the
    # repo): stale doc_*.bin files from a previous fixture version would
    # still match the glob and surface as extra rows (review r4)
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    rows = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 20)
        .select("doc_id", "text")
        .collect()
    )
    for r in rows:
        with open(os.path.join(base, f"doc_{r['doc_id']}.bin"), "wb") as f:
            f.write(r["text"].encode("utf-8"))
    df = spark.read.format("binaryFile").option("pathGlobFilter", "*.bin").load(base)
    return df.select(
        F.regexp_extract(F.col("path"), r"doc_(\d+)\.bin$", 1).cast("long").alias("doc_id"),
        F.col("length").alias("byte_len"),
        F.sha2(F.col("content"), 256).alias("digest"),
    )


_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]

_ORACLE_PIVOT = """
SELECT c_nationkey,
       COUNT(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS "AUTOMOBILE",
       COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING')   AS "BUILDING",
       COUNT(*) FILTER (WHERE c_mktsegment = 'FURNITURE')  AS "FURNITURE",
       COUNT(*) FILTER (WHERE c_mktsegment = 'HOUSEHOLD')  AS "HOUSEHOLD",
       COUNT(*) FILTER (WHERE c_mktsegment = 'MACHINERY')  AS "MACHINERY"
FROM customer GROUP BY c_nationkey
"""


@register("q_pivot", oracle=_ORACLE_PIVOT)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with EXPLICIT values — the explicit list matters
    at scale: without it Spark runs a driver-side distinct collect over
    the pivot column first. Missing combinations fill 0 (DuckDB's
    filtered counts return 0, Spark's pivot nulls)."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey")
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _SEGMENTS)
    )


_ORACLE_UNPIVOT = """
SELECT s_suppkey, 'nationkey' AS metric, CAST(s_nationkey AS DOUBLE) AS val FROM supplier
UNION ALL
SELECT s_suppkey, 'acctbal', CAST(s_acctbal AS DOUBLE) FROM supplier
"""


@register("q_unpivot", oracle=_ORACLE_UNPIVOT)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt: wide columns -> (metric, val) rows. Pure narrow
    transformation — no shuffle at any scale."""
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.col("s_nationkey").cast("double").alias("nationkey"),
        F.col("s_acctbal").cast("double").alias("acctbal"),
    )
    return sup.unpivot("s_suppkey", ["nationkey", "acctbal"], "metric", "val")


_ORACLE_UDTF = """
WITH idx AS (
  SELECT doc_id, text,
         -- greatest(.., 0): empty text still yields ONE (empty) chunk,
         -- matching the UDTF's max(len, 1) guard (NB DuckDB // truncates
         -- toward zero, so (0-1)//100 = 0: the guard exists for the empty-
         -- text case producing zero chunks, not for a negative index)
         unnest(generate_series(0, greatest(CAST((length(text) - 1) // 100 AS BIGINT), 0))) AS chunk_idx
  FROM documents
)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       substr(text, CAST(chunk_idx * 100 + 1 AS INT), 100) AS chunk
FROM idx
"""


@register("q_udtf_chunks", oracle=_ORACLE_UDTF)
def q_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): one input row -> many output rows through a
    LATERAL join — the table-function surface SURVEY §2.C names. Chunking
    as the representative (same semantics as the HOF-based q_doc_chunks
    but stride == size, no overlap); the HOF form stays the scale
    recommendation — this exercises the UDTF execution path."""
    from d_sparq_spark.functions.pandas_udfs import ChunkUdtf

    spark.udtf.register("chunk_udtf", ChunkUdtf)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf_src")
    return spark.sql(
        "SELECT s.doc_id, f.chunk_idx, f.chunk "
        "FROM docs_udtf_src s, LATERAL chunk_udtf(s.text) f"
    )


# --- skew-mitigation operators (operators/skew.py) --------------------------------

_ORACLE_PRED_SALTED = """
SELECT 'rdf:type' AS p, (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM nation)
       + (SELECT COUNT(*) FROM region) AS cnt
UNION ALL SELECT 'foaf:name', (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM nation)
       + (SELECT COUNT(*) FROM region)
UNION ALL SELECT 'ex:nation', (SELECT COUNT(*) FROM customer)
UNION ALL SELECT 'ex:acctbal', (SELECT COUNT(*) FROM customer)
UNION ALL SELECT 'ex:mktsegment', (SELECT COUNT(*) FROM customer)
UNION ALL SELECT 'ex:region', (SELECT COUNT(*) FROM nation)
UNION ALL SELECT 'ex:next', (SELECT COUNT(*) FROM nation a
  WHERE EXISTS (SELECT 1 FROM nation b WHERE b.n_nationkey = a.n_nationkey + 1))
"""


@register("q_pred_stats_salted", oracle=_ORACLE_PRED_SALTED)
def q_pred_stats_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate statistics via two-phase SALTED aggregation — the 100 TB
    form of A11 (rdf:type-style hot keys spread over 32 salt buckets in
    phase 1, tiny phase-2 merge). Result equals the plain groupBy."""
    from d_sparq_spark.operators.skew import salted_count_by_key

    return salted_count_by_key(derive_triples_cached(spark, sf_dir), ["p"])


_ORACLE_JOIN_SALTED = """
SELECT n_name, COUNT(*) AS n_cust, {S} AS bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""".format(S=sql_dsum("c_acctbal"))


@register("q_join_salted", oracle=_ORACLE_JOIN_SALTED)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed-left join WITHOUT shuffling the big side: customer is salted
    per row, nation replicated across the salt range and broadcast —
    row multiplicity provably unchanged (oracle = the plain join)."""
    from d_sparq_spark.operators.skew import salted_broadcast_left

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"), "c_acctbal"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nk"), "n_name"
    )
    joined = salted_broadcast_left(cust, nat, "nk", salt_buckets=8)
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_cust"), dsum(F.col("c_acctbal")).alias("bal")
    )


# --- q_scalar_map: MapType surface ------------------------------------------------

_ORACLE_MAP = """
SELECT event_id,
       array_to_string(json_keys(props), ',') AS keys_csv,
       CAST(props->>'k' AS BIGINT) AS k_val,
       CAST(len(json_keys(props)) AS BIGINT) AS n_keys
FROM events
"""


@register("q_scalar_map", oracle=_ORACLE_MAP)
def q_scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return ev.select(
        "event_id",
        F.concat_ws(",", F.map_keys(m)).alias("keys_csv"),
        F.element_at(m, "k").alias("k_val"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
    )


# --- q_agg_grouping_sets -----------------------------------------------------------

_GS = """
SELECT c_mktsegment, c_nationkey, COUNT(*) AS n, {S} AS bal
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment, c_nationkey), (c_mktsegment), ())
"""


@register("q_agg_grouping_sets", oracle=_GS.format(S=sql_dsum("c_acctbal")))
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    # sql_dsum is valid Spark SQL too — one recipe for both engines, so a
    # future DEC widening can't silently fork the two sides (review r4)
    return spark.sql(_GS.format(S=sql_dsum("c_acctbal")))


# --- q_tfidf: classic TF-IDF via pure DataFrame ops --------------------------------
# ln() can differ by 1 ulp across engines; round(,6) absorbs it (the judge-
# facing exact variants avoid transcendentals entirely — this one documents
# the accepted tolerance).

_ORACLE_TFIDF = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY doc_id, tok),
df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY tok),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT tf.doc_id, tf.tok,
       round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
FROM tf JOIN df USING (tok) CROSS JOIN n
WHERE df.df < (SELECT n_docs FROM n)
"""


@register("q_tfidf", oracle=_ORACLE_TFIDF)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()  # driver-side scalar: one number, not data
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("tok").agg(F.countDistinct("doc_id").alias("df"))
    return (
        tf.join(df, "tok")
        .filter(F.col("df") < n_docs)
        .select(
            "doc_id",
            "tok",
            F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("tfidf"),
        )
    )


# --- q_sparql_describe --------------------------------------------------------------

_ORACLE_DESCRIBE = """
SELECT 'n:3' AS s, 'rdf:type' AS p, 'Nation' AS o
UNION ALL SELECT 'n:3', 'foaf:name', n_name FROM nation WHERE n_nationkey = 3
UNION ALL SELECT 'n:3', 'ex:region', 'r:' || n_regionkey FROM nation WHERE n_nationkey = 3
UNION ALL SELECT 'n:3', 'ex:next', 'n:4' WHERE 4 IN (SELECT n_nationkey FROM nation)
"""


@register("q_sparql_describe", oracle=_ORACLE_DESCRIBE)
def q_sparql_describe(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = SparqlEngine(derive_triples_cached(spark, sf_dir), collect_stats=False)
    return eng.query("DESCRIBE n:3")


_ORACLE_DESCRIBE_WHERE = """
SELECT 'n:' || n_nationkey AS s, 'rdf:type' AS p, 'Nation' AS o FROM nation WHERE n_regionkey = 1
UNION ALL SELECT 'n:' || n_nationkey, 'foaf:name', n_name FROM nation WHERE n_regionkey = 1
UNION ALL SELECT 'n:' || n_nationkey, 'ex:region', 'r:1' FROM nation WHERE n_regionkey = 1
UNION ALL SELECT 'n:' || n_nationkey, 'ex:next', 'n:' || (n_nationkey + 1)
          FROM nation WHERE n_regionkey = 1
          AND n_nationkey + 1 IN (SELECT n_nationkey FROM nation)
"""


@register("q_sparql_describe_where", oracle=_ORACLE_DESCRIBE_WHERE)
def q_sparql_describe_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE ?var WHERE — description set driven by bindings (CBD; the
    bnode expansion is exercised in goldens, the derived view has none)."""
    eng = SparqlEngine(derive_triples_cached(spark, sf_dir), collect_stats=False)
    return eng.query("DESCRIBE ?n WHERE { ?n ex:region r:1 }")


_ZBITS = 15  # l_partkey/l_suppkey fit well under 2^15 at driver scales
_ZSHIFT = 14  # z >> shift = fixed-width bucket id (single point of change)
_ORACLE_ZORDER = f"""
WITH z AS (
  SELECT l_partkey, l_suppkey,
         {sql_zorder_interleave('l_partkey', 'l_suppkey', _ZBITS)} AS zv
  FROM lineitem
)
SELECT zv >> {_ZSHIFT} AS zbucket,
       COUNT(*) AS n_rows,
       MIN(l_partkey) AS min_part, MAX(l_partkey) AS max_part,
       MIN(l_suppkey) AS min_supp, MAX(l_suppkey) AS max_supp
FROM z GROUP BY zbucket
"""


@register("q_zorder_layout", oracle=_ORACLE_ZORDER)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering profile of lineitem on
    (l_partkey, l_suppkey): rows land in fixed-width z buckets, and the
    per-bucket min/max of BOTH keys is what file-level statistics would
    record after a Z-ORDER rewrite — each bucket covers a narrow
    rectangle, so filters on either key prune. At scale the bucket id is
    the repartitionByRange key for the layout rewrite (range partition
    on z, no global window anywhere); this query is the bucket-profile
    inspection, a two-level hash aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    z = li.select(
        "l_partkey",
        "l_suppkey",
        zorder_interleave(F.col("l_partkey"), F.col("l_suppkey"), _ZBITS).alias("zv"),
    )
    return z.groupBy(F.shiftright(F.col("zv"), _ZSHIFT).alias("zbucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_partkey").alias("min_part"),
        F.max("l_partkey").alias("max_part"),
        F.min("l_suppkey").alias("min_supp"),
        F.max("l_suppkey").alias("max_supp"),
    )


_ORACLE_HISTOGRAM = """
WITH b AS (
  SELECT CAST(least(floor(o_totalprice / 25000), 19) AS BIGINT) AS bucket
  FROM orders
)
SELECT bucket, COUNT(*) AS n_orders FROM b GROUP BY bucket
"""


@register("q_histogram", oracle=_ORACLE_HISTOGRAM)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (20 buckets of 25k, top
    bucket open). Binning is floor-division arithmetic — IEEE-identical
    on both engines (width_bucket exists only on the Spark side) — and
    the count is a bounded-key hash agg: the histogram of a 100 TB table
    shuffles at most n_buckets rows per map task."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.least(F.floor(F.col("o_totalprice") / 25000), F.lit(19))
            .cast("long")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


_ORACLE_DQ = """
SELECT 'lineitem_orphan_orderkey' AS check_name,
       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
         (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_violations
UNION ALL
SELECT 'orders_orphan_custkey',
       (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
         (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'customer_dup_custkey',
       (SELECT COUNT(*) FROM
         (SELECT c_custkey FROM customer GROUP BY c_custkey HAVING COUNT(*) > 1))
UNION ALL
SELECT 'orders_null_orderdate',
       (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL)
UNION ALL
SELECT 'lineitem_nonpositive_qty',
       (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 0)
"""


@register("q_dq_audit", oracle=_ORACLE_DQ)
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit — the dbt-test / Deequ-style constraint sweep a
    production pipeline runs before publishing a snapshot: referential
    integrity (anti-join counts), key uniqueness, null and range checks,
    one row per constraint. Scale shape: each check is an independent
    aggregate over one scan (checks on the same table share it via scan
    reuse); anti-joins key on the join column only."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"), F.count(F.lit(1)).alias("n_violations")
        )

    checks = [
        one(
            "lineitem_orphan_orderkey",
            lineitem.select("l_orderkey").join(
                orders.select("o_orderkey"),
                lineitem.l_orderkey == orders.o_orderkey,
                "left_anti",
            ),
        ),
        one(
            "orders_orphan_custkey",
            orders.select("o_custkey").join(
                customer.select("c_custkey"),
                orders.o_custkey == customer.c_custkey,
                "left_anti",
            ),
        ),
        one(
            "customer_dup_custkey",
            customer.groupBy("c_custkey").count().filter(F.col("count") > 1),
        ),
        one("orders_null_orderdate", orders.filter(F.col("o_orderdate").isNull())),
        one("lineitem_nonpositive_qty", lineitem.filter(F.col("l_quantity") <= 0)),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


# --- q_schema_evolution: mergeSchema over heterogeneous parquet parts -------------

_ORACLE_SCHEMA_EVOLUTION = """
SELECT doc_id, lang,
       CASE WHEN doc_id % 2 = 1 THEN n_chars END AS n_chars
FROM documents
"""


@register("q_schema_evolution", oracle=_ORACLE_SCHEMA_EVOLUTION)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution at the source: a dataset whose early files lack a
    later-added column must read as one relation with NULLs where the
    column predates its introduction — the contract every long-lived
    100 TB dataset depends on (columns get added; history is not
    rewritten). Fixture: even docs written WITHOUT n_chars, odd docs
    WITH it; spark.read.option('mergeSchema', true) unions the footers.
    Scale note: mergeSchema reads every file footer at planning — on a
    million-file dataset pin the schema explicitly instead; this query
    exercises the evolution semantics, not the discovery cost."""
    import shutil

    docs = load_table(spark, sf_dir, "documents")
    base = os.path.join(
        "/tmp", "d_sparq_evo_cache", os.path.basename(sf_dir.rstrip("/"))
    )
    shutil.rmtree(base, ignore_errors=True)  # wholesale replace, like every cache here
    docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.parquet(
        os.path.join(base, "v1")
    )
    docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "n_chars"
    ).write.parquet(os.path.join(base, "v2"))
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(os.path.join(base, "v1"), os.path.join(base, "v2"))
        .select("doc_id", "lang", "n_chars")
    )
