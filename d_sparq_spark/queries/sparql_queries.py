"""End-to-end SPARQL queries through the full engine (parse -> plan ->
DataFrame), oracle-checked: each SPARQL text runs over the derived triples
view and must hash-match the equivalent relational SQL in DuckDB — i.e.
the engine's answers are verified against what the original relational
data says, not against itself.

Note the oracle for ex:acctbal mirrors the lexical round-trip
(printf -> string -> double) so both engines see bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d_sparq_spark.engine import SparqlEngine
from d_sparq_spark.registry import register
from d_sparq_spark.sources.derived_rdf import derive_triples_cached as derive_triples

_BAL = "CAST(printf('%.2f', c_acctbal) AS DOUBLE)"


def _run(spark: SparkSession, sf_dir: str, sparql: str) -> DataFrame:
    from d_sparq_spark.sources.derived_rdf import planning_stats_cached

    return SparqlEngine(
        derive_triples(spark, sf_dir),
        stats=planning_stats_cached(spark, sf_dir),
    ).query(sparql)


def _q(name: str, sparql: str, oracle: str) -> None:
    @register(name, oracle=oracle)
    def runner(spark: SparkSession, sf_dir: str, _s=sparql) -> DataFrame:
        return _run(spark, sf_dir, _s)

    runner.__doc__ = f"SPARQL:\n{sparql}"


_q(
    "q_sparql_star",
    'SELECT ?c ?name ?bal WHERE { ?c foaf:name ?name ; ex:acctbal ?bal ; '
    'ex:mktsegment "BUILDING" }',
    """
    SELECT 'c:' || c_custkey AS c, c_name AS name, printf('%.2f', c_acctbal) AS bal
    FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)

_q(
    "q_sparql_path",
    'SELECT ?c ?cname ?r WHERE { ?c ex:nation ?n ; foaf:name ?cname . '
    '?n ex:region ?r . ?r foaf:name "ASIA" }',
    """
    SELECT 'c:' || c_custkey AS c, c_name AS cname, 'r:' || r_regionkey AS r
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    """,
)

_q(
    "q_sparql_optional",
    'SELECT ?c ?seg ?big WHERE { ?c ex:mktsegment ?seg '
    "OPTIONAL { ?c ex:acctbal ?big FILTER(?big > 9000) } }",
    f"""
    SELECT 'c:' || c_custkey AS c, c_mktsegment AS seg,
           CASE WHEN {_BAL} > 9000 THEN printf('%.2f', c_acctbal) END AS big
    FROM customer
    """,
)

_q(
    "q_sparql_union",
    'SELECT ?name WHERE { { ?n rdf:type "Nation" . ?n foaf:name ?name } '
    'UNION { ?r rdf:type "Region" . ?r foaf:name ?name } }',
    """
    SELECT n_name AS name FROM nation
    UNION ALL
    SELECT r_name AS name FROM region
    """,
)

_q(
    "q_sparql_agg",
    "SELECT ?n (COUNT(*) AS ?n_cust) (AVG(?bal) AS ?avg_bal) "
    "WHERE { ?c ex:nation ?n ; ex:acctbal ?bal } GROUP BY ?n "
    "HAVING (?n_cust >= 5)",
    f"""
    SELECT 'n:' || c_nationkey AS n, COUNT(*) AS n_cust,
           CAST(SUM(CAST({_BAL} AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_bal
    FROM customer GROUP BY c_nationkey HAVING COUNT(*) >= 5
    """,
)

_q(
    "q_sparql_order_limit",
    "SELECT ?name ?bal WHERE { ?c foaf:name ?name ; ex:acctbal ?bal } "
    "ORDER BY DESC(xsd:double(?bal)) ?name LIMIT 10",
    f"""
    SELECT c_name AS name, printf('%.2f', c_acctbal) AS bal
    FROM customer ORDER BY {_BAL} DESC, c_name LIMIT 10
    """,
)

_q(
    "q_sparql_minus",
    'SELECT ?c WHERE { ?c rdf:type "Customer" MINUS { ?c ex:mktsegment "BUILDING" } }',
    """
    SELECT 'c:' || c_custkey AS c FROM customer WHERE c_mktsegment <> 'BUILDING'
    """,
)

_q(
    "q_sparql_not_exists",
    'SELECT ?c WHERE { ?c rdf:type "Customer" '
    'FILTER NOT EXISTS { ?c ex:mktsegment "BUILDING" } }',
    """
    SELECT 'c:' || c_custkey AS c FROM customer WHERE c_mktsegment <> 'BUILDING'
    """,
)

_q(
    "q_sparql_bind",
    "SELECT ?c ?lseg WHERE { ?c ex:mktsegment ?seg . BIND(LCASE(?seg) AS ?lseg) "
    'FILTER(STRSTARTS(?seg, "B")) }',
    """
    SELECT 'c:' || c_custkey AS c, lower(c_mktsegment) AS lseg
    FROM customer WHERE c_mktsegment LIKE 'B%'
    """,
)

_q(
    "q_sparql_values",
    'SELECT ?c ?seg WHERE { VALUES ?seg { "BUILDING" "MACHINERY" } '
    "?c ex:mktsegment ?seg }",
    """
    SELECT 'c:' || c_custkey AS c, c_mktsegment AS seg
    FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
)

_q(
    "q_sparql_distinct",
    "SELECT DISTINCT ?seg WHERE { ?c ex:mktsegment ?seg }",
    "SELECT DISTINCT c_mktsegment AS seg FROM customer",
)

_q(
    "q_sparql_ask",
    'ASK { ?c ex:mktsegment "BUILDING" }',
    "SELECT EXISTS(SELECT 1 FROM customer WHERE c_mktsegment = 'BUILDING') AS ask",
)

_q(
    "q_sparql_expr",
    "SELECT ?c ((?bal * 0.1) AS ?fee) WHERE { ?c ex:acctbal ?bal "
    "FILTER(?bal >= 1000 && ?bal < 2000) }",
    f"""
    SELECT 'c:' || c_custkey AS c, {_BAL} * 0.1 AS fee
    FROM customer WHERE {_BAL} >= 1000 AND {_BAL} < 2000
    """,
)


def _q_encoded(name: str, sparql: str, oracle: str) -> None:
    """Same SPARQL text, executed by EncodedSparqlEngine over the
    dictionary-encoded store (ID joins, decode at the edge) — D-SPARQ's
    actual execution model, end-to-end."""
    from d_sparq_spark.encoded_engine import EncodedSparqlEngine
    from d_sparq_spark.sources.derived_rdf import encoded_store_cached

    @register(name, oracle=oracle)
    def runner(spark: SparkSession, sf_dir: str, _s=sparql) -> DataFrame:
        from d_sparq_spark.sources.derived_rdf import (
            encoded_dict_meta_cached,
            encoded_planning_stats_cached,
        )

        enc, d = encoded_store_cached(spark, sf_dir)
        n_terms, plain = encoded_dict_meta_cached(spark, sf_dir)
        return EncodedSparqlEngine(
            enc, d, stats=encoded_planning_stats_cached(spark, sf_dir),
            dict_n_terms=n_terms, dict_plain=plain,
        ).query(_s)

    runner.__doc__ = f"SPARQL (encoded store):\n{sparql}"


_q_encoded(
    "q_sparql_encoded_star",
    'SELECT ?c ?name ?bal WHERE { ?c foaf:name ?name ; ex:acctbal ?bal ; '
    'ex:mktsegment "BUILDING" }',
    """
    SELECT 'c:' || c_custkey AS c, c_name AS name, printf('%.2f', c_acctbal) AS bal
    FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)

_q_encoded(
    "q_sparql_encoded_filter",
    "SELECT ?c ?bal WHERE { ?c ex:acctbal ?bal ; rdf:type \"Customer\" "
    "FILTER(?bal > 9000) }",
    """
    SELECT 'c:' || c_custkey AS c, printf('%.2f', c_acctbal) AS bal
    FROM customer WHERE CAST(printf('%.2f', c_acctbal) AS DOUBLE) > 9000
    """,
)


_q_encoded(
    "q_sparql_encoded_agg",
    "SELECT ?seg (COUNT(*) AS ?n) (MIN(?name) AS ?first) "
    "WHERE { ?c ex:mktsegment ?seg ; foaf:name ?name } GROUP BY ?seg",
    """
    SELECT c_mktsegment AS seg, COUNT(*) AS n, MIN(c_name) AS first
    FROM customer GROUP BY c_mktsegment
    """,
)


def _q_catalog(name: str, flavor: str, sparql: str, oracle: str) -> None:
    """Same engine, but planned against a StoreCatalog (VERDICT #6/#7):
    the translator routes qualifying stars through the materialized
    property table (zero joins) or per-pattern ExtVP semi-join reductions
    (smaller scans). Identical SPARQL text and oracle as the un-routed
    twin — the answers must not depend on the physical layout."""

    @register(name, oracle=oracle)
    def runner(spark: SparkSession, sf_dir: str, _s=sparql, _f=flavor) -> DataFrame:
        from d_sparq_spark.sources.derived_rdf import catalog_cached

        from d_sparq_spark.sources.derived_rdf import planning_stats_cached

        return SparqlEngine(
            derive_triples(spark, sf_dir),
            catalog=catalog_cached(spark, sf_dir, _f),
            stats=planning_stats_cached(spark, sf_dir),
        ).query(_s)

    runner.__doc__ = f"SPARQL ({flavor}-routed):\n{sparql}"


_STAR_SPARQL = (
    'SELECT ?c ?name ?bal WHERE { ?c foaf:name ?name ; ex:acctbal ?bal ; '
    'ex:mktsegment "BUILDING" }'
)
_STAR_ORACLE = """
SELECT 'c:' || c_custkey AS c, c_name AS name, printf('%.2f', c_acctbal) AS bal
FROM customer WHERE c_mktsegment = 'BUILDING'
"""

_q_catalog("q_sparql_star_pt", "pt", _STAR_SPARQL, _STAR_ORACLE)


@register("q_sparql_encoded_star_pt", oracle=_STAR_ORACLE)
def q_sparql_encoded_star_pt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full D-SPARQ execution model in one query: dictionary-encoded
    store + property-table routing (str(id) pivot columns, long cells) —
    the star is ONE encoded PT scan, then late decode at the edge."""
    from d_sparq_spark.encoded_engine import EncodedSparqlEngine
    from d_sparq_spark.sources.derived_rdf import (
        encoded_catalog_cached,
        encoded_store_cached,
    )

    from d_sparq_spark.sources.derived_rdf import (
        encoded_dict_meta_cached,
        encoded_planning_stats_cached,
    )

    enc, d = encoded_store_cached(spark, sf_dir)
    n_terms, plain = encoded_dict_meta_cached(spark, sf_dir)
    return EncodedSparqlEngine(
        enc, d, catalog=encoded_catalog_cached(spark, sf_dir),
        stats=encoded_planning_stats_cached(spark, sf_dir),
        dict_n_terms=n_terms, dict_plain=plain,
    ).query(_STAR_SPARQL)

# The ExtVP demo star is over nations: SS(foaf:name, ex:region) keeps the
# ~25 nation names out of the whole foaf:name slice (ratio ~0.0017 at
# sf0.1) — a reduction that stays strong at every SF, unlike customer-star
# reductions in this customer-dominated corpus (ratio -> 1 as SF grows).
_q_catalog(
    "q_sparql_star_extvp",
    "extvp",
    "SELECT ?n ?name ?r WHERE { ?n foaf:name ?name ; ex:region ?r }",
    """
    SELECT 'n:' || n_nationkey AS n, n_name AS name, 'r:' || n_regionkey AS r
    FROM nation
    """,
)


_ORACLE_UPDATE = """
SELECT 'rdf:type' AS p, (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM nation)
       + (SELECT COUNT(*) FROM region) AS n
UNION ALL SELECT 'foaf:name', (SELECT COUNT(*) FROM customer) + (SELECT COUNT(*) FROM nation)
       + (SELECT COUNT(*) FROM region)
UNION ALL SELECT 'ex:nation', (SELECT COUNT(*) FROM customer)
UNION ALL SELECT 'ex:acctbal', (SELECT COUNT(*) FROM customer)
UNION ALL SELECT 'ex:segment', (SELECT COUNT(*) FROM customer)
UNION ALL SELECT 'ex:region', (SELECT COUNT(*) FROM nation)
UNION ALL SELECT 'ex:next', (SELECT COUNT(*) FROM nation a
  WHERE EXISTS (SELECT 1 FROM nation b WHERE b.n_nationkey = a.n_nationkey + 1))
"""


@register("q_sparql_update", oracle=_ORACLE_UPDATE)
def q_sparql_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.1 Update end-to-end: a DELETE/INSERT WHERE rename of
    ex:mktsegment to ex:segment (functional update — new store DataFrame,
    anti-join + union, no full-store dedup), validated by per-predicate
    counts of the updated store against the relational source."""
    eng = SparqlEngine(derive_triples(spark, sf_dir), collect_stats=False)
    new = eng.update(
        "DELETE { ?c ex:mktsegment ?s } INSERT { ?c ex:segment ?s } "
        "WHERE { ?c ex:mktsegment ?s }"
    )
    return new.groupBy("p").agg(F.count(F.lit(1)).alias("n"))


_ORACLE_PT_STAR = """
SELECT 'c:' || c_custkey AS c, c_name AS name, printf('%.2f', c_acctbal) AS bal
FROM customer WHERE c_mktsegment = 'BUILDING'
"""


@register("q_star_property_table", oracle=_ORACLE_PT_STAR)
def q_star_property_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subject star answered from a materialized PROPERTY TABLE
    (groupBy(s).pivot(p) — the Spark analog of D-SPARQ's subject-grouped
    documents): zero joins, one scan + filter. Same results as the
    join-chain star (q_star_join)."""
    from d_sparq_spark.operators.rdf_patterns import (
        property_table,
        star_over_property_table,
    )
    from d_sparq_spark.sources.derived_rdf import derive_triples_cached

    pt = property_table(
        derive_triples_cached(spark, sf_dir),
        ["foaf:name", "ex:mktsegment", "ex:acctbal"],
    )
    return star_over_property_table(
        pt, {"foaf:name": "?name", "ex:acctbal": "?bal", "ex:mktsegment": "BUILDING"}, "c"
    )


@register(
    "q_sparql_typed",
    oracle="""
    SELECT 'c:' || c_custkey AS c, '"' || c_name || '"@en' AS n, c_name AS n_str
    FROM customer WHERE CAST(printf('%.2f', c_acctbal) AS DOUBLE) > 5000
    """,
)
def q_sparql_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed literals end-to-end (SURVEY §1.2): balances stored as
    '"…"^^xsd:decimal', names as '"…"@en'; the FILTER mixes a typed
    numeric comparison (value, not lexical) with LANG(); STR() strips the
    tag back to the lexical form."""
    from d_sparq_spark.sources.derived_rdf import derive_typed_triples

    return SparqlEngine(derive_typed_triples(spark, sf_dir), collect_stats=False).query(
        "SELECT ?c ?n (STR(?n) AS ?n_str) WHERE { ?c ex:bal ?b ; foaf:name ?n "
        'FILTER(?b > "5000"^^xsd:decimal && LANG(?n) = "en") }'
    )

_q(
    # GROUP BY expression (SPARQL 1.1 GroupCondition `(expr AS ?var)`,
    # grammar rule [20]): solutions extend with the computed key BEFORE
    # grouping (§18.2.4 step 1) — here customers group by market segment
    # crossed with the leading character of the acctbal literal ('-' for
    # negative balances, a digit otherwise).
    "q_sparql_group_expr",
    "SELECT ?seg ?d (COUNT(*) AS ?n) WHERE "
    "{ ?x ex:mktsegment ?seg ; ex:acctbal ?b } "
    "GROUP BY ?seg (SUBSTR(?b, 1, 1) AS ?d)",
    """
    SELECT c_mktsegment AS seg,
           substr(printf('%.2f', c_acctbal), 1, 1) AS d,
           COUNT(*) AS n
    FROM customer GROUP BY 1, 2
    """,
)


_ORACLE_UPDATE_GRAPH = """
WITH c AS (SELECT COUNT(*) n FROM customer),
     na AS (SELECT COUNT(*) n FROM nation),
     r AS (SELECT COUNT(*) n FROM region),
     nx AS (SELECT COUNT(*) n FROM nation a
            WHERE EXISTS (SELECT 1 FROM nation b WHERE b.n_nationkey = a.n_nationkey + 1))
SELECT * FROM (
  SELECT 'g:customer' AS g, 'rdf:type' AS p, n FROM c
  UNION ALL SELECT 'g:customer', 'foaf:name', n FROM c
  UNION ALL SELECT 'g:customer', 'ex:nation', n FROM c
  UNION ALL SELECT 'g:customer', 'ex:acctbal', n FROM c
  UNION ALL SELECT 'g:customer', 'ex:mktsegment', n FROM c
  UNION ALL SELECT 'g:nation', 'rdf:type', n FROM na
  UNION ALL SELECT 'g:nation', 'foaf:name', n FROM na
  UNION ALL SELECT 'g:nation', 'ex:region', n FROM na
  UNION ALL SELECT 'g:nation', 'ex:prev', n FROM nx
  UNION ALL SELECT 'g:region', 'rdf:type', n FROM r
  UNION ALL SELECT 'g:region', 'foaf:name', n FROM r
  UNION ALL SELECT 'g:archive', 'rdf:type', n FROM r
  UNION ALL SELECT 'g:archive', 'foaf:name', n FROM r
)
"""


@register("q_sparql_update_graph", oracle=_ORACLE_UPDATE_GRAPH)
def q_sparql_update_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL 1.1 Update named-graph surface end-to-end on the quad store
    (r6): WITH-scoped DELETE/INSERT renames ex:next to ex:prev inside
    g:nation only, then ADD copies g:region into a fresh g:archive —
    validated by per-(graph, predicate) counts against the relational
    source. Functional updates: each step returns a new quad relation."""
    from d_sparq_spark.sources.derived_rdf import derive_quads

    eng = SparqlEngine(derive_quads(spark, sf_dir), collect_stats=False)
    # each functional update embeds the previous relation's plan several
    # times (anti-join + union per template) — a chained pipeline must
    # truncate lineage between steps or the plan grows exponentially
    # (production would persist each version to the lakehouse anyway)
    step1 = eng.update(
        "WITH <g:nation> DELETE { ?n ex:next ?m } INSERT { ?n ex:prev ?m } "
        "WHERE { ?n ex:next ?m }"
    ).localCheckpoint(eager=False)
    step2 = SparqlEngine(step1, collect_stats=False).update(
        "ADD <g:nation> TO <g:archive>"
    ).localCheckpoint(eager=False)
    # empty g:archive entirely (DELETE WHERE matches every ?s ?p ?o in
    # the graph), then step4 rebuilds it from g:region — exercising
    # DELETE with a GRAPH block + all-variable pattern
    step3 = SparqlEngine(step2, collect_stats=False).update(
        "DELETE { GRAPH <g:archive> { ?s ?p ?o } } WHERE "
        "{ GRAPH <g:archive> { ?s ?p ?o } }"
    ).localCheckpoint(eager=False)
    step4 = SparqlEngine(step3, collect_stats=False).update(
        "ADD <g:region> TO <g:archive>"
    )
    return step4.groupBy("g", "p").agg(F.count(F.lit(1)).alias("n"))
