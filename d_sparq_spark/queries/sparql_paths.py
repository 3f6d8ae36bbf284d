"""Harness queries for property paths, CONSTRUCT, subqueries (SURVEY §2.B
B14/B15/B16) over the derived triples view. The ex:next successor chain on
nation keys makes p+ exactly the i<j key pairs — an exact SQL oracle for a
fixpoint computation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from d_sparq_spark.engine import SparqlEngine
from d_sparq_spark.registry import register
from d_sparq_spark.sources.derived_rdf import derive_triples_cached as derive_triples


def _q(name: str, sparql: str, oracle: str) -> None:
    @register(name, oracle=oracle)
    def runner(spark: SparkSession, sf_dir: str, _s=sparql) -> DataFrame:
        from d_sparq_spark.sources.derived_rdf import planning_stats_cached

        return SparqlEngine(
            derive_triples(spark, sf_dir),
            stats=planning_stats_cached(spark, sf_dir),
        ).query(_s)

    runner.__doc__ = f"SPARQL:\n{sparql}"


_q(
    "q_sparql_path_plus",
    "SELECT ?x ?y WHERE { ?x ex:next+ ?y }",
    """
    SELECT 'n:' || a.n_nationkey AS x, 'n:' || b.n_nationkey AS y
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    """,
)

_q(
    # bound-endpoint closure: evaluated by the SEEDED frontier fixpoint
    # (paths.seeded_closure — state O(reachable-from-n:3), not the whole
    # chain's closure); the oracle is a genuine recursive CTE, not the
    # consecutive-keys shortcut, so it checks the fixpoint itself.
    "q_sparql_path_plus_bound",
    "SELECT ?y WHERE { n:3 ex:next+ ?y }",
    """
    WITH RECURSIVE edges AS (
      SELECT n_nationkey AS src, n_nationkey + 1 AS dst FROM nation
      WHERE n_nationkey + 1 IN (SELECT n_nationkey FROM nation)
    ), reach(k) AS (
      SELECT dst FROM edges WHERE src = 3
      UNION
      SELECT e.dst FROM reach r JOIN edges e ON e.src = r.k
    )
    SELECT 'n:' || k AS y FROM reach
    """,
)

_q(
    # reverse-bound closure: `?x p+ <const>` seeds the fixpoint from the
    # OBJECT side over reversed edges.
    "q_sparql_path_plus_bound_rev",
    "SELECT ?x WHERE { ?x ex:next+ n:3 }",
    """
    WITH RECURSIVE edges AS (
      SELECT n_nationkey AS src, n_nationkey + 1 AS dst FROM nation
      WHERE n_nationkey + 1 IN (SELECT n_nationkey FROM nation)
    ), reach(k) AS (
      SELECT src FROM edges WHERE dst = 3
      UNION
      SELECT e.src FROM reach r JOIN edges e ON e.dst = r.k
    )
    SELECT 'n:' || k AS x FROM reach
    """,
)

_q(
    "q_sparql_path_seq",
    "SELECT ?c ?r WHERE { ?c ex:nation/ex:region ?r }",
    """
    SELECT 'c:' || c_custkey AS c, 'r:' || n_regionkey AS r
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)

_q(
    "q_sparql_path_alt",
    "SELECT ?s ?o WHERE { ?s (ex:mktsegment|ex:region) ?o }",
    """
    SELECT 'c:' || c_custkey AS s, c_mktsegment AS o FROM customer
    UNION ALL
    SELECT 'n:' || n_nationkey, 'r:' || n_regionkey FROM nation
    """,
)

_q(
    "q_sparql_path_inv",
    "SELECT ?n ?cname WHERE { ?n ^ex:nation ?c . ?c foaf:name ?cname }",
    "SELECT 'n:' || c_nationkey AS n, c_name AS cname FROM customer",
)

_q(
    "q_sparql_path_neg",
    "SELECT ?s ?o WHERE { ?s !(rdf:type|foaf:name|ex:nation|ex:acctbal|ex:mktsegment) ?o }",
    """
    SELECT 'n:' || n_nationkey AS s, 'r:' || n_regionkey AS o FROM nation
    UNION ALL
    SELECT 'n:' || n_nationkey, 'n:' || (n_nationkey + 1) FROM nation
    WHERE n_nationkey + 1 IN (SELECT n_nationkey FROM nation)
    """,
)

_q(
    "q_sparql_path_opt",
    "SELECT ?x ?y WHERE { ?x ex:next? ?y }",
    """
    WITH e AS (
      SELECT 'n:' || n_nationkey AS src, 'n:' || (n_nationkey + 1) AS dst
      FROM nation WHERE n_nationkey + 1 IN (SELECT n_nationkey FROM nation)
    ),
    nodes AS (SELECT src AS n FROM e UNION SELECT dst FROM e)
    SELECT x, y FROM (
      SELECT src AS x, dst AS y FROM e
      UNION
      SELECT n, n FROM nodes
    )
    """,
)

_q(
    "q_sparql_path_altcomplex",
    "SELECT ?c ?n WHERE { ?c (foaf:name|ex:nation/foaf:name) ?n . ?c rdf:type Customer }",
    """
    SELECT 'c:' || c_custkey AS c, c_name AS n FROM customer
    UNION ALL
    SELECT 'c:' || c_custkey, n_name
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    """,
)

_q(
    "q_sparql_path_closure_seq",
    "SELECT ?x ?y WHERE { ?x (ex:next/ex:next)+ ?y }",
    """
    SELECT 'n:' || a.n_nationkey AS x, 'n:' || b.n_nationkey AS y
    FROM nation a JOIN nation b
      ON b.n_nationkey > a.n_nationkey
     AND (b.n_nationkey - a.n_nationkey) % 2 = 0
    """,
)

_q(
    "q_sparql_expr_fns",
    "SELECT ?c ?sub ?h WHERE { ?c ex:mktsegment ?seg . "
    'BIND(SUBSTR(?seg, 1, 3) AS ?sub) BIND(MD5(?seg) AS ?h) }',
    """
    SELECT 'c:' || c_custkey AS c, substr(c_mktsegment, 1, 3) AS sub,
           md5(c_mktsegment) AS h
    FROM customer
    """,
)

_q(
    "q_sparql_construct",
    "CONSTRUCT { ?c ex:inSegment ?seg } WHERE { ?c ex:mktsegment ?seg }",
    """
    SELECT DISTINCT 'c:' || c_custkey AS s, 'ex:inSegment' AS p, c_mktsegment AS o
    FROM customer
    """,
)

_q(
    "q_sparql_subquery",
    "SELECT ?c ?name WHERE { ?c foaf:name ?name . "
    "{ SELECT ?c WHERE { ?c ex:acctbal ?b } "
    "ORDER BY DESC(xsd:double(?b)) ?c LIMIT 5 } }",
    """
    SELECT 'c:' || c_custkey AS c, c_name AS name
    FROM customer
    ORDER BY CAST(printf('%.2f', c_acctbal) AS DOUBLE) DESC, 'c:' || c_custkey
    LIMIT 5
    """,
)


_ORACLE_SERVICE = """
SELECT s_name AS sname
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_regionkey = 1
"""


@register("q_sparql_service", oracle=_ORACLE_SERVICE)
def q_sparql_service(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SERVICE federation: the supplier store is a separate 'endpoint'
    registered under ex:suppliers; the federated join is a Catalyst join
    between the two stores' bindings."""
    from pyspark.sql import functions as F

    from d_sparq_spark.sources.tables import load_table

    sup = load_table(spark, sf_dir, "supplier")
    s_s = F.concat(F.lit("s:"), F.col("s_suppkey").cast("string"))
    remote = sup.select(
        F.explode(
            F.array(
                F.struct(s_s.alias("s"), F.lit("foaf:name").alias("p"), F.col("s_name").alias("o")),
                F.struct(
                    s_s.alias("s"),
                    F.lit("ex:nation").alias("p"),
                    F.concat(F.lit("n:"), F.col("s_nationkey").cast("string")).alias("o"),
                ),
            )
        ).alias("tr")
    ).select("tr.s", "tr.p", "tr.o")
    eng = SparqlEngine(
        derive_triples(spark, sf_dir), collect_stats=False,
        services={"ex:suppliers": remote},
    )
    return eng.query(
        "SELECT ?sname WHERE { ?n ex:region r:1 . "
        "SERVICE ex:suppliers { ?s ex:nation ?n . ?s foaf:name ?sname } }"
    )


def _q_quads(name: str, sparql: str, oracle: str) -> None:
    from d_sparq_spark.sources.derived_rdf import derive_quads

    @register(name, oracle=oracle)
    def runner(spark: SparkSession, sf_dir: str, _s=sparql) -> DataFrame:
        return SparqlEngine(derive_quads(spark, sf_dir), collect_stats=False).query(_s)

    runner.__doc__ = f"SPARQL (quad store):\n{sparql}"


def _q_quads_enc(name: str, sparql: str, oracle: str) -> None:
    from d_sparq_spark.encoded_engine import EncodedSparqlEngine
    from d_sparq_spark.sources.derived_rdf import encoded_quad_store_cached

    @register(name, oracle=oracle)
    def runner(spark: SparkSession, sf_dir: str, _s=sparql) -> DataFrame:
        enc, d = encoded_quad_store_cached(spark, sf_dir)
        return EncodedSparqlEngine(enc, d, collect_stats=False).query(_s)

    runner.__doc__ = f"SPARQL (encoded quad store):\n{sparql}"


_q_quads_enc(
    "q_sparql_graph_enc",
    'SELECT ?name WHERE { GRAPH "g:nation" { ?n foaf:name ?name } }',
    "SELECT n_name AS name FROM nation",
)

_q_quads_enc(
    "q_sparql_graph_var_enc",
    "SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s foaf:name ?o } } GROUP BY ?g",
    """
    SELECT 'g:customer' AS g, COUNT(*) AS n FROM customer
    UNION ALL SELECT 'g:nation', COUNT(*) FROM nation
    UNION ALL SELECT 'g:region', COUNT(*) FROM region
    """,
)


_q_quads(
    "q_sparql_graph",
    'SELECT ?name WHERE { GRAPH "g:nation" { ?n foaf:name ?name } }',
    "SELECT n_name AS name FROM nation",
)

_q_quads(
    # property path under GRAPH ?g: ONE plan — the closure fixpoint takes g
    # as a group column (operators/paths.py), no per-graph driver loop. The
    # ex:next chain lives entirely in g:nation, so the answer is that
    # graph's closure; cross-graph non-composition is pinned by the
    # two-graph golden in tests/test_sparql_paths.py.
    "q_sparql_graph_path",
    "SELECT ?g ?x ?y WHERE { GRAPH ?g { ?x ex:next+ ?y } }",
    """
    SELECT 'g:nation' AS g, 'n:' || a.n_nationkey AS x, 'n:' || b.n_nationkey AS y
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    """,
)

_q_quads_enc(
    # the same grouped closure on the ENCODED quad store: edges are long
    # IDs, the graph rides as one more long group column, decode at the end
    "q_sparql_graph_path_enc",
    "SELECT ?g ?x ?y WHERE { GRAPH ?g { ?x ex:next+ ?y } }",
    """
    SELECT 'g:nation' AS g, 'n:' || a.n_nationkey AS x, 'n:' || b.n_nationkey AS y
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    """,
)

_q_quads(
    # seeded closure under GRAPH ?g: ?x is bound by the same-graph star
    # first, so the fixpoint seeds are (g, x) PAIRS — reachability stays
    # inside each seed's own graph (paths.seeded_closure group_col).
    "q_sparql_graph_path_seeded",
    "SELECT ?g ?x ?y WHERE { GRAPH ?g { ?x ex:region r:1 . ?x ex:next+ ?y } }",
    """
    SELECT 'g:nation' AS g, 'n:' || a.n_nationkey AS x, 'n:' || b.n_nationkey AS y
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE a.n_regionkey = 1
    """,
)

_q_quads(
    "q_sparql_graph_var",
    "SELECT ?g (COUNT(*) AS ?n) WHERE { GRAPH ?g { ?s foaf:name ?o } } GROUP BY ?g",
    """
    SELECT 'g:customer' AS g, COUNT(*) AS n FROM customer
    UNION ALL SELECT 'g:nation', COUNT(*) FROM nation
    UNION ALL SELECT 'g:region', COUNT(*) FROM region
    """,
)


# ---- closures on a NON-TOY graph (VERDICT r3 #5) -------------------------
# The derived ex:next chain is 25 nodes — driver rounds dominate and the
# seeded frontier can't show its win. These run the same engine path over
# the deterministic synthetic chain graph (sources/synth_graph.py: ~1.18M
# edges at sf0.1, ~5-6 closure pairs per edge), oracle-checked because the
# generator is pure integer arithmetic DuckDB reproduces exactly.

from pyspark.sql import functions as F  # noqa: E402

from d_sparq_spark.sources.synth_graph import (  # noqa: E402
    BLOCK,
    synth_blocks_for,
    synth_chain_edges_int,
    synth_chain_triples,
    synth_closure_oracle_sql,
)


@register("q_sparql_path_plus_big", oracle=synth_closure_oracle_sql(seeded=False))
def q_sparql_path_plus_big(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbound p+ over the synthetic chain graph — the doubling closure at
    real shuffle volume (~6.8M pairs at sf0.1). Output: closure pair count
    per source block (checkable without shipping millions of pairs to the
    compare harness)."""
    store = synth_chain_triples(spark, synth_blocks_for(spark, sf_dir))
    pairs = SparqlEngine(store, collect_stats=False).query(
        "SELECT ?x ?y WHERE { ?x ex:next+ ?y }"
    )
    return (
        pairs.select(F.expr(f"cast(substring(x, 2) as bigint) div {BLOCK}").alias("blk"))
        .groupBy("blk")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register("q_sparql_path_plus_big_seeded", oracle=synth_closure_oracle_sql(seeded=True))
def q_sparql_path_plus_big_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bound p+ on the same graph: ~1 block in 2560 carries an ex:seed
    mark, so the closure runs as the SEEDED strided frontier — state
    O(reachable-from-seeds), the scale case where seeded must beat the
    doubling closure by construction (BENCH_r04 records the band)."""
    store = synth_chain_triples(spark, synth_blocks_for(spark, sf_dir))
    return SparqlEngine(store, collect_stats=False).query(
        "SELECT ?x ?y WHERE { ?x ex:seed ?s . ?x ex:next+ ?y }"
    )


@register("q_closure_big_int", oracle=synth_closure_oracle_sql(seeded=False))
def q_closure_big_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME 1.18M-edge closure as q_sparql_path_plus_big, but over
    LONG node ids instead of the lexical engine's 'n<id>' strings —
    operator-level twin quantifying what dictionary encoding buys the
    heaviest iterative operator (measured 0.76x; every doubling round
    shuffles 8-byte keys instead of strings). Same oracle: the recursive
    CTE derives blk from integer division either way."""
    from d_sparq_spark.operators.paths import transitive_closure

    edges = synth_chain_edges_int(spark, synth_blocks_for(spark, sf_dir))
    return (
        transitive_closure(edges)
        .select(F.expr(f"src div {BLOCK}").alias("blk"))
        .groupBy("blk")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# hub / power-law closure twins (r5): the graph whose 2-hop composition
# blows past the stride growth cap (sum S_j^2 ~ 22x|E|), proving the
# cap branch discards the exploded relation instead of adopting it.

from d_sparq_spark.sources.synth_graph import (  # noqa: E402
    BLOCKH,
    synth_hub_closure_oracle_sql,
    synth_hub_triples,
    synth_hubs_for,
)


@register("q_sparql_path_plus_hub", oracle=synth_hub_closure_oracle_sql(seeded=False))
def q_sparql_path_plus_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbound p+ over the hub graph (sources/synth_graph.py hub variant):
    every in-spoke reaches every out-spoke through its hub, so the
    closure is sum S_j^2 pairs — the doubling closure's worst shape per
    edge. Output: pair counts per hub slot."""
    store = synth_hub_triples(spark, synth_hubs_for(spark, sf_dir))
    pairs = SparqlEngine(store, collect_stats=False).query(
        "SELECT ?x ?y WHERE { ?x ex:next+ ?y }"
    )
    return (
        pairs.select(F.expr(f"cast(substring(x, 2) as bigint) div {BLOCKH}").alias("hub"))
        .groupBy("hub")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "q_sparql_path_plus_hub_seeded",
    oracle=synth_hub_closure_oracle_sql(seeded=True),
)
def q_sparql_path_plus_hub_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bound p+ on the hub graph: ~1% of in-spokes carry ex:seed. The
    seeded walk probes the cap branch directly — the edge set is small
    enough for the upfront stride build, whose first composition exceeds
    8x|E| and must be DISCARDED (paths.py growth guard); the walk then
    finishes on raw single-hops. Exact (x, y) pairs, hash-checked."""
    store = synth_hub_triples(spark, synth_hubs_for(spark, sf_dir))
    return SparqlEngine(store, collect_stats=False).query(
        "SELECT ?x ?y WHERE { ?x ex:seed ?s . ?x ex:next+ ?y }"
    )

_q(
    # solution modifiers on CONSTRUCT (grammar [10]: ConstructQuery carries
    # a full SolutionModifier): ORDER BY + LIMIT select WHICH solutions
    # instantiate the template — the 10 lexically-largest BUILDING
    # balances. The ORDER BY key is the acctbal literal (a plain string,
    # so LEXICAL order — identical bytewise in Spark and DuckDB), with the
    # subject as a deterministic tie-break.
    "q_sparql_construct_ordered",
    'CONSTRUCT { ?c ex:topbal ?b } WHERE { ?c ex:acctbal ?b ; '
    'ex:mktsegment "BUILDING" } ORDER BY DESC(?b) ?c LIMIT 10',
    """
    WITH sol AS (
      SELECT 'c:' || c_custkey AS c, printf('%.2f', c_acctbal) AS b
      FROM customer WHERE c_mktsegment = 'BUILDING'
      ORDER BY b DESC, c LIMIT 10
    )
    SELECT DISTINCT c AS s, 'ex:topbal' AS p, b AS o FROM sol
    """,
)
