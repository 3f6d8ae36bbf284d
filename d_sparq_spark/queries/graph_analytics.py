"""Graph analytics over a derived co-purchase graph (SURVEY.md §2.C
extension surface; no counterpart in the reference — D-SPARQ is a batch
BGP engine [A], but a triple store IS a graph, and cluster-scale graph
primitives (components, ranks, triangles, degree profiles) are what a
100 TB analytics engine layers on top of it; components and PageRank
live in operators/graph.py already, registered from llm_ops).

Graph construction: parts co-occurring in the same order are connected
(classic market-basket projection of the order->part bipartite graph).
The edge generator is a self-equi-join of lineitem on l_orderkey — the
per-order fan-out is bounded by order size (<= ~17 lines in the driver
tables, bounded in any real order system), so the projection is linear
in lineitem, not quadratic in parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from d_sparq_spark.operators import graph as G
from d_sparq_spark.registry import register
from d_sparq_spark.sources.tables import load_table

_SQL_EDGES = """
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a
  JOIN lineitem b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # localCheckpoint: every consumer's plan references the edge set many
    # times (triangles_degree_ordered alone uses it as du/dv/both wedge
    # sides/closing probe — 22 lineitem scans and no ReusedExchange in the
    # un-checkpointed plan, review r4), so the lineitem self-join must
    # materialize ONCE, same as connected_components' sym edges.
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
        # EAGER on purpose: the first consumer (the degree union) references
        # this relation twice in one plan — a lazy checkpoint would compute
        # the self-join twice (racing the per-partition cache) inside the
        # materializing job. q_sssp's edge set, by contrast, is read exactly
        # once by its materializer (the seed aggregate), so it can be lazy.
        .localCheckpoint()
    )


_ORACLE_TRIANGLES = f"""
WITH e AS ({_SQL_EDGES}),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e1.v = e2.u
  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
),
corners AS (
  SELECT a AS part FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT part, COUNT(*) AS n_triangles FROM corners GROUP BY part
"""


@register("q_triangle_count", oracle=_ORACLE_TRIANGLES)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle participation in the co-purchase graph.

    The Spark side runs the degree-ordered enumeration
    (operators/graph.py triangles_degree_ordered — wedge work bounded
    |E|^1.5 independent of hub degree); the oracle is the naive a<b<c
    three-way join, which is correct at test scale and proves the
    orientation loses/duplicates nothing."""
    return G.triangle_counts_per_node(_copurchase_edges(spark, sf_dir)).select(
        F.col("node").alias("part"), "n_triangles"
    )


_ORACLE_DEGREE_DIST = f"""
WITH e AS ({_SQL_EDGES}),
deg AS (
  SELECT n, COUNT(*) AS degree FROM (
    SELECT u AS n FROM e UNION ALL SELECT v FROM e
  ) GROUP BY n
)
SELECT degree, COUNT(*) AS n_parts FROM deg GROUP BY degree
"""


@register("q_degree_dist", oracle=_ORACLE_DEGREE_DIST)
def q_degree_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the co-purchase graph — the two-level
    aggregation (per-node degree, then nodes per degree). Both levels are
    map-side-combinable hash aggregates; the second input is one row per
    node, so the heavy shuffle is only the first."""
    deg = G.degrees(_copurchase_edges(spark, sf_dir))
    return (
        deg.select(F.col("d").alias("degree"))
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


def _sssp_oracle(n_rounds: int = 16) -> str:
    """Unrolled Bellman-Ford rounds (the PageRank/k-means oracle device):
    integer MIN/+ relaxations over the symmetrized weighted co-purchase
    graph, seeded at the minimum part key. 16 rounds reaches the FIXPOINT
    at the oracle scales (measured: sf0.001 and sf0.01 both converge by
    round 14; the invariant test proves convergence independently), so it
    equals the until_converged Spark result; at sf0.1 this unrolled form
    spills DuckDB and sssp_invariant_sql takes over."""
    # AS MATERIALIZED everywhere (r10): DuckDB INLINES plain CTEs, so a
    # stage referencing its predecessor twice doubles the plan per round —
    # 2^n_rounds copies of the lineitem self-join (the real reason the
    # r9 lap's 6-round form already spilled at sf0.1). Materialized, the
    # oracle is linear in rounds.
    head = f"""
WITH c AS MATERIALIZED ({_SQL_EDGES}),
e AS MATERIALIZED (
  SELECT u AS src, v AS dst, ((u * 7 + v * 13) % 97) + 1 AS w FROM c
  UNION ALL
  SELECT v, u, ((u * 7 + v * 13) % 97) + 1 FROM c
),
n AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION SELECT dst FROM e)),
seed AS (SELECT MIN(node) AS s FROM n),
r0 AS MATERIALIZED (SELECT node, CASE WHEN node = (SELECT s FROM seed) THEN CAST(0 AS BIGINT) END AS d FROM n)"""
    stages = []
    for i in range(1, n_rounds + 1):
        stages.append(f""",
r{i} AS MATERIALIZED (
  SELECT node, MIN(d) AS d FROM (
    SELECT node, d FROM r{i - 1}
    UNION ALL
    SELECT e.dst AS node, r.d + e.w AS d
    FROM e JOIN r{i - 1} r ON e.src = r.node WHERE r.d IS NOT NULL
  ) GROUP BY node
)""")
    return (
        head + "".join(stages)
        + f"\nSELECT node AS part, d AS dist FROM r{n_rounds} WHERE d IS NOT NULL"
    )


def sssp_invariant_sql() -> str:
    """Structural invariant characterizing q_sssp's answer WITHOUT
    unrolling the relaxation rounds (r10, VERDICT r9 #7 — the 6-round
    recursive oracle spills DuckDB at sf0.1; this check is two joins and
    one aggregation). Against the registered ``spark_result`` view it
    returns one row per violated property, empty == pass:

    - dup:   a node labeled twice;
    - ghost: a labeled node that is not a graph node;
    - seed:  the minimum node is not labeled 0;
    - relax: some edge still improves a label, or reaches an UNLABELED
             node from a labeled one (the labeled set must be closed);
    - tight: a labeled non-seed node whose label is NOT achieved by an
             incoming edge from a labeled node.

    Soundness: with positive weights, {d(seed)=0; ∀(u,v,w): d(v) ≤
    d(u)+w; every non-seed label achieved; labeled set edge-closed} has
    the true shortest-path labeling as its UNIQUE solution — so a pass
    here is equivalent to the exact oracle PROVIDED the fixed 6 rounds
    converged, and a non-converged run fails `relax`/`tight` instead of
    passing vacuously. Cross-validated at sf0.01 against the exact
    oracle, with perturbation-rejection, in tests/test_graph_analytics."""
    return f"""
WITH c AS ({_SQL_EDGES}),
e AS (
  SELECT u AS src, v AS dst, ((u * 7 + v * 13) % 97) + 1 AS w FROM c
  UNION ALL
  SELECT v, u, ((u * 7 + v * 13) % 97) + 1 FROM c
),
res AS (SELECT part AS node, dist FROM spark_result),
seed AS (SELECT MIN(node) AS s FROM (SELECT src AS node FROM e UNION SELECT dst FROM e)),
best AS (
  SELECT e.dst AS node, MIN(u.dist + e.w) AS b
  FROM e JOIN res u ON e.src = u.node GROUP BY e.dst
),
dup AS (SELECT 'dup' AS kind FROM res GROUP BY node HAVING COUNT(*) > 1 LIMIT 1),
ghost AS (SELECT 'ghost' AS kind FROM res
          WHERE node NOT IN (SELECT src FROM e) LIMIT 1),
seed_v AS (SELECT 'seed' AS kind FROM seed
           WHERE NOT EXISTS (SELECT 1 FROM res
                             WHERE node = seed.s AND dist = 0)),
relax AS (SELECT 'relax' AS kind FROM best LEFT JOIN res v USING (node)
          WHERE v.node IS NULL OR best.b < v.dist LIMIT 1),
tight AS (SELECT 'tight' AS kind FROM res v LEFT JOIN best USING (node)
          WHERE v.node <> (SELECT s FROM seed)
            AND (best.b IS NULL OR v.dist <> best.b) LIMIT 1)
SELECT kind FROM dup UNION ALL SELECT kind FROM ghost
UNION ALL SELECT kind FROM seed_v UNION ALL SELECT kind FROM relax
UNION ALL SELECT kind FROM tight
"""


@register("q_sssp", oracle=_sssp_oracle())
def q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths over the co-purchase graph
    (edge weight = a deterministic integer function of the canonical
    pair, identical arithmetic in the oracle), Bellman-Ford TO THE
    FIXPOINT from the minimum part key (r10: the fixed 6-round form was
    not the shortest-path labeling — weighted paths relax through more
    rounds than the hop diameter; until_converged makes the result the
    unique Bellman solution, which is what sssp_invariant_sql certifies
    at the scale the unrolled oracle cannot reach). Completes the
    iterative-operator family: seeded reachability (SPARQL p+),
    components (hash-min), ranks (PageRank), clusters (k-means), and
    weighted distances — all integer-exact."""
    # one pass, one checkpoint (r11): the old union-of-two-projections over
    # a checkpointed canonical edge set paid TWO eager materializations
    # (1.2M-row c, then 2.4M-row ew); exploding both directions from the
    # raw self-join runs the generator once into the single checkpoint the
    # relaxation loop actually consumes. w depends only on the canonical
    # (u, v), so it is computed once and rides both directions.
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    c = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    w = (F.col("u") * 7 + F.col("v") * 13) % 97 + 1
    ew = (
        c.select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("src"), F.col("v").alias("dst"),
                             w.alias("w")),
                    F.struct(F.col("v").alias("src"), F.col("u").alias("dst"),
                             w.alias("w")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst", "e.w")
        # lazy: the edge generator must not re-run per round, and the seed
        # aggregate just below is the first action — it materializes the
        # checkpoint in the SAME job (eager paid a separate build job)
        .localCheckpoint(eager=False)
    )
    seed = ew.agg(F.min(F.least("src", "dst"))).collect()[0][0]
    return G.sssp_bellman_ford(ew, seed, n_rounds=64, until_converged=True).select(
        F.col("node").alias("part"), "dist"
    )
