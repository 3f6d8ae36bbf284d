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


def _sssp_oracle(n_rounds: int = 6) -> str:
    """Unrolled Bellman-Ford rounds (the PageRank/k-means oracle device):
    integer MIN/+ relaxations over the symmetrized weighted co-purchase
    graph, seeded at the minimum part key."""
    head = f"""
WITH c AS ({_SQL_EDGES}),
e AS (
  SELECT u AS src, v AS dst, ((u * 7 + v * 13) % 97) + 1 AS w FROM c
  UNION ALL
  SELECT v, u, ((u * 7 + v * 13) % 97) + 1 FROM c
),
n AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION SELECT dst FROM e)),
seed AS (SELECT MIN(node) AS s FROM n),
r0 AS (SELECT node, CASE WHEN node = (SELECT s FROM seed) THEN CAST(0 AS BIGINT) END AS d FROM n)"""
    stages = []
    for i in range(1, n_rounds + 1):
        stages.append(f""",
r{i} AS (
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


@register("q_sssp", oracle=_sssp_oracle())
def q_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths over the co-purchase graph
    (edge weight = a deterministic integer function of the canonical
    pair, identical arithmetic in the oracle), 6 Bellman-Ford rounds
    from the minimum part key. Completes the iterative-operator family:
    seeded reachability (SPARQL p+), components (hash-min), ranks
    (PageRank), clusters (k-means), and now weighted distances — all
    integer-exact with unrolled-CTE oracles."""
    c = _copurchase_edges(spark, sf_dir)
    w = ((F.col("u") * 7 + F.col("v") * 13) % 97 + 1).alias("w")
    ew = (
        c.select(F.col("u").alias("src"), F.col("v").alias("dst"), w)
        .unionByName(c.select(F.col("v").alias("src"), F.col("u").alias("dst"), w))
        .localCheckpoint()  # the edge generator must not re-run per round
    )
    seed = ew.agg(F.min(F.least("src", "dst"))).collect()[0][0]
    return G.sssp_bellman_ford(ew, seed).select(
        F.col("node").alias("part"), "dist"
    )
