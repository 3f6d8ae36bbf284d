"""Property-path operators (SPARQL 1.1 §9; SURVEY.md §2.B B15 — the item
the reference never had and SURVEY flags as HARD).

- sequence paths p/q: pure algebra — a join chain through a fresh
  intermediate variable (handled in the translator; nothing to do here),
- transitive closure p+ : iterative frontier expansion to fixpoint.

Fixpoint shape, chosen for the 100 TB case:
- the driver loop only iterates (bounded by graph diameter, NOT data
  size); each iteration is one distributed join frontier x edges,
- reached pairs accumulate with distinct() per round so the frontier
  only carries NEW pairs — on a DAG this terminates in diameter rounds;
  on cyclic graphs the distinct guarantees termination,
- localCheckpoint() every iteration truncates the lineage — without it
  the plan doubles per round and Catalyst analysis goes quadratic (the
  classic iterative-algorithm failure mode on Spark),
- max_iter caps runaway graphs; hitting the cap raises rather than
  silently returning a partial closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame, max_iter: int = 64, checkpoint_every: int = 1
) -> DataFrame:
    """edges(src, dst) -> all (src, dst) pairs connected by a path of
    length >= 1. Columns must be named src/dst."""
    edges = edges.select("src", "dst").distinct().localCheckpoint()
    closure = edges
    frontier = edges
    for i in range(max_iter):
        # extend every frontier path by one edge
        stepped = (
            frontier.alias("f")
            .join(edges.alias("e"), F.col("f.dst") == F.col("e.src"))
            .select(F.col("f.src").alias("src"), F.col("e.dst").alias("dst"))
            .distinct()
        )
        new_pairs = stepped.join(closure, on=["src", "dst"], how="left_anti")
        if checkpoint_every and i % checkpoint_every == 0:
            new_pairs = new_pairs.localCheckpoint()
        if not new_pairs.take(1):
            return closure
        closure = closure.unionByName(new_pairs).localCheckpoint()
        frontier = new_pairs
    raise RuntimeError(
        f"transitive_closure: no fixpoint within {max_iter} iterations "
        "(graph deeper than max_iter or pathological growth)"
    )


def path_plus(triples: DataFrame, predicate: object) -> DataFrame:
    """p+ over a triples store: closure of the predicate's edge set.
    Returns bindings (src, dst)."""
    edges = triples.filter(F.col("p") == F.lit(predicate)).select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )
    return transitive_closure(edges)


def path_star(triples: DataFrame, predicate: object) -> DataFrame:
    """p* = p+ UNION zero-length paths on every node that occurs in the
    predicate's edge set (SPARQL zero-length path semantics restricted to
    the predicate's domain/range — full spec semantics would include every
    term in the graph)."""
    plus = path_plus(triples, predicate)
    edges = triples.filter(F.col("p") == F.lit(predicate))
    nodes = (
        edges.select(F.col("s").alias("n"))
        .unionByName(edges.select(F.col("o").alias("n")))
        .distinct()
    )
    zero = nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))
    return plus.unionByName(zero).distinct()
