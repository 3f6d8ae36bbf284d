"""Triple-pattern scan, star join, path join, predicate statistics
(SURVEY §2.A A4/A5/A6/A7/A11) — the reference engine's core.

D-SPARQ answers a star (all patterns sharing one subject variable) with a
single MongoDB lookup against subject-grouped documents, and chains stars
by pipelining bindings (index nested-loop). Spark-first:

- a triple pattern is a filtered projection of the triples relation
  (constant positions -> pushed-down filters; variable positions ->
  binding columns),
- a star is a chain of self-equi-joins on the subject column; when the
  triple store is bucketed by s the joins are co-partitioned (no shuffle),
- star-to-star (path) joins are ordinary equi-joins on the shared
  variable — Spark's shuffle/broadcast hash join replaces pipelining,
- pattern order within a star is chosen by ascending predicate count
  (A7 selectivity reordering) when a stats DataFrame is supplied; AQE/CBO
  refine at runtime.

Works identically over lexical (string) and encoded (long) triple stores —
patterns just carry constants of the matching type.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TriplePattern:
    """One SPARQL triple pattern. Strings starting with '?' are variables;
    anything else (str for lexical stores, int for encoded) is a constant."""

    s: object
    p: object
    o: object

    def positions(self):
        return (("s", self.s), ("p", self.p), ("o", self.o))

    def variables(self) -> list[str]:
        return [v[1:] for _, v in self.positions() if _is_var(v)]


def _is_var(term: object) -> bool:
    return isinstance(term, str) and term.startswith("?")


def match_pattern(
    triples: DataFrame, pattern: TriplePattern, graph_var: str | None = None
) -> DataFrame:
    """Bindings of one pattern: filter constants, project variables.

    Repeated variables (e.g. (?x, p, ?x)) become an intra-row equality
    filter, per SPARQL semantics. With ``graph_var`` (GRAPH ?g over a quad
    store) the g column is projected as one more binding — star joins then
    naturally include g in their keys, keeping every pattern of the group
    in the SAME named graph with one plan and zero driver-side graph
    enumeration."""
    df = triples
    positions = list(pattern.positions())
    if graph_var is not None:
        positions.append(("g", "?" + graph_var))
    proj, seen = [], {}
    for pos, term in positions:
        if _is_var(term):
            var = term[1:]
            if var in seen:
                df = df.filter(F.col(pos) == F.col(seen[var]))
            else:
                seen[var] = pos
                proj.append(F.col(pos).alias(var))
        else:
            df = df.filter(F.col(pos) == F.lit(term))
    return df.select(*proj)


def _stats_dict(stats) -> dict:
    """Normalize predicate stats to {p: cnt} — accepts the stats DataFrame
    or an already-collected dict (shared by order_by_selectivity and bgp;
    the collect is metadata-scale, bounded by #predicates)."""
    if isinstance(stats, dict):
        return stats
    return {r["p"]: r["cnt"] for r in stats.select("p", "cnt").collect()}


def order_by_selectivity(
    patterns: list[TriplePattern], stats: DataFrame | dict | None
) -> list[TriplePattern]:
    """A7: cheapest (lowest predicate count) pattern first. Patterns with a
    variable predicate (unknown selectivity) go last. ``stats`` may be the
    predicate_stats DataFrame or an already-collected {p: count} dict (the
    SPARQL engine collects once per engine, not once per star)."""
    if stats is None:
        return list(patterns)
    counts = _stats_dict(stats)
    big = max(counts.values(), default=0) + 1

    def cost(tp: TriplePattern) -> int:
        # absent constant predicate -> ZERO triples: the most selective
        # pattern there is — ordering it first makes the chain trivially
        # empty. Only a VARIABLE predicate is genuinely unknown (-> big).
        return big if _is_var(tp.p) else counts.get(tp.p, 0)

    return sorted(patterns, key=cost)


def join_bindings(left: DataFrame, right: DataFrame, how: str = "inner") -> DataFrame:
    """Natural join of two binding tables on their shared variables
    (cross join when none — SPARQL cartesian BGP). With no shared
    variables the ``how`` still matters: OPTIONAL (left_outer) must keep
    every left solution when the right group is EMPTY — a bare crossJoin
    would return zero rows and silently drop the left bindings."""
    shared = sorted(set(left.columns) & set(right.columns))
    if not shared:
        if how == "inner":
            return left.crossJoin(right)
        return left.join(right, F.lit(True), how)
    return left.join(right, on=shared, how=how)


def star_join(
    triples: DataFrame,
    patterns: list[TriplePattern],
    stats: DataFrame | dict | None = None,
    graph_var: str | None = None,
    source_for=None,
) -> DataFrame:
    """Evaluate a subject-star (or any BGP fragment) as a join chain.
    ``source_for(tp) -> DataFrame | None`` lets the planner substitute a
    cheaper relation for one pattern's scan (an ExtVP semi-join reduction,
    plans/catalog.py) — None means scan ``triples``."""
    ordered = order_by_selectivity(patterns, stats)

    def src(tp: TriplePattern) -> DataFrame:
        alt = source_for(tp) if source_for is not None else None
        return alt if alt is not None else triples

    return reduce(
        join_bindings, (match_pattern(src(tp), tp, graph_var) for tp in ordered)
    )


def bgp(
    triples: DataFrame, stars: list[list[TriplePattern]], stats: DataFrame | dict | None = None
) -> DataFrame:
    """Full basic graph pattern: evaluate each star, then chain stars on
    their shared variables (the reference's pipelined inter-star join —
    here a hash join). Stats normalize to a dict ONCE here: passing the
    DataFrame down would re-run the aggregation + collect per star."""
    if stats is not None:
        stats = _stats_dict(stats)
    return reduce(join_bindings, (star_join(triples, star, stats) for star in stars))


def predicate_stats(triples: DataFrame) -> DataFrame:
    """A11: per-predicate count + exact distinct subject/object counts.
    At 100 TB swap the exact distincts for approx_count_distinct — the
    optimizer only needs the order of magnitude."""
    return triples.groupBy("p").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct("s").alias("ndv_s"),
        F.countDistinct("o").alias("ndv_o"),
    )


def property_table(triples: DataFrame, predicates: list) -> DataFrame:
    """Materialize a PROPERTY TABLE: one row per subject, one column per
    predicate in `predicates` (column name = str(predicate)). The closest
    Spark analog of D-SPARQ's subject-grouped MongoDB documents (SURVEY
    §1.2): a subject star over these predicates becomes a single-table
    scan + filter — ZERO joins, fully pushdown-able when persisted as
    parquet. Only valid for functional (single-valued) predicates; for
    multi-valued ones the pivot keeps an arbitrary-but-deterministic
    min value, so restrict `predicates` accordingly."""
    return (
        triples.filter(F.col("p").isin(list(predicates)))
        .groupBy("s")
        .pivot("p", [str(p) for p in predicates])
        .agg(F.min("o"))
    )


def star_over_property_table(
    pt: DataFrame, bindings: dict, subject_var: str = "s"
) -> DataFrame:
    """Answer a subject star from a property table: `bindings` maps
    predicate column -> '?var' (project) or constant (filter)."""
    out = pt
    cols = [F.col("s").alias(subject_var)]
    for pred, target in bindings.items():
        if isinstance(target, str) and target.startswith("?"):
            cols.append(F.col(pred).alias(target[1:]))
            out = out.filter(F.col(pred).isNotNull())
        else:
            out = out.filter(F.col(pred) == F.lit(target))
    return out.select(*cols)
