"""SparqlEngine — the user-facing API: SPARQL text in, DataFrame out.

Mirrors D-SPARQ's online query path (SURVEY.md §3 entry point 2):
parse -> star decomposition -> selectivity ordering -> execute; with Jena
ARQ replaced by plans/parser.py, the Mongo lookups by DataFrame joins, and
the pipelined binding shipping by Catalyst-planned hash joins.

Usage:
    engine = SparqlEngine(triples_df)            # lexical or encoded store
    df = engine.query("SELECT ?c WHERE { ?c ex:mktsegment \\"BUILDING\\" }")
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from d_sparq_spark.operators.rdf_patterns import predicate_stats
from d_sparq_spark.plans.parser import parse_sparql
from d_sparq_spark.plans.translate import Translator


class SparqlEngine:
    def __init__(
        self,
        triples: DataFrame,
        collect_stats: bool = True,
        services: dict[str, DataFrame] | None = None,
        catalog=None,
    ):
        """triples: DataFrame with columns (s, p, o). collect_stats runs one
        small aggregation up front (A11) so BGP planning can order patterns
        by selectivity (A7) without re-scanning per query. services maps
        SERVICE endpoint names to their triples DataFrames (federation).
        catalog (plans/catalog.StoreCatalog) registers materialized
        alternative layouts — property table, ExtVP reductions — that the
        planner substitutes for full-store scans when a star qualifies."""
        self.triples = triples
        stats = None
        if collect_stats:
            stats = {
                r["p"]: r["cnt"]
                for r in predicate_stats(triples).select("p", "cnt").collect()
            }
        self._translator = Translator(triples, stats, services=services, catalog=catalog)

    def query(self, sparql: str) -> DataFrame:
        """Parse and plan a SPARQL query; returns the lazily-evaluated
        DataFrame (columns = projected variable names)."""
        return self._translator.eval(parse_sparql(sparql))

    def explain(self, sparql: str, mode: str = "formatted") -> str:
        import contextlib
        import io

        df = self.query(sparql)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode)
        return buf.getvalue()
