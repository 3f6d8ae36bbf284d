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
from pyspark.sql import functions as F

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
        if catalog is not None and "g" in triples.columns:
            raise ValueError(
                "StoreCatalog routing is triple-level: a property table "
                "over a quad store pivots across ALL named graphs and "
                "changes binding multiplicity — attach the catalog to a "
                "single graph's slice instead"
            )
        self.triples = triples
        stats = None
        if collect_stats:
            # A7 ordering needs only the per-predicate counts; the full
            # predicate_stats (distinct-subject/object cardinalities) is
            # the A11 *reporting* operator and 3x this aggregation's cost
            stats = {
                r["p"]: r["cnt"]
                for r in triples.groupBy("p")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .collect()
            }
        self._translator = Translator(triples, stats, services=services, catalog=catalog)

    def query(self, sparql: str) -> DataFrame:
        """Parse and plan a SPARQL query; returns the lazily-evaluated
        DataFrame (columns = projected variable names)."""
        return self._translator.eval(parse_sparql(sparql))

    def update(self, sparql: str, execution_id: str | None = None) -> DataFrame:
        """SPARQL 1.1 Update subset (INSERT DATA / DELETE DATA /
        DELETE WHERE / DELETE..INSERT..WHERE): FUNCTIONAL — returns the
        new triples relation and leaves this engine's store untouched
        (wrap the result in a new SparqlEngine, or persist it). That is
        the Spark-idiomatic shape: at 100 TB the same delete/insert plans
        drive a MERGE into a lakehouse table or a partition rewrite;
        immutable DataFrames keep the update testable and retry-safe.
        Graph-set semantics hold: inserting an existing triple or
        deleting an absent one is a no-op (anti-join both ways, never a
        full-store dropDuplicates)."""
        from functools import reduce

        from pyspark.sql import functions as F

        from d_sparq_spark.plans import ast as A

        tree = parse_sparql(sparql)
        t = self.triples
        if "g" in t.columns:
            raise ValueError(
                "SparqlEngine.update: quad stores are not updatable — a "
                "triple-level delete would silently hit EVERY named graph; "
                "update a single graph's slice instead"
            )
        spark = t.sparkSession
        schema = ", ".join(f"{c} {dt}" for c, dt in t.dtypes)

        def ground_df(triples):
            # dedup: a triple repeated WITHIN one DATA block must still
            # insert/delete once (graph-set semantics)
            return spark.createDataFrame(
                [(tp.s, tp.p, tp.o) for tp in triples], schema
            ).dropDuplicates()

        def _bnode_labels(template) -> list[str]:
            seen: list[str] = []
            for tp in template or ():
                for term in (tp.s, tp.p, tp.o):
                    if isinstance(term, str) and term.startswith("_:") and term not in seen:
                        seen.append(term)
            return seen

        # SPARQL 1.1 Update mints template bnodes FRESH for every solution
        # of every EXECUTION: re-running the same update must create new
        # entities, not silently anti-join into a no-op (review r4). The
        # execution token is drawn ONCE here on the driver and baked into
        # the plan as a literal, so Spark task retries within this call
        # stay deterministic; callers needing bit-identical replans (the
        # oracle harness) pin execution_id explicitly.
        if execution_id is None:
            import uuid

            execution_id = uuid.uuid4().hex

        def instantiate(template, bindings: DataFrame) -> DataFrame:
            # Each template blank-node label instantiates as a FRESH bnode
            # per solution — shared across the template's triples within
            # one solution, distinct across solutions (and labels). The id
            # is a hash of (execution, label, solution's bound terms,
            # duplicate-solution ordinal); every part is length-prefixed
            # (NULL -> '~', which no prefixed part can start with) so
            # crafted values containing the separator cannot make two
            # distinct solutions share one bnode.
            labels = _bnode_labels(template)
            bmap: dict[str, F.Column] = {}
            if labels:
                from pyspark.sql.window import Window

                def part(c: F.Column) -> F.Column:
                    s = c.cast("string")
                    return F.when(s.isNull(), F.lit("~")).otherwise(
                        F.concat(F.length(s).cast("string"), F.lit(":"), s)
                    )

                cols = bindings.columns or []
                key_parts = [part(F.col(c)) for c in cols]
                if cols:  # duplicate solutions each get their own fresh bnode
                    dup = F.row_number().over(
                        Window.partitionBy(*cols).orderBy(F.lit(1))
                    )
                else:
                    dup = F.lit(1)
                bindings = bindings.withColumn("__dup", dup)
                for label in labels:
                    bmap[label] = F.concat(
                        F.lit("_:b"),
                        F.substring(
                            F.sha2(
                                F.concat_ws(
                                    "\x1f",
                                    part(F.lit(execution_id)),
                                    part(F.lit(label)),
                                    part(F.col("__dup")),
                                    *key_parts,
                                ),
                                256,
                            ),
                            1,
                            32,
                        ),
                    )

            def term_col(term):
                if isinstance(term, str) and term.startswith("?"):
                    return F.col(term[1:])
                if term in bmap:
                    return bmap[term]
                return F.lit(term)

            parts = [
                bindings.select(
                    term_col(tp.s).alias("s"),
                    term_col(tp.p).alias("p"),
                    term_col(tp.o).alias("o"),
                )
                for tp in template
            ]
            # unbound variables (e.g. from OPTIONAL) instantiate nothing, per spec
            return reduce(lambda a, b: a.unionByName(b), parts).na.drop().dropDuplicates()

        on = ["s", "p", "o"]
        if isinstance(tree, A.InsertData):
            new = ground_df(tree.triples)
            return t.unionByName(new.join(t, on, "left_anti"))
        if isinstance(tree, A.DeleteData):
            return t.join(F.broadcast(ground_df(tree.triples)), on, "left_anti")
        if isinstance(tree, A.Modify):
            # Blank nodes are ILLEGAL in a DELETE template (SPARQL 1.1
            # Update §3.1.3.2 — there is no bnode to match by label); the
            # INSERT template instantiates them fresh per solution above.
            if _bnode_labels(tree.delete_template):
                raise SyntaxError(
                    "SPARQL UPDATE: blank nodes are not permitted in a "
                    "DELETE template"
                )
            bindings = self._translator.eval(tree.where)
            out = t
            if tree.delete_template:
                out = out.join(
                    instantiate(tree.delete_template, bindings), on, "left_anti"
                )
            if tree.insert_template:
                ins = instantiate(tree.insert_template, bindings)
                out = out.unionByName(ins.join(out, on, "left_anti"))
            return out
        raise ValueError("SparqlEngine.update: not an UPDATE request — use query()")

    def explain(self, sparql: str, mode: str = "formatted") -> str:
        import contextlib
        import io

        df = self.query(sparql)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode)
        return buf.getvalue()
