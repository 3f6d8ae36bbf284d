"""ExtVP semi-join reductions: equivalence with full-store joins, and the
reduction actually reduces."""

from pyspark.sql import functions as F

from d_sparq_spark.operators.extvp import (
    materialize_extvp,
    os_reduction,
    read_reduction,
    ss_reduction,
)
from d_sparq_spark.operators.rdf_patterns import TriplePattern, star_join
from d_sparq_spark.sources.derived_rdf import derive_triples_cached

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_ss_reduction_preserves_star_join(spark):
    triples = derive_triples_cached(spark, SF)
    # star over {foaf:name, ex:mktsegment}: evaluating the name pattern
    # over its SS reduction must not change the join result
    full = star_join(
        triples,
        [TriplePattern("?c", "foaf:name", "?n"), TriplePattern("?c", "ex:mktsegment", "?m")],
    )
    red = ss_reduction(triples, "foaf:name", "ex:mktsegment")
    reduced = star_join(
        red.unionByName(triples.filter(F.col("p") == "ex:mktsegment")),
        [TriplePattern("?c", "foaf:name", "?n"), TriplePattern("?c", "ex:mktsegment", "?m")],
    )
    assert _rows(reduced) == _rows(full)
    # and it genuinely reduces: names exist for nations/regions too,
    # mktsegment only for customers
    assert red.count() < triples.filter(F.col("p") == "foaf:name").count()


def test_os_reduction_preserves_path_join(spark):
    triples = derive_triples_cached(spark, SF)
    full = star_join(
        triples,
        [TriplePattern("?c", "ex:nation", "?n")],
    ).join(
        star_join(triples, [TriplePattern("?n", "ex:region", "?r")]), "n"
    )
    red = os_reduction(triples, "ex:nation", "ex:region")
    reduced = star_join(red, [TriplePattern("?c", "ex:nation", "?n")]).join(
        star_join(triples, [TriplePattern("?n", "ex:region", "?r")]), "n"
    )
    assert _rows(reduced) == _rows(full)


def test_materialize_and_read_back(spark, tmp_path):
    triples = derive_triples_cached(spark, SF)
    written = materialize_extvp(
        triples,
        str(tmp_path),
        predicates=["foaf:name", "ex:mktsegment", "ex:nation", "ex:region"],
    )
    assert ("ss", "foaf:name", "ex:mktsegment") in written
    ratio = written[("ss", "foaf:name", "ex:mktsegment")]
    assert 0 < ratio < 0.9
    back = read_reduction(spark, str(tmp_path), "ss", "foaf:name", "ex:mktsegment")
    assert back is not None and back.count() > 0
    assert read_reduction(spark, str(tmp_path), "ss", "nope", "nada") is None


def test_red_path_is_collision_free(tmp_path):
    """Review r4: ':'/'/'->'_' collided ex/a_b with ex/a/b (one reduction
    silently overwrote the other -> empty answers); the percent-encoded
    scheme must keep every distinct (kind, p1, p2) on a distinct path,
    including '__' inside predicate names (delimiter ambiguity)."""
    from d_sparq_spark.operators.extvp import _red_path

    keys = [
        ("ss", "http://ex/a_b", "p"), ("ss", "http://ex/a/b", "p"),
        ("ss", "http://ex/a:b", "p"),
        ("ss", "a", "b__c"), ("ss", "a__b", "c"),
        ("ss", "a@@b", "c"), ("ss", "a", "b@@c"),
        ("os", "http://ex/a_b", "p"),
    ]
    paths = {_red_path(str(tmp_path), k, p1, p2) for k, p1, p2 in keys}
    assert len(paths) == len(keys)
