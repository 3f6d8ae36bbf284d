"""Unit tests for the RDF core beyond the oracle harness: N-Triples edge
cases, scalable dictionary ID assignment, triple-store physical layouts
(partition pruning / shuffle-free bucketed star joins).
"""

import pytest
from pyspark.sql import functions as F

from d_sparq_spark.operators.dictionary import assign_ids
from d_sparq_spark.operators.rdf_patterns import TriplePattern, match_pattern, star_join
from d_sparq_spark.sources.ntriples import format_ntriples, parse_ntriples
from d_sparq_spark.sources.triple_store import read_vp, write_vp


def test_ntriples_escaping_roundtrip(spark):
    rows = [
        ("ex:s1", "ex:p", 'literal with "quotes"'),
        ("ex:s2", "ex:p", "back\\slash and\nnewline and\ttab"),
        ("ex:s3", "ex:p", "ex:object-iri"),
        ("ex:s4", "foaf:name", "plain"),
    ]
    triples = spark.createDataFrame(rows, "s string, p string, o string")
    back = parse_ntriples(format_ntriples(triples))
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_ntriples_drops_malformed(spark):
    lines = spark.createDataFrame(
        [
            ("<ex:s> <ex:p> <ex:o> .",),
            ("# a comment",),
            ("",),
            ("<ex:s> <ex:p> .",),  # missing object
            ('<ex:s> <ex:p> "lit" .',),
        ],
        "value string",
    )
    out = parse_ntriples(lines).collect()
    assert sorted(map(tuple, out)) == [("ex:s", "ex:p", "ex:o"), ("ex:s", "ex:p", "lit")]


def test_assign_ids_matches_global_rank_across_partitionings(spark):
    terms = spark.createDataFrame(
        [(f"t{i:04d}",) for i in range(997)], "term string"
    )
    expect = {f"t{i:04d}": i + 1 for i in range(997)}
    for n in (2, 7, 32):
        got = {r["term"]: r["id"] for r in assign_ids(terms, num_partitions=n).collect()}
        assert got == expect, f"num_partitions={n}"


def test_vp_layout_prunes_partitions(spark, tmp_path):
    enc = spark.createDataFrame(
        [(i, i % 5, i * 10) for i in range(100)], "s long, p long, o long"
    )
    write_vp(enc, str(tmp_path))
    df = read_vp(spark, str(tmp_path)).filter(F.col("p") == 3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(p" in plan, plan
    assert df.count() == 20


def test_bucketed_star_join_has_no_shuffle(spark, tmp_path):
    enc = spark.createDataFrame(
        [(i % 50, 1 + i % 3, i) for i in range(300)], "s long, p long, o long"
    )
    (
        enc.write.mode("overwrite")
        .bucketBy(8, "s")
        .sortBy("s")
        .format("parquet")
        .saveAsTable("t_bucketed_star")
    )
    t = spark.table("t_bucketed_star")
    # force the non-broadcast path: the point is that the s-bucketed layout
    # lets a sort-merge self-join run with NO shuffle exchange at any scale.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = star_join(
            t, [TriplePattern("?x", 1, "?a"), TriplePattern("?x", 2, "?b")]
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "ShuffleExchange" not in plan.replace("Exchange hashpartitioning", "ShuffleExchange"), (
            f"bucketed star join should not shuffle:\n{plan}"
        )
        assert "SortMergeJoin" in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_match_pattern_repeated_variable(spark):
    triples = spark.createDataFrame(
        [("a", "p", "a"), ("a", "p", "b")], "s string, p string, o string"
    )
    out = match_pattern(triples, TriplePattern("?x", "p", "?x")).collect()
    assert [r["x"] for r in out] == ["a"]


def test_ntriples_blank_nodes_roundtrip(spark):
    lines = spark.createDataFrame(
        [("_:b1 <ex:knows> _:b2 .",), ('_:b1 <ex:name> "Anon" .',)], "value string"
    )
    out = parse_ntriples(lines).collect()
    assert sorted(map(tuple, out)) == [("_:b1", "ex:knows", "_:b2"), ("_:b1", "ex:name", "Anon")]


def test_property_table_star_equals_star_join(spark):
    """A star answered from the property table must equal the join-chain
    star (for functional predicates)."""
    from d_sparq_spark.operators.rdf_patterns import (
        TriplePattern,
        property_table,
        star_join,
        star_over_property_table,
    )
    from d_sparq_spark.sources.derived_rdf import derive_triples

    triples = derive_triples(spark, "/root/testdata/sf0.001")
    pt = property_table(triples, ["foaf:name", "ex:mktsegment", "ex:acctbal"])
    via_pt = star_over_property_table(
        pt, {"foaf:name": "?n", "ex:acctbal": "?b", "ex:mktsegment": "BUILDING"}, "c"
    )
    via_join = star_join(
        triples,
        [
            TriplePattern("?c", "foaf:name", "?n"),
            TriplePattern("?c", "ex:acctbal", "?b"),
            TriplePattern("?c", "ex:mktsegment", "BUILDING"),
        ],
    ).select("c", "n", "b")
    a = sorted(tuple(r) for r in via_pt.select("c", "n", "b").collect())
    b = sorted(tuple(r) for r in via_join.collect())
    assert a == b and len(a) > 0


def test_nquads_roundtrip_and_default_graph(spark):
    from d_sparq_spark.sources.ntriples import format_nquads, parse_nquads

    quads = spark.createDataFrame(
        [("p:a", "ex:name", "Alice", "g:1"),
         ("p:a", "ex:age", '"30"^^xsd:int', "g:2"),
         ("p:b", "ex:note", '"hi"@en', "g:1")],
        "s string, p string, o string, g string",
    )
    lines = format_nquads(quads)
    back = parse_nquads(lines)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, quads.collect()))
    # graph-less lines land in the default graph
    nt = spark.createDataFrame([('<p:c> <ex:name> "Carol" .',)], "value string")
    got = parse_nquads(nt, default_graph="g:default").collect()
    assert [tuple(r) for r in got] == [("p:c", "ex:name", "Carol", "g:default")]


def test_ntriples_roundtrip_cr_and_control_chars(spark):
    # review r3: \r was unescaped (raw CR splits the physical line on
    # read), and multiline typed/tagged terms lost their datatype on
    # format (non-DOTALL term regexes)
    from d_sparq_spark.sources.ntriples import format_ntriples, parse_ntriples

    data = [
        ("s:a", "p:x", "a\rb"),
        ("s:a", "p:x", "a\x08b\x0cc"),
        ("s:a", "p:x", '"l1\nl2"^^xsd:int'),
        ("s:a", "p:x", '"m1\rm2"@en'),
    ]
    df = spark.createDataFrame(data, "s string, p string, o string")
    lines = format_ntriples(df)
    for r in lines.collect():
        assert "\n" not in r.value and "\r" not in r.value
    assert sorted(map(tuple, parse_ntriples(lines).collect())) == sorted(data)


def test_ntriples_roundtrips_bnodes_and_raw_nul(spark):
    """Review r4: blank nodes must serialize as labels (a quoted '_:'
    SUBJECT made an invalid line that re-parse silently dropped), and an
    EXTERNAL file's raw NUL inside a literal must survive unescaping
    instead of turning into a backslash."""
    from d_sparq_spark.sources.ntriples import format_ntriples, parse_ntriples

    triples = spark.createDataFrame(
        [
            ("_:b1", "foaf:knows", "c:1"),
            ("c:1", "foaf:knows", "_:b2"),
            ("c:2", "ex:note", "_: not a bnode"),  # literal: keeps quotes
        ],
        "s string, p string, o string",
    )
    back = parse_ntriples(format_ntriples(triples))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, triples.collect()))

    raw = spark.createDataFrame(
        [('<a:s> <a:p> "x\x00y" .',), ('<a:s> <a:p> "a\\\\b" .',)], "value string"
    )
    got = sorted((r["s"], r["p"], r["o"]) for r in parse_ntriples(raw).collect())
    assert got == [("a:s", "a:p", "a\\b"), ("a:s", "a:p", "x\x00y")]


def test_ndv_ordering_beats_count_ordering(spark):
    """r8 (VERDICT r7 #5): A7/A11 promised stats-DRIVEN join ordering, but
    through r7 order_by_selectivity used raw predicate counts only. Golden
    where the two models disagree and the ndv model wins:

    - fan1/fan2: low count but ONE distinct subject carrying many objects
      (multi-valued) — raw-count order picks them first and their self-join
      on s multiplies (10 x 12 = 120 intermediate rows);
    - func: high count but functional (ndv_s == cnt) — per-subject fanout 1,
      so joining it second RESTRICTS instead of multiplying (10 rows).

    The full star result is order-invariant (sanity-checked); only the
    intermediate cardinality moves, which is exactly what the cost model
    is for."""
    from d_sparq_spark.operators.rdf_patterns import (
        join_bindings,
        order_by_selectivity,
        predicate_stats,
    )

    rows = (
        [("s0", "fan1", f"a{i}") for i in range(10)]
        + [("s0", "fan2", f"b{i}") for i in range(12)]
        + [(f"s{i}", "func", f"v{i}") for i in range(100)]
    )
    triples = spark.createDataFrame(rows, "s string, p string, o string")
    star = [
        TriplePattern("?x", "fan1", "?a"),
        TriplePattern("?x", "fan2", "?b"),
        TriplePattern("?x", "func", "?v"),
    ]
    stats = predicate_stats(triples)
    counts_only = {r["p"]: r["cnt"] for r in stats.collect()}

    by_count = order_by_selectivity(star, counts_only)
    by_ndv = order_by_selectivity(star, stats)
    assert [tp.p for tp in by_count] == ["fan1", "fan2", "func"]
    assert [tp.p for tp in by_ndv] == ["fan1", "func", "fan2"]

    def first_intermediate(ordered):
        return join_bindings(
            match_pattern(triples, ordered[0]), match_pattern(triples, ordered[1])
        ).count()

    n_count, n_ndv = first_intermediate(by_count), first_intermediate(by_ndv)
    assert n_ndv < n_count  # 10 vs 120
    assert (n_count, n_ndv) == (120, 10)

    # order-invariance: both plans compute the same star (binding-column
    # order follows pattern order, so normalize it before comparing)
    cols = ["x", "a", "b", "v"]
    got_count = sorted(
        map(tuple, star_join(triples, star, counts_only).select(*cols).collect())
    )
    got_ndv = sorted(
        map(tuple, star_join(triples, star, stats).select(*cols).collect())
    )
    assert got_count == got_ndv
    assert len(got_ndv) == 120


def test_ndv_ordering_constant_object_uses_per_object_selectivity(spark):
    """The ndv cost model divides by ndv_o for a constant object: a huge
    predicate probed at one object value is cheaper than a mid-size
    pattern scanned whole — raw-count order gets this exactly backwards."""
    from d_sparq_spark.operators.rdf_patterns import (
        order_by_selectivity,
        predicate_stats,
    )

    rows = [(f"s{i}", "big", f"city{i % 200}") for i in range(1000)] + [
        (f"s{i}", "mid", f"t{i}") for i in range(50)
    ]
    triples = spark.createDataFrame(rows, "s string, p string, o string")
    star = [
        TriplePattern("?x", "big", "city7"),  # ~5 rows after the o filter
        TriplePattern("?x", "mid", "?t"),  # 50 rows
    ]
    stats = predicate_stats(triples)
    counts_only = {r["p"]: r["cnt"] for r in stats.collect()}
    assert [tp.p for tp in order_by_selectivity(star, counts_only)] == ["mid", "big"]
    assert [tp.p for tp in order_by_selectivity(star, stats)] == ["big", "mid"]


def test_rdfs_entailment_rules_on_fixture(spark):
    """rho-df rules fire exactly as specified on a hand-built store:
    rdfs7 through a 2-level property chain, rdfs2/3 via the DERIVED
    superproperty only, rdfs9 through a 2-level class chain — and
    nothing else is invented (closure checked for exact equality)."""
    from d_sparq_spark.operators.reasoning import rdfs_entailment

    triples = spark.createDataFrame(
        [("a", "ex:knows", "b"), ("a", "rdf:type", "Student")],
        "s string, p string, o string",
    )
    onto = [
        ("ex:knows", "rdfs:subPropertyOf", "ex:related"),
        ("ex:related", "rdfs:subPropertyOf", "ex:any"),
        ("ex:related", "rdfs:domain", "Person"),
        ("ex:related", "rdfs:range", "Person"),
        ("Student", "rdfs:subClassOf", "Person"),
        ("Person", "rdfs:subClassOf", "Agent"),
    ]
    got = sorted(map(tuple, rdfs_entailment(triples, onto).collect()))
    assert got == sorted(
        [
            ("a", "ex:knows", "b"),
            ("a", "rdf:type", "Student"),
            ("a", "ex:related", "b"),  # rdfs7 level 1
            ("a", "ex:any", "b"),  # rdfs7 via the closed chain (rdfs5)
            ("a", "rdf:type", "Person"),  # rdfs2 on the DERIVED ex:related
            ("b", "rdf:type", "Person"),  # rdfs3 on the derived triple
            ("a", "rdf:type", "Agent"),  # rdfs9 (from Student AND Person)
            ("b", "rdf:type", "Agent"),  # rdfs9 on the rdfs3 output
        ]
    )


def test_rdfs_entailment_plan_is_broadcast_only(spark):
    """Scale shape (r12): below _RULE_MAP_MAX_PAIRS every rule applies as
    a constant literal-map projection — NO join of any kind, so the only
    instance-scale exchange left is the final distinct. Above the gate
    the rules must still broadcast the metadata-scale ontology — never
    sort-merge-shuffle the instance side."""
    from d_sparq_spark.operators import reasoning as R

    triples = spark.createDataFrame(
        [(f"s{i}", "ex:knows", f"o{i}") for i in range(100)],
        "s string, p string, o string",
    )
    onto = [
        ("ex:knows", "rdfs:subPropertyOf", "ex:related"),
        ("ex:related", "rdfs:domain", "Person"),
        ("Person", "rdfs:subClassOf", "Agent"),
    ]
    plan = R.rdfs_entailment(triples, onto)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan[:1500]  # map-lookup rules: join-free
    assert "BroadcastExchange" not in plan

    # forced-join direction: wide ontology keeps the broadcast rule joins
    orig = R._RULE_MAP_MAX_PAIRS
    R._RULE_MAP_MAX_PAIRS = 0
    try:
        jplan = (
            R.rdfs_entailment(triples, onto)
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        R._RULE_MAP_MAX_PAIRS = orig
    assert "BroadcastHashJoin" in jplan
    assert "SortMergeJoin" not in jplan


def test_rdfs_derive_map_and_join_paths_agree(spark):
    """The r12 literal-map rule path must emit EXACTLY the broadcast-join
    path's multiset — lexical and encoded spaces, multi-super fan-out,
    quad passenger column included."""
    from d_sparq_spark.operators import reasoning as R

    triples = spark.createDataFrame(
        [
            ("a", "ex:knows", "b", "g1"),
            ("b", "ex:manages", "c", "g2"),
            ("c", "rdf:type", "Student", "g1"),
            ("d", "ex:knows", "a", "g2"),
        ],
        "s string, p string, o string, g string",
    )
    onto = [
        ("ex:knows", "rdfs:subPropertyOf", "ex:related"),
        ("ex:manages", "rdfs:subPropertyOf", "ex:related"),
        ("ex:related", "rdfs:subPropertyOf", "ex:linked"),  # chain -> 2 supers
        ("ex:related", "rdfs:domain", "Person"),
        ("ex:linked", "rdfs:range", "Entity"),
        ("Student", "rdfs:subClassOf", "Person"),
        ("Person", "rdfs:subClassOf", "Agent"),
    ]

    def run():
        return sorted(map(tuple, R.rdfs_derive(triples, onto).collect()))

    got_map = run()
    orig = R._RULE_MAP_MAX_PAIRS
    R._RULE_MAP_MAX_PAIRS = 0
    try:
        got_join = run()
    finally:
        R._RULE_MAP_MAX_PAIRS = orig
    assert got_map == got_join and len(got_map) > 0

    # encoded space: same equality over bigint ids
    terms = sorted(
        {x for t in triples.select("s", "p", "o").collect() for x in t}
        | {x for s, p, o in onto for x in (s, o)}
        | {"rdf:type"}
    )
    ids = {t: i for i, t in enumerate(terms)}
    enc = spark.createDataFrame(
        [(ids[r.s], ids[r.p], ids[r.o]) for r in triples.collect()],
        "s long, p long, o long",
    )
    enc_ont = [(ids[s], p, ids[o]) for s, p, o in onto]

    def run_enc():
        return sorted(
            map(tuple, R.rdfs_derive(enc, enc_ont, type_term=ids["rdf:type"]).collect())
        )

    got_map_e = run_enc()
    R._RULE_MAP_MAX_PAIRS = 0
    try:
        got_join_e = run_enc()
    finally:
        R._RULE_MAP_MAX_PAIRS = orig
    assert got_map_e == got_join_e and len(got_map_e) > 0


def test_smush_sameas_fixture(spark):
    """sameAs chains collapse to the minimum member in both positions;
    sameAs triples are consumed; untouched entities pass through; merged
    duplicate facts collapse to one row."""
    from d_sparq_spark.operators.reasoning import smush_sameas

    triples = spark.createDataFrame(
        [
            ("b", "owl:sameAs", "a"),
            ("c", "owl:sameAs", "b"),  # chain: {a,b,c} -> a
            ("c", "ex:age", "30"),
            ("a", "ex:age", "30"),  # duplicate after smushing
            ("x", "ex:knows", "b"),  # object position rewrite
            ("z", "ex:other", "w"),  # untouched
        ],
        "s string, p string, o string",
    )
    got = sorted(map(tuple, smush_sameas(triples).collect()))
    assert got == sorted(
        [
            ("a", "ex:age", "30"),
            ("x", "ex:knows", "a"),
            ("z", "ex:other", "w"),
        ]
    )


def test_query_time_inference_equals_materialized_closure(spark):
    """Consistency of the two inference routes the engine offers: the
    property path rdf:type/rdfs:subClassOf* evaluated over instance
    triples UNIONed with the ontology-as-triples must return exactly the
    instances the materialized rho-df closure types (for a class-only
    ontology — domain/range entailments are closure-only by nature)."""
    from d_sparq_spark.engine import SparqlEngine
    from d_sparq_spark.operators.reasoning import rdfs_entailment

    onto = [
        ("Student", "rdfs:subClassOf", "Person"),
        ("Person", "rdfs:subClassOf", "Agent"),
        ("Robot", "rdfs:subClassOf", "Agent"),
    ]
    inst = [
        ("a", "rdf:type", "Student"),
        ("b", "rdf:type", "Person"),
        ("c", "rdf:type", "Robot"),
        ("d", "rdf:type", "Rock"),
    ]
    triples = spark.createDataFrame(inst + onto, "s string, p string, o string")
    eng = SparqlEngine(triples, collect_stats=False)
    via_path = sorted(
        r["x"]
        for r in eng.query(
            'SELECT ?x WHERE { ?x <rdf:type>/<rdfs:subClassOf>* "Agent" }'
        ).collect()
    )
    closure = rdfs_entailment(spark.createDataFrame(inst, "s string, p string, o string"), onto)
    via_closure = sorted(
        r["s"]
        for r in closure.filter(
            (F.col("p") == "rdf:type") & (F.col("o") == "Agent")
        ).collect()
    )
    assert via_path == via_closure == ["a", "b", "c"]


def test_rdfs_entailment_rejects_meta_schema(spark):
    """review r8: ontologies that place the rdfs vocabulary in schema
    positions break the single-pass fixpoint argument (a derived rdf:type
    triple would re-enable rdfs7/rdfs2) — reject loudly rather than
    silently under-materialize."""
    from d_sparq_spark.operators.reasoning import rdfs_entailment

    triples = spark.createDataFrame(
        [("a", "ex:p", "b")], "s string, p string, o string"
    )
    for bad in [
        ("rdf:type", "rdfs:subPropertyOf", "ex:isA"),
        ("ex:isA", "rdfs:subPropertyOf", "rdf:type"),
        ("rdf:type", "rdfs:domain", "Meta"),
        ("rdfs:subClassOf", "rdfs:range", "Class"),
    ]:
        with pytest.raises(ValueError, match="schema position"):
            rdfs_entailment(triples, [bad, ("ex:p", "rdfs:domain", "C")])


def test_validate_ontology_classifies_rejection_kinds():
    """ADVICE r10 #1: only the documented meta-schema rejection carries
    the dedicated MetaSchemaOntologyError type that materialize_reasoning
    routes on (mode="iterative"); a MALFORMED ontology (non-3-tuples)
    raises a plain ValueError that must NOT select iterative mode."""
    import pytest as _pytest

    from d_sparq_spark.operators.reasoning import (
        MetaSchemaOntologyError,
        validate_ontology,
    )

    with _pytest.raises(MetaSchemaOntologyError, match="schema position"):
        validate_ontology([("rdf:type", "rdfs:subPropertyOf", "ex:isA")])
    with _pytest.raises(ValueError) as exc:
        validate_ontology([("only", "two-elements")])
    assert not isinstance(exc.value, MetaSchemaOntologyError)


def test_interstar_ndv_ordering_beats_connectivity_order(spark):
    """r9 (VERDICT r8 #7): the ndv chain estimate now orders STARS, not
    just patterns within one. Golden where the two inter-star orders
    disagree and the ndv order's FIRST inter-star intermediate is an
    order of magnitude smaller:

    - chain A(?x -e1-> ?y), B(?y -e2-> ?z), C(?z -e3-> ?w);
    - parse/connectivity order joins A >< B first: 10 shared y values x
      (20 e1 rows each) x (10 e2 rows each) = 2000 intermediate rows;
    - the ndv model seeds at the smallest star C (5 rows) and joins B:
      5 z's x 2 e2 rows each = 10 intermediate rows.

    The full BGP result is order-invariant (asserted via the engine with
    and without stats), so only the intermediate cardinality moves."""
    from d_sparq_spark.engine import SparqlEngine
    from d_sparq_spark.operators.rdf_patterns import (
        join_bindings,
        match_pattern,
        predicate_stats,
    )
    from d_sparq_spark.plans.translate import Translator

    rows = (
        [(f"x{i}", "e1", f"y{i % 10}") for i in range(200)]
        + [(f"y{i % 10}", "e2", f"z{i % 50}") for i in range(100)]
        + [(f"z{i}", "e3", f"w{i}") for i in range(5)]
    )
    triples = spark.createDataFrame(rows, "s string, p string, o string")
    stats = {
        r["p"]: (r["cnt"], r["ndv_s"], r["ndv_o"])
        for r in predicate_stats(triples).collect()
    }
    A = [TriplePattern("?x", "e1", "?y")]
    B = [TriplePattern("?y", "e2", "?z")]
    C = [TriplePattern("?z", "e3", "?w")]

    plain = Translator(triples, stats=None)._order_stars([A, B, C])
    ndv = Translator(triples, stats=stats)._order_stars([A, B, C])
    assert [s[0].p for s in plain] == ["e1", "e2", "e3"]
    assert [s[0].p for s in ndv] == ["e3", "e2", "e1"]

    def first_intermediate(order):
        return join_bindings(
            match_pattern(triples, order[0][0]),
            match_pattern(triples, order[1][0]),
        ).count()

    n_plain, n_ndv = first_intermediate(plain), first_intermediate(ndv)
    assert (n_plain, n_ndv) == (2000, 10)

    # order-invariance: the engine answers identically with and without
    # the stats that trigger the reorder
    q = "SELECT ?x ?w WHERE { ?x <e1> ?y . ?y <e2> ?z . ?z <e3> ?w }"
    got_ndv = sorted(
        tuple(r) for r in SparqlEngine(triples, stats=stats).query(q).collect()
    )
    got_plain = sorted(
        tuple(r)
        for r in SparqlEngine(triples, collect_stats=False).query(q).collect()
    )
    assert got_ndv == got_plain and len(got_ndv) > 0


def test_rdfs_iterative_closure_meta_schema(spark):
    """r9 (VERDICT r8 missing #5): ontologies placing the rdfs vocabulary
    in schema positions are rejected by the single pass but MATERIALIZED
    by rdfs_entailment_iterative. Checked three ways: against a naive
    Python one-rule-at-a-time fixpoint on a meta-schema case; equal to
    the single pass on a SAFE ontology; and the single pass still
    rejects the meta-schema input (the iterative operator is an addition,
    not a loosened guard)."""
    import pytest as _pytest

    from d_sparq_spark.operators.reasoning import (
        rdfs_entailment,
        rdfs_entailment_iterative,
    )

    inst = [
        ("s:a", "ex:worksAt", "s:acme"),
        ("s:b", "rdf:type", "c:Boss"),
    ]
    meta = [
        ("ex:worksAt", "rdfs:domain", "c:Emp"),
        ("c:Emp", "rdfs:subClassOf", "c:Person"),
        ("rdf:type", "rdfs:subPropertyOf", "ex:classified"),
        ("ex:classified", "rdfs:range", "c:Class"),
    ]
    triples = spark.createDataFrame(inst, "s string, p string, o string")
    with _pytest.raises(ValueError, match="schema position"):
        rdfs_entailment(triples, meta)
    got = sorted(
        map(tuple, rdfs_entailment_iterative(triples, meta).collect())
    )

    # naive driver-side fixpoint: raw rules, one at a time, until stable
    closure = set(inst)
    spo = [(s, o) for s, p, o in meta if p == "rdfs:subPropertyOf"]
    sco = [(s, o) for s, p, o in meta if p == "rdfs:subClassOf"]
    dom = [(s, o) for s, p, o in meta if p == "rdfs:domain"]
    rng = [(s, o) for s, p, o in meta if p == "rdfs:range"]
    while True:
        new = set()
        for s, p, o in closure:
            new.update((s, sup, o) for sub, sup in spo if p == sub)
            new.update((s, "rdf:type", c) for pp, c in dom if p == pp)
            new.update((o, "rdf:type", c) for pp, c in rng if p == pp)
            if p == "rdf:type":
                new.update((s, "rdf:type", sup) for sub, sup in sco if o == sub)
        if new <= closure:
            break
        closure |= new
    assert got == sorted(closure)
    # the meta rules genuinely iterated: class terms got typed and
    # re-classified (depth > 1 derivations present)
    assert ("c:Class", "rdf:type", "c:Class") in closure
    assert ("s:a", "ex:classified", "c:Person") in closure

    # SAFE ontology: iterative == single pass exactly
    safe = [
        ("ex:worksAt", "rdfs:domain", "c:Emp"),
        ("c:Emp", "rdfs:subClassOf", "c:Person"),
    ]
    a = sorted(map(tuple, rdfs_entailment(triples, safe).collect()))
    b = sorted(map(tuple, rdfs_entailment_iterative(triples, safe).collect()))
    assert a == b and len(a) > len(inst)
