"""Property-based tests (SURVEY.md §5.3, hypothesis):

- dictionary encode -> decode is the identity for arbitrary term sets,
- N-Triples format -> parse is the identity for arbitrary term content,
- BGP results are invariant under pattern permutation (the optimizer may
  reorder patterns freely — A7 — without changing semantics).

One shared SparkSession; hypothesis drives the data, Spark the engine.
Deadlines disabled: Spark job latency is not the property under test.
"""

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from d_sparq_spark.operators.dictionary import build_dictionary, decode_triples, encode_triples
from d_sparq_spark.operators.rdf_patterns import TriplePattern, star_join
from d_sparq_spark.sources.ntriples import format_ntriples, parse_ntriples

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# printable, no control chars; literals may contain quotes/backslashes
_term_chars = string.ascii_letters + string.digits + " .:#/\\\"'-_"
terms = st.text(_term_chars, min_size=1, max_size=24).map(str.strip).filter(bool)
iri_terms = st.from_regex(r"[a-z]{1,5}:[A-Za-z0-9_]{1,10}", fullmatch=True)
triple_lists = st.lists(
    st.tuples(iri_terms, iri_terms, st.one_of(terms, iri_terms)),
    min_size=1,
    max_size=30,
)


@SETTINGS
@given(data=triple_lists)
def test_dict_roundtrip_identity(spark, data):
    triples = spark.createDataFrame(data, "s string, p string, o string").distinct()
    d = build_dictionary(triples)
    back = decode_triples(encode_triples(triples, d), d)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, triples.collect()))


@SETTINGS
@given(data=triple_lists)
def test_ntriples_roundtrip_identity(spark, data):
    triples = spark.createDataFrame(data, "s string, p string, o string")
    back = parse_ntriples(format_ntriples(triples))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, triples.collect()))


@SETTINGS
@given(perm=st.permutations([0, 1, 2]))
def test_bgp_pattern_order_invariance(spark, perm):
    rows = [
        ("a", "p1", "x"), ("a", "p2", "y"), ("a", "p3", "z"),
        ("b", "p1", "x"), ("b", "p2", "y2"), ("b", "p3", "z"),
        ("c", "p1", "x2"), ("c", "p2", "y"), ("c", "p3", "z"),
    ]
    triples = spark.createDataFrame(rows, "s string, p string, o string")
    patterns = [
        TriplePattern("?s", "p1", "?a"),
        TriplePattern("?s", "p2", "?b"),
        TriplePattern("?s", "p3", "z"),
    ]
    permuted = [patterns[i] for i in perm]
    base = star_join(triples, patterns)
    out = star_join(triples, permuted)
    key = lambda df: sorted(tuple(r[c] for c in sorted(df.columns)) for r in df.collect())
    assert key(out) == key(base)


@SETTINGS
@given(data=st.lists(st.tuples(iri_terms, iri_terms, iri_terms), min_size=1, max_size=12))
def test_update_insert_then_delete_is_identity(spark, data):
    """Graph-set semantics of UPDATE: INSERT DATA of arbitrary NEW ground
    triples followed by DELETE DATA of the same triples returns exactly
    the original store (anti-join both ways, no dedup side effects)."""
    from d_sparq_spark.engine import SparqlEngine

    base = [("b:s1", "b:p", "b:o1"), ("b:s2", "b:p", "b:o2")]
    store = spark.createDataFrame(base, "s string, p string, o string")
    eng = SparqlEngine(store, collect_stats=False)
    block = " . ".join(f"{s} {p} {o}" for s, p, o in data)
    inserted = eng.update(f"INSERT DATA {{ {block} }}")
    after = SparqlEngine(inserted, collect_stats=False).update(
        f"DELETE DATA {{ {block} }}"
    )
    want = sorted(set(base) - set(data))  # data may collide with base rows
    assert sorted(tuple(r) for r in after.collect()) == want


_nodes = st.integers(min_value=0, max_value=9)
_edge_lists = st.lists(st.tuples(_nodes, _nodes), min_size=1, max_size=25)


@SETTINGS
@given(edges=_edge_lists, seeds=st.lists(_nodes, min_size=1, max_size=3))
def test_seeded_closure_equals_filtered_full_closure(spark, edges, seeds):
    """seeded_closure (strided frontier, hub guard, probe-first) must
    equal the full doubling closure restricted to the seed sources — on
    arbitrary small graphs including cycles and self-loops."""
    from d_sparq_spark.operators.paths import seeded_closure, transitive_closure

    e = spark.createDataFrame(
        [(f"n{a}", f"n{b}") for a, b in edges], "src string, dst string"
    )
    s = spark.createDataFrame([(f"n{x}",) for x in set(seeds)], "n string")
    got = sorted(map(tuple, seeded_closure(e, s).collect()))
    full = transitive_closure(e)
    want = sorted(
        map(tuple, full.join(s, full["src"] == s["n"], "left_semi").collect())
    )
    assert got == want


# ---- round-3 graph/windowed operators vs brute force -------------------------

_edge_lists = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda t: t[0] != t[1]),
    min_size=0,
    max_size=30,
)


@SETTINGS
@given(pairs=_edge_lists)
def test_triangles_match_bruteforce(spark, pairs):
    from itertools import combinations

    from d_sparq_spark.operators.graph import triangles_degree_ordered

    canon = sorted({(min(u, v), max(u, v)) for u, v in pairs})
    eset = set(canon)
    expected = {
        frozenset((a, b, c))
        for a, b, c in combinations(sorted({n for e in canon for n in e}), 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    }
    if not canon:
        return
    edges = spark.createDataFrame(canon, "u long, v long")
    got = {frozenset((r.a, r.b, r.c)) for r in triangles_degree_ordered(edges).collect()}
    assert got == expected


_part_rows = st.lists(
    st.tuples(st.sampled_from(["X", "Y"]), st.integers(1, 8), st.integers(1, 8)),
    min_size=1,
    max_size=25,
)


@SETTINGS
@given(rows=_part_rows)
def test_skyline_matches_bruteforce(spark, rows):
    """The windowed sweep must equal the quadratic dominance definition
    for arbitrary (brand, price, size) multisets — including ties on
    either axis, which is where sweep formulations usually break."""
    from d_sparq_spark.queries.relational_windows import pareto_sweep

    data = [(b, i, float(p), s) for i, (b, p, s) in enumerate(rows)]
    expected = {
        (b, i)
        for b, i, p, s in data
        if not any(
            b2 == b and p2 <= p and s2 >= s and (p2 < p or s2 > s)
            for b2, _, p2, s2 in data
        )
    }
    df = spark.createDataFrame(data, "brand string, id long, price double, size int")
    got = {(r.brand, r.id) for r in pareto_sweep(df, "brand", "price", "size").collect()}
    assert got == expected


# ---- r4 (VERDICT r3 #10): skew-operator equivalence under adversarial inputs

_skew_keys = st.sampled_from(["hot", "hot", "hot", "warm", "k1", "k2"])  # skewed alphabet
_skew_rows = st.lists(st.tuples(_skew_keys, st.integers(-100, 100)), min_size=0, max_size=40)


@SETTINGS
@given(rows=_skew_rows, buckets=st.sampled_from([1, 2, 7]))
def test_salted_count_equals_plain_groupby(spark, rows, buckets):
    """salted_count_by_key == groupBy().count() for any input, including
    the r3 degeneracy class: all-identical rows, inputs PROJECTED to the
    key column (no other entropy for the salt), and empty partitions."""
    from pyspark.sql import functions as F

    from d_sparq_spark.operators.skew import salted_count_by_key

    df = spark.createDataFrame(rows, "k string, v long").repartition(8)
    # key-projected shape: the salt sees byte-identical rows
    proj = df.select("k")
    got = sorted(
        map(tuple, salted_count_by_key(proj, ["k"], salt_buckets=buckets).collect())
    )
    want = sorted(
        map(tuple, proj.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect())
    )
    assert got == want


@SETTINGS
@given(rows=_skew_rows, buckets=st.sampled_from([1, 3]))
def test_salted_aggregate_equals_plain_sum(spark, rows, buckets):
    from pyspark.sql import functions as F

    from d_sparq_spark.operators.skew import salted_aggregate

    df = spark.createDataFrame(rows, "k string, v long").repartition(8)
    got = sorted(
        map(
            tuple,
            salted_aggregate(
                df,
                ["k"],
                aggs=lambda: [F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")],
                merges=lambda: [
                    F.sum("s").cast("long").alias("s"),
                    F.sum("n").cast("long").alias("n"),
                ],
                salt_buckets=buckets,
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            df.groupBy("k")
            .agg(F.sum("v").cast("long").alias("s"), F.count(F.lit(1)).cast("long").alias("n"))
            .collect(),
        )
    )
    assert got == want


@SETTINGS
@given(
    rows=_skew_rows,
    small=st.lists(st.tuples(_skew_keys, st.integers(0, 9)), min_size=0, max_size=6),
)
def test_salted_broadcast_left_equals_plain_join(spark, rows, small):
    """Row multiplicity must be EXACTLY the plain inner join's — duplicate
    keys on the small side multiply rows identically, missing keys drop
    them identically, and an all-identical big side (no salt entropy
    beyond the row id) changes nothing."""
    from d_sparq_spark.operators.skew import salted_broadcast_left

    big = spark.createDataFrame(rows, "k string, v long").repartition(8)
    sm = spark.createDataFrame(small, "k string, tag long")
    got = sorted(map(tuple, salted_broadcast_left(big, sm, "k", salt_buckets=4).collect()))
    want = sorted(map(tuple, big.join(sm, "k").collect()))
    assert got == want


def test_pareto_sweep_null_and_extreme_values(spark):
    """Review r4: NULL group/price/size rows are INCOMPARABLE under the
    NOT EXISTS dominance definition — always in the skyline, never
    dominating; and a size of INT_MIN must not collide with the old
    no-cheaper-price sentinel."""
    from d_sparq_spark.queries.relational_windows import pareto_sweep

    df = spark.createDataFrame(
        [
            ("X", 0, None, 8.0),      # NULL price: kept, must NOT dominate id=1
            ("X", 1, 1.0, 5.0),       # only comparable row in X: kept
            ("Y", 2, 1.0, float(-(2 ** 31))),  # INT_MIN-ish size, sole row: kept
            ("Y", 3, 2.0, None),      # NULL size: kept
            (None, 4, 1.0, 1.0),      # NULL group: kept (no same-group row)
            ("Z", 5, 1.0, 9.0),       # dominates id=6
            ("Z", 6, 2.0, 3.0),
        ],
        "g string, id long, price double, size double",
    )
    got = {r["id"] for r in pareto_sweep(df, "g", "price", "size").collect()}
    assert got == {0, 1, 2, 3, 4, 5}
