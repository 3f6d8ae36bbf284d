"""compact_store (r10): small-file compaction of the VP layouts.

Content-neutral (decoded base, entailed layer, stats, meta all identical
before/after), file counts reduced to the size-implied target, idempotent
second run, and the reasoned engine answers identically over the
compacted store."""

import os

from d_sparq_spark.load_pipeline import (
    _read_meta,
    append_load,
    bulk_load,
    compact_store,
    entailed_triples,
    materialize_reasoning,
    open_store,
    reasoned_triples,
    store_triples,
)
from tests.test_reasoning_store import BASE, DELTA, ONT, _decoded, _nt


def _n_files(root):
    out = 0
    for dirpath, _dirs, files in os.walk(os.path.join(root, "by_p")):
        out += sum(1 for f in files if f.startswith("part-"))
    return out


def test_compact_preserves_content_and_reduces_files(spark, tmp_path):
    base = _nt(tmp_path / "b.nt", BASE)
    delta = _nt(tmp_path / "d.nt", DELTA)
    delta2 = _nt(tmp_path / "d2.nt", [
        "<s:e> <p:worksAt> <s:acme>", "<s:e> <rdf:type> <c:Manager>",
    ])
    store = str(tmp_path / "s")
    bulk_load(spark, base, store)
    materialize_reasoning(spark, store, ONT)
    append_load(spark, delta, store)
    append_load(spark, delta2, store)  # scatters more files per dir

    base0 = _decoded(spark, store, store_triples(spark, store))
    ent0 = _decoded(spark, store, entailed_triples(spark, store))
    stats0 = sorted(
        map(tuple, spark.read.parquet(os.path.join(store, "stats")).collect())
    )
    meta0 = _read_meta(spark, store)
    files_before = _n_files(store)

    info = compact_store(spark, store)
    assert info["base"]["partitions_compacted"] > 0
    assert info["base"]["files_after"] < info["base"]["files_before"]
    # at test scale every partition fits one target file
    assert _n_files(store) < files_before

    # content-neutral across every surface
    assert _decoded(spark, store, store_triples(spark, store)) == base0
    assert _decoded(spark, store, entailed_triples(spark, store)) == ent0
    assert sorted(
        map(tuple, spark.read.parquet(os.path.join(store, "stats")).collect())
    ) == stats0
    assert _read_meta(spark, store) == meta0

    # the reasoned engine still answers through the compacted layers
    q = "SELECT ?s WHERE { ?s <rdf:type> <c:Person> }"
    got = sorted(
        r["s"] for r in open_store(spark, store, reasoning=True).query(q).collect()
    )
    assert "s:c" in got and "s:e" in got  # delta + delta2 entailments

    # idempotent: everything already at target
    info2 = compact_store(spark, store)
    assert info2["base"]["partitions_compacted"] == 0
    assert info2.get("entailed", {}).get("partitions_compacted", 0) == 0


def test_compact_predicate_narrowing(spark, tmp_path):
    """predicates=[...] compacts only the named partitions; others keep
    their file layout untouched (mtime-stable)."""
    base = _nt(tmp_path / "b.nt", BASE)
    delta = _nt(tmp_path / "d.nt", DELTA)
    store = str(tmp_path / "s")
    bulk_load(spark, base, store)
    append_load(spark, delta, store)
    ids = {
        r["term"]: r["id"]
        for r in spark.read.parquet(os.path.join(store, "dict")).collect()
    }
    works, likes = ids["p:worksAt"], ids["p:likes"]
    likes_dir = os.path.join(store, "by_p", f"p={likes}")
    sig_before = sorted(os.listdir(likes_dir))
    before = _decoded(spark, store, store_triples(spark, store))
    info = compact_store(spark, store, predicates=[works])
    assert info["base"]["partitions_compacted"] == 1
    assert sorted(os.listdir(likes_dir)) == sig_before  # untouched
    assert _decoded(spark, store, store_triples(spark, store)) == before
