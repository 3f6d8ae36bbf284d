"""Every registered query with an oracle must match DuckDB exactly.

This is the local replica of the driver's t2 correctness gate
(__spark_entry__.py docstring); it runs at sf0.001 for speed. Set
TEST_ORACLE_SF_DIR=/root/testdata/sf0.01 to replicate the driver scale.
"""

import pytest

from d_sparq_spark import registry
from tests.conftest import SF_ORACLE
from tests.oracle import compare_query

ORACLE_QUERIES = sorted(n for n, q in registry.all_queries().items() if q.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, q in registry.all_queries().items() if not q.oracle)


# The full parameterized sweep (~230 cases) is slow-marked (VERDICT r11
# #1): it already runs standalone as tools/emit_local_oracle.py (the
# LOCAL_ORACLE_* artifacts), and the driver's own t2 gate re-runs it
# against DuckDB — the default pytest profile should not pay it a third
# time. The smoke/guard tests below stay in the fast lane.
@pytest.mark.slow
@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, name):
    compare_query(spark, name, SF_ORACLE)


@pytest.mark.slow
@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    df = registry.all_queries()[name].fn(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(queries_keys := e.queries().keys()) >= set(e.oracle_sql().keys())
    assert "q_flagship" in queries_keys


_SELECTIVE_TPCH = ["q_tpch_q2", "q_tpch_q7", "q_tpch_q11", "q_tpch_q20"]


@pytest.mark.parametrize("name", _SELECTIVE_TPCH)
def test_selective_tpch_nonvacuous(spark, name):
    """Guard against vacuous oracle passes (review r4): these four carry
    the most selective predicates in the suite, and an empty-vs-empty
    compare would wave through an inverted threshold or swapped MIN/MAX.
    Their constants are chosen to select rows even at sf0.001 — if data
    regeneration empties them, pick new constants, don't drop the test."""
    assert registry.all_queries()[name].fn(spark, SF_ORACLE).count() > 0


def test_semantic_dedup_flags_some_dups(spark):
    """is_dup=false-everywhere would pass the oracle vacuously if the
    threshold drifted above the corpus' cosine range; the synthetic
    embeddings contain >=0.4 within-cluster pairs at every SF."""
    from pyspark.sql import functions as F

    df = registry.all_queries()["q_semantic_dedup"].fn(spark, SF_ORACLE)
    counts = {
        r["is_dup"]: r["n"]
        for r in df.groupBy("is_dup").agg(F.count("*").alias("n")).collect()
    }
    assert counts.get(True, 0) > 0 and counts.get(False, 0) > 0


def test_quality_filter_null_scores_sort_last_both_engines(spark, tmp_path):
    """Review r4: an empty-text doc scores NULL (alpha_ratio's deliberate
    NULL), and Spark's ASC default is NULLS FIRST vs DuckDB's NULLS LAST
    — unpinned, one empty doc shifts every percent_rank in its language.
    Build a mini corpus WITH an empty doc and run the full driver-style
    compare on it."""
    import os

    sfdir = str(tmp_path / "sf_null")
    os.makedirs(sfdir)
    for t in os.listdir(SF_ORACLE):
        if t.endswith(".parquet") and t != "documents.parquet":
            os.symlink(os.path.join(SF_ORACLE, t), os.path.join(sfdir, t))
    docs = [
        (0, "good words here and more of them", "en", "web", 33),
        (1, "", "en", "web", 0),  # NULL quality score
        (2, "short text", "en", "web", 10),
        (3, "autre texte de qualite raisonnable", "fr", "web", 34),
    ]
    import pandas as pd

    # single parquet FILE (pandas), matching the testdata layout — a Spark
    # write would make a directory DuckDB's read_parquet can't open as-is
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(os.path.join(sfdir, "documents.parquet"), index=False)
    compare_query(spark, "q_quality_filter", sfdir)
