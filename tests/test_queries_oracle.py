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


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, name):
    compare_query(spark, name, SF_ORACLE)


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
