"""Vectorized pandas UDF definitions (SCALAR + GROUPED_AGG).

Kept in their own module WITHOUT ``from __future__ import annotations``:
pandas_udf infers the eval type from the *resolved* type hints, and
postponed evaluation turns them into strings it cannot resolve unless
pandas is importable in the defining module's globals.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def tok_count(s: pd.Series) -> pd.Series:
    """Whitespace token count per row — Arrow column batches in/out.
    Nullable Int64: a NULL text stays NULL (int64 would raise on NaN)."""
    return s.str.split(" ").str.len().astype("Int64")


@pandas_udf("long")
def total_chars(v: pd.Series) -> int:
    """GROUPED_AGG: one Arrow batch per group reduced to a scalar.
    Integer sum — partial-aggregation order cannot perturb the result.
    An all-NULL group returns None like SQL's SUM (review r4: pandas'
    skipna sum would silently yield 0 there, forking the oracle)."""
    return None if v.count() == 0 else int(v.sum())


from pyspark.sql.functions import udtf  # noqa: E402


@udtf(returnType="chunk_idx int, chunk string")
class ChunkUdtf:
    """Python UDTF: non-overlapping 100-char chunks, one output row each.
    Deterministic pure function of the input -> exactly oracle-checkable."""

    def eval(self, text: str):
        if text is None:
            # match the SQL oracle exactly: substr(NULL, ...) is NULL and
            # DuckDB's greatest(NULL, 0) = 0 gives one chunk row (review
            # r4: coercing to '' emitted chunk='' instead of NULL)
            yield 0, None
            return
        for i in range(0, max(len(text), 1), 100):
            yield i // 100, text[i : i + 100]
