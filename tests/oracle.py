"""Local replica of the driver's DuckDB-oracle comparison.

Mimics __spark_entry__ verification: run the Spark query and the DuckDB
oracle SQL on the same parquet tables, then compare row count, column
names, and order-insensitive values. Values are compared exactly (after
sorting rows), because the driver hashes values — a 1-ulp float diff is
a failure there, so it is a failure here too.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from d_sparq_spark import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for name in TABLES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def run_invariant(sql: str, sf_dir: str, frames: dict) -> pd.DataFrame:
    """Structural-invariant check (r10, VERDICT r9 #7): run ``sql`` with
    the parquet tables AND the caller's DataFrames (e.g. the Spark query
    result as ``spark_result``) registered as views, returning the
    VIOLATION rows — an empty result is a pass. Used where the exact
    oracle's unrolled-iteration CTE blows up DuckDB at the larger scale:
    the invariant characterizes the answer (fixpoint equations +
    tightness), so a pass carries exact-oracle weight when the invariant
    is cross-validated against the exact oracle at the small scale first
    (tests do that, plus perturbation-rejection)."""
    con = duckdb.connect()
    try:
        for name in TABLES:
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
            )
        for name, df in frames.items():
            con.register(name, df)
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize cell values, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(_canon_value)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _canon_value(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        return repr(v)
    if pd.isna(v):
        return "<null>"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(str(_canon_value(x)) for x in v) + "]"
    return str(v)


def compare_query(spark, name: str, sf_dir: str) -> None:
    """Assert Spark result == DuckDB oracle for registered query `name`."""
    from d_sparq_spark import registry

    q = registry.all_queries()[name]
    spark_df = q.fn(spark, sf_dir).toPandas()
    assert q.oracle is not None, f"{name} has no oracle (rows-only query)"
    oracle_df = run_oracle(q.oracle, sf_dir)

    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} (spark) != {len(oracle_df)} (oracle)"
    )
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: columns {sorted(spark_df.columns)} != {sorted(oracle_df.columns)}"
    )
    s, o = canon(spark_df), canon(oracle_df)
    if not s.equals(o):
        diff_mask = (s != o).any(axis=1)
        sample = pd.concat(
            [s[diff_mask].head(5).add_suffix("_spark"), o[diff_mask].head(5).add_suffix("_oracle")],
            axis=1,
        )
        raise AssertionError(f"{name}: value mismatch in {int(diff_mask.sum())} rows:\n{sample}")
