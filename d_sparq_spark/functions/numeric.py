"""Shared expression helpers for oracle-stable results.

A double sum depends on accumulation order, and Spark's partial/final
aggregation order differs run to run and from DuckDB's. To make value
hashes reproducible on both sides, money-style aggregates are computed as
exact decimal sums and cast back to double:

  Spark : F.sum(expr.cast("decimal(25,6)")).cast("double")
  DuckDB: CAST(SUM(CAST(expr AS DECIMAL(25,6))) AS DOUBLE)

The decimal cast rounds the (deterministic, IEEE-exact) double expression
to 6 fractional digits identically in both engines; the decimal sum is
exact; the final double cast is deterministic. Inputs here carry at most
~4 meaningful fractional digits, so 6 digits loses nothing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(25,6)"


def dsum(expr: Column) -> Column:
    """Order-insensitive SUM of a double expression (exact decimal sum)."""
    return F.sum(expr.cast(DEC)).cast("double")


def davg(expr: Column) -> Column:
    """Order-insensitive AVG: (exact decimal sum as double) / count.

    The division happens in double on BOTH engines (identical inputs ->
    identical IEEE result); dividing as decimal would hit each engine's own
    decimal-quotient scale/rounding rules, which differ."""
    return dsum(expr) / F.count(expr)


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"({sql_dsum(expr)} / COUNT({expr}))"
