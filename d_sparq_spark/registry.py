"""Query registry — the single source of truth behind ``__spark_entry__``.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) the equivalent DuckDB oracle SQL. The
driver's correctness harness compares the two at sf0.01 (row count +
schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides,
- floating aggregates are computed via exact decimal sums cast back to
  double, so the result is independent of Spark's partial-aggregation
  order (a double sum is not associative; a decimal sum is exact).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as queries()[name] with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # ship the package to executor Python workers once per session —
            # UDF closures pickle by module reference and the harness may
            # drive from any cwd (session.ship_package docstring).
            from d_sparq_spark.session import ship_package

            ship_package(spark)
            # date_trunc/unix_timestamp are session-timezone dependent and
            # every oracle assumes UTC; pin it (container default is UTC,
            # this guards against a non-UTC harness session).
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = Query(name=name, fn=wrapped, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect modules lazily to avoid cycles.
    from d_sparq_spark import queries as _q  # noqa: F401

    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
