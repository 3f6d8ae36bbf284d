"""Parquet table access for the driver-provided TPC-H-ish tables.

Replaces the reference's MongoDB bulk-load path (D-SPARQ `load/` MapReduce
jobs, SURVEY.md §2 A10): at rest everything is columnar Parquet, and a scan
is ``spark.read.parquet`` — Catalyst handles predicate pushdown, column
pruning, and partition pruning, which the reference implemented manually as
MongoDB index lookups.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from d_sparq_spark import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(table_path(sf_dir, name))


def ns_long_to_timestamp():
    """ns-long 'ts' -> TIMESTAMP via integer FLOOR division (ns -> us).

    Integer division keeps full precision (double division loses bits
    above 2^53); `div` truncates toward zero, which rounds pre-1970
    values UP by one microsecond — the CASE subtracts the borrow when the
    remainder is negative so the truncation is a true floor, matching
    DuckDB's ns->us semantics. SHARED by the batch loader and the
    streaming source (review r4 wave 7: the expression was copy-pasted,
    and the negative-remainder borrow is exactly the part a one-sided fix
    would fork)."""
    from pyspark.sql import functions as F

    return F.timestamp_micros(
        F.expr("ts div 1000 - CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END")
    )


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize events.ts to a session-tz TIMESTAMP regardless of how the
    generator wrote it. Parquet TIMESTAMP(NANOS) is rejected outright by
    Spark's reader (PARQUET_TYPE_ILLEGAL), so the nanosAsLong conf reads it
    as a raw ns long which we floor-truncate to microseconds — Spark's
    native precision (floor keeps >=/< against whole-microsecond literals
    consistent with the DuckDB oracle). Micros-precision files arrive as
    TIMESTAMP_NTZ under that same conf and just need the tz-flavor cast
    (values are identical under the pinned UTC session).
    """
    from pyspark.sql import functions as F

    # only flip the legacy conf when the file genuinely needs it: a
    # micros-precision file reads fine without mutating session state
    # (review r4). When the NANOS read fails, the conf must stay set for
    # the session — Spark captures SQLConf at EXECUTION time, so a
    # set/restore around this lazy read would break the plan later. But
    # when the RETRY fails too (missing path, corrupt footer — review r4
    # wave 7), the failure was never the NANOS case: restore the conf
    # before re-raising so an unrelated error can't leave the whole
    # session running under nanosAsLong.
    try:
        df = spark.read.parquet(table_path(sf_dir, "events"))
    except Exception:
        _CONF = "spark.sql.legacy.parquet.nanosAsLong"
        prev = spark.conf.get(_CONF, None)
        spark.conf.set(_CONF, "true")
        try:
            df = spark.read.parquet(table_path(sf_dir, "events"))
        except Exception:
            spark.conf.unset(_CONF) if prev is None else spark.conf.set(_CONF, prev)
            raise
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        return df.withColumn("ts", ns_long_to_timestamp())
    if ts_type != "timestamp":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() queries can run
    against the same names the DuckDB oracle uses."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
