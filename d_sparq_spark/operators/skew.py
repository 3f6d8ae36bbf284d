"""Skew-mitigation operators (SURVEY §7 'every operator shuffle-conscious').

AQE's OptimizeSkewedJoin handles most skew at runtime (enabled in
session.py), but two patterns still need explicit salting at 100 TB:

- salted_aggregate: a groupBy where a handful of keys own most rows (RDF
  predicate counts are the canonical case — rdf:type can be 30% of a
  dataset). Two-phase: aggregate on (key, salt), then re-aggregate on key.
  Phase 1 spreads each hot key over `salt_buckets` reducers; phase 2
  touches only |keys| x salt_buckets rows.
- salted_broadcast_left: a join where the LEFT side is huge and skewed on
  the join key and the right side is small-ish: replicate the right side
  salt_buckets times instead of shuffling the left — no shuffle of the
  big side at all.

Both are pure DataFrame composition — deterministic results, any engine.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: Callable[[], list[Column]],
    merges: Callable[[], list[Column]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs()   -> partial aggregate columns (aliased), e.g. [sum(x).alias('s')]
    merges() -> how to merge partials by alias, e.g. [sum('s').alias('s')]

    The salt needs ROW-level spread even when rows are byte-identical
    (e.g. the input was projected to the key columns): a hash of the
    columns alone would then collapse the hot key into one salt bucket
    and silently defeat the mitigation. monotonically_increasing_id alone
    gives every row a distinct value, so it is the WHOLE hash input —
    hashing the data columns too (an earlier form) spent per-row codegen
    on every column of what is by definition the widest, largest relation
    in the job for zero extra spread (review r4). The salt only routes
    partials, so result values are unaffected by its (retry-dependent)
    assignment."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    phase1 = df.withColumn("__dsq_salt", salt).groupBy(*key_cols, "__dsq_salt").agg(*aggs())
    return phase1.groupBy(*key_cols).agg(*merges())


def salted_count_by_key(df: DataFrame, key_cols: list[str], salt_buckets: int = 32) -> DataFrame:
    """Skew-safe COUNT(*) per key — predicate statistics (A11) at 100 TB."""
    return salted_aggregate(
        df,
        key_cols,
        aggs=lambda: [F.count(F.lit(1)).alias("_partial")],
        merges=lambda: [F.sum("_partial").cast("long").alias("cnt")],
        salt_buckets=salt_buckets,
    )


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join a huge skewed left side with a small right side WITHOUT
    shuffling the left: salt the left per row, explode the right across all
    salt values, broadcast-join on (key, salt). Row multiplicity is
    unchanged (each left row matches exactly its own salt's copy)."""
    big_s = big.withColumn(
        "__dsq_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)).cast(
            "long"
        ),
    )
    small_s = small.withColumn(
        "__dsq_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>"))
    )
    out = big_s.join(F.broadcast(small_s), on=[key, "__dsq_salt"])
    return out.drop("__dsq_salt")
