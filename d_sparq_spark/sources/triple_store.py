"""Triple-store layouts at rest (SURVEY §2.A A9/A10, §1.2).

The reference bulk-loads subject-grouped documents into per-node MongoDB
collections placed by METIS partition, with boundary triples replicated so
star/path joins are node-local. Spark replaces all of that with two
columnar Parquet layouts:

- ``by_p/``  — partitionBy('p'): vertical partitioning (one directory per
  predicate, the S2RDF "VP" layout). A pattern with a bound predicate
  prunes to one directory — Catalyst partition pruning IS the predicate
  index.
- ``by_s``   — bucketBy(n, 's') sorted by s: star joins (self-joins on s)
  become co-partitioned joins with NO shuffle, the analogue of MongoDB's
  subject grouping + METIS placement. Bucketed tables need the session
  catalog (saveAsTable), so this layout lives in the warehouse.

At 100 TB: by_p holds ~|P| directories (RDF predicate counts are small,
typically < 10k); within each, row-group min/max on s gives secondary
pruning. Bucket count should be sized so each bucket*predicate slice fits
an executor (e.g. 4096 buckets for 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_vp(
    triples_enc: DataFrame,
    base_path: str,
    mode: str = "overwrite",
    dynamic: bool = False,
) -> None:
    """Vertical-partitioned copy: one directory per predicate. This
    function OWNS the by_p layout contract alongside read_vp — loaders
    must call it instead of re-spelling the write (review r7: bulk_load
    and append_load each had an inline copy that could drift).
    ``dynamic=True`` (delete_load's partition rewrite) overwrites ONLY the
    partitions present in ``triples_enc`` — a per-writer option, so the
    session-level partitionOverwriteMode is never mutated. Callers must
    handle partitions that became EMPTY themselves (no rows for p ⇒ the
    old directory is left untouched by a dynamic overwrite)."""
    w = triples_enc.write.mode(mode)
    if dynamic:
        w = w.option("partitionOverwriteMode", "dynamic")
    w.partitionBy("p").parquet(f"{base_path}/by_p")


def read_vp(spark: SparkSession, base_path: str) -> DataFrame:
    """Read the VP layout back with the store's BIGINT contract on p:
    partition-directory type inference returns INT for id ranges under
    2^31, and the encoded engine's decode step (bigint-columns-only)
    would then silently leak raw integer predicate ids (review r4 — the
    cast used to live only in load_pipeline.store_triples, leaving this
    public reader broken)."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{base_path}/by_p")
    return df.withColumn("p", F.col("p").cast("long"))


def write_bucketed(triples_enc: DataFrame, table: str, buckets: int = 32) -> None:
    """Subject-bucketed catalog table for shuffle-free star self-joins."""
    (
        triples_enc.write.mode("overwrite")
        .bucketBy(buckets, "s")
        .sortBy("s")
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
