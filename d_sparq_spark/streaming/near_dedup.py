"""Incremental NEAR-duplicate detection (MinHash-LSH) as a stream of
microbatches — the near-dup sibling of streaming/dedup.py (VERDICT r6 #5):
production LLM ingest dedups *near*-duplicates continuously, not only
exact digests.

Pipeline per microbatch, same idempotent-replay discipline as the exact
path:

1. MinHash signatures for the batch's documents -> band rows
   (operators/dedup.band_signature_rows — the SAME rows the batch
   pipeline buckets on).
2. Candidates = new band rows ⋈ persisted band store (cross-batch) ∪
   new ⋈ new (within-batch), bucket-keyed — candidates ~ true near-dup
   pairs, never n².
3. Exact token-Jaccard verification fetches texts ONLY for candidate
   partners (a candidate-selective join against the persisted text
   layer; in production that layer is the document lake itself).
4. Emit verified (a, b, jaccard) pairs under batch-<id>; append the
   batch's band rows and texts under batch-<id>.

Scale design:
- the band store grows O(corpus x num_bands) rows of (long, int, long) —
  the documented state bound; band rows, never signatures or bodies,
  are what later batches join against;
- LAYER COMPACTION (r8, VERDICT r7 #4): without it the store is one
  batch-<id> directory per microbatch forever, so at production cadence
  the file-listing cost — not the data — becomes the bottleneck. With
  compact_every=N, every N batches all layers strictly EARLIER than the
  current batch fold into a single base-<id> layer, so the live layer
  count stays O(N), while the row bound above is unchanged. The fold is
  crash-safe: a base layer is live only once its _SUCCESS marker exists,
  readers ignore any batch-i with i <= the newest committed base id, and
  stale folded directories are deleted opportunistically — a crash
  between base commit and cleanup never double-counts (see
  _live_layer_dirs / compact_layers);
- every per-batch write lands under batch-<id> and every read excludes
  the current batch id, so a foreachBatch RETRY reproduces its first
  attempt exactly (same guarantee streaming/dedup.py documents).
  Compaction preserves this: rows keep their original batch_id column
  inside the base layer (the `batch_id < current` filter keeps working on
  folded data), and the current batch's OWN layer is never folded, so a
  retry that rewrites batch-<id> cannot duplicate rows already in a base;
- pairs are emitted once, in the later document's batch: cross-batch
  candidates pair new against strictly-earlier stores, within-batch
  candidates use id order — under doc_id-ascending replay the union over
  batches equals the one-shot batch twin minhash_near_dups exactly
  (stream == batch equivalence-tested in tests/test_streaming.py).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from d_sparq_spark.operators import dedup as D

# the layered-store protocol moved to store_layers (r9) so the exact-dedup
# corpus table can share it; re-exported here because this module's tests
# and docstrings are the protocol's original specification
from d_sparq_spark.streaming.store_layers import (  # noqa: F401
    _live_layer_dirs,
    _local,
    _read_layer,
    _scan_layers,
    compact_layers,
)

BANDS_SCHEMA = "doc_id long, band int, band_hash long, batch_id long"
TEXTS_SCHEMA = "doc_id long, text string, batch_id long"
PAIRS_SCHEMA = "a long, b long, jaccard double"


def batch_band_rows(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 32,
    num_bands: int = 8,
) -> DataFrame:
    """(doc_id, band, band_hash) for a document set — signature + banding,
    the exact rows the batch pipeline's bucket join is keyed on."""
    sig = D.minhash_signature(
        docs.select("doc_id", text_col), text_col=text_col, num_hashes=num_hashes
    ).select("doc_id", "signature")
    return D.band_signature_rows(
        sig, num_bands=num_bands, rows_per_band=num_hashes // num_bands
    )


def near_dedup_foreach_batch(
    store_dir: str,
    pairs_dir: str,
    threshold: float = 0.5,
    num_hashes: int = 32,
    num_bands: int = 8,
    text_col: str = "text",
    band_fn=None,
    compact_every: int | None = None,
):
    """foreachBatch body: verify LSH candidates against the persisted band
    store, emit near-dup pairs, append this batch's bands + texts; every
    compact_every batches, fold all strictly-earlier layers into one base
    layer so the live layer count stays O(compact_every) (VERDICT r7 #4).

    band_fn maps a (doc_id, text) frame to band rows — defaults to the
    production xxhash64 banding (batch_band_rows); q_stream_near_dedup
    passes the cross-engine-deterministic variant so the streamed pair
    set carries a full generated-SQL oracle. Every non-doc_id column of
    the band rows is a bucket key (band_hash long, or a raw signature
    slice array); the band store's schema is DERIVED from the band rows
    + batch_id (review r7: a separately-passed schema string could drift
    from band_fn's output and silently null the cross-batch join)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql.types import LongType, StructField

        spark = batch_df.sparkSession
        docs = batch_df.select("doc_id", F.col(text_col).alias("text"))
        fn = band_fn or (
            lambda d: batch_band_rows(d, num_hashes=num_hashes, num_bands=num_bands)
        )
        bands_new = fn(docs).localCheckpoint()  # pin: bucket join + store append
        keys = [c for c in bands_new.columns if c != "doc_id"]
        store_schema = bands_new.schema.add(StructField("batch_id", LongType()))
        prior_bands = _read_layer(
            spark, store_dir + "/bands", store_schema, before_batch=batch_id
        )
        # cross-batch candidates: new doc vs strictly-earlier store — the
        # earlier side is always `a` (ids ascend across batches under
        # ordered replay; least/greatest keeps a < b regardless)
        old = prior_bands.select(F.col("doc_id").alias("_oid"), *keys)
        cross = (
            bands_new.join(old, keys)
            .select(
                F.least("_oid", "doc_id").alias("a"),
                F.greatest("_oid", "doc_id").alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
        )
        x, y = bands_new.alias("x"), bands_new.alias("y")
        key_eq = [F.col(f"x.{k}") == F.col(f"y.{k}") for k in keys]
        within = x.join(
            y,
            reduce(lambda a_, b_: a_ & b_, key_eq)
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        ).select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        cand = cross.unionByName(within).distinct()
        # exact verification: texts fetched for candidate partners only
        texts_all = (
            _read_layer(spark, store_dir + "/texts", TEXTS_SCHEMA, batch_id)
            .select("doc_id", "text")
            .unionByName(docs)
        )
        ta = texts_all.select(F.col("doc_id").alias("a"), F.col("text").alias("_t1"))
        tb = texts_all.select(F.col("doc_id").alias("b"), F.col("text").alias("_t2"))
        pairs = (
            cand.join(ta, "a")
            .join(tb, "b")
            .withColumn("jaccard", D.jaccard_tokens(F.col("_t1"), F.col("_t2")))
            .filter(F.col("jaccard") >= threshold)
            .select("a", "b", "jaccard")
        )
        pairs.write.mode("overwrite").parquet(f"{pairs_dir}/batch_id={batch_id}")
        bands_new.withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        ).write.mode("overwrite").parquet(f"{store_dir}/bands/batch-{batch_id}")
        docs.withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        ).write.mode("overwrite").parquet(f"{store_dir}/texts/batch-{batch_id}")
        # fold strictly-earlier layers only: a retry of THIS batch rewrites
        # batch-<id> above, so folding it would double-count its rows
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            compact_layers(spark, store_dir + "/bands", store_schema, batch_id - 1)
            compact_layers(spark, store_dir + "/texts", TEXTS_SCHEMA, batch_id - 1)

    return process


def near_dedup_stream(
    docs_stream: DataFrame,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    text_col: str = "text",
    band_fn=None,
    compact_every: int | None = None,
):
    """Wire a streaming documents source through the incremental near-dup.
    trigger(availableNow) drains a finite backlog (the replay-equivalence
    test); a processing-time trigger runs it as continuous ingest."""
    return (
        docs_stream.writeStream.foreachBatch(
            near_dedup_foreach_batch(
                store_dir, pairs_dir, threshold, text_col=text_col,
                band_fn=band_fn, compact_every=compact_every,
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
