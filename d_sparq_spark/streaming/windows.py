"""Event-time window aggregations — one implementation, two execution
modes. The column logic (tumbling/sliding/session windows) is shared
between batch DataFrames (oracle-checkable) and readStream DataFrames
(with watermarks); Structured Streaming guarantees the same results up to
late-data handling, which is exactly what tests/test_streaming.py checks.

Window starts are returned as epoch MICROSECOND bigints, not timestamps:
events.ts is ns-precision parquet (truncated to us on load, see
sources/tables.py) and integer window arithmetic is engine-exact, so the
DuckDB oracle reproduces every boundary bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from d_sparq_spark.functions.numeric import dsum

HOUR_US = 3_600_000_000
Q_HOUR_US = 900_000_000


def tumbling_hourly(events: DataFrame) -> DataFrame:
    """1-hour tumbling windows per event_type: count + exact value sum."""
    agg = events.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total"))
    return agg.select(
        F.unix_micros(F.col("w.start")).alias("win_start_us"), "event_type", "n", "total"
    )


def sliding_hourly(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 15 min (each event lands in 4)."""
    agg = events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w")).agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("value")).alias("total")
    )
    return agg.select(F.unix_micros(F.col("w.start")).alias("win_start_us"), "n", "total")


def session_30m(events: DataFrame) -> DataFrame:
    """30-minute-gap session windows per user: session start + event count."""
    agg = events.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return agg.select(
        "user_id", F.unix_micros(F.col("w.start")).alias("sess_start_us"), "n_events"
    )


_TS_IS_LONG_CACHE: dict[tuple[str, str], bool] = {}


def stream_events(spark, sf_dir: str, with_watermark: str | None = "10 minutes") -> DataFrame:
    """readStream over the same events parquet. The file stream source
    needs a pinned schema, and the generator's ts physical type varies by
    round (TIMESTAMP(NANOS) -> ns long under nanosAsLong, vs plain micros
    TIMESTAMP), so probe the batch reader's dtype ONCE PER (session,
    sf_dir) — a per-sf_dir constant; stream-stream queries build several
    sources per run and must not re-read footers each time — and pin to
    match; the normalization then mirrors sources/tables._load_events."""
    from d_sparq_spark.sources.tables import table_path

    # keyed on the applicationId, not id(spark): a freed session object's
    # address can be reused by a NEW session, which would then hit a stale
    # cached dtype for the same sf_dir
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _TS_IS_LONG_CACHE:
        # probe WITHOUT mutating session state first (review r4 wave 7:
        # an unconditional nanosAsLong set here re-introduced the global
        # conf flip _load_events was changed to avoid — a lazy batch plan
        # built earlier would execute under the flipped conf). Only a
        # genuine NANOS file (probe read fails, conf'd retry succeeds)
        # flips it, mirroring _load_events exactly.
        try:
            _TS_IS_LONG_CACHE[key] = (
                dict(spark.read.parquet(table_path(sf_dir, "events")).dtypes)["ts"]
                == "bigint"
            )
        except Exception:
            _CONF = "spark.sql.legacy.parquet.nanosAsLong"
            prev = spark.conf.get(_CONF, None)
            spark.conf.set(_CONF, "true")
            try:
                dict(spark.read.parquet(table_path(sf_dir, "events")).dtypes)
            except Exception:
                spark.conf.unset(_CONF) if prev is None else spark.conf.set(_CONF, prev)
                raise
            _TS_IS_LONG_CACHE[key] = True
    ts_is_long = _TS_IS_LONG_CACHE[key]
    schema = (
        f"event_id long, ts {'long' if ts_is_long else 'timestamp'}, "
        "user_id long, event_type string, value double, props string"
    )
    # the file-stream source requires a DIRECTORY base path; events.parquet
    # is a single file, so stream the parent dir with a glob filter.
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = raw
    if ts_is_long:
        from d_sparq_spark.sources.tables import ns_long_to_timestamp

        ev = raw.withColumn("ts", ns_long_to_timestamp())
    if with_watermark:
        ev = ev.withWatermark("ts", with_watermark)
    return ev


def run_stream_to_batch(
    stream_df: DataFrame, agg_fn, name: str, output_mode: str = "complete"
) -> DataFrame:
    """Run a windowed aggregation over a finite stream with
    trigger(availableNow) into a memory sink; returns the final table.
    Used for batch-vs-stream equivalence tests and the rows-only harness
    entry (real streaming execution, deterministic because input is
    finite and complete-mode output)."""
    q = (
        agg_fn(stream_df)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise TimeoutError(
            f"streaming query {name!r} did not finish within 300 s — "
            "refusing to return a partial memory-sink snapshot"
        )
    return stream_df.sparkSession.table(name)


def dedup_within_watermark(stream_df: DataFrame) -> DataFrame:
    """Stateful streaming dedup on event_id (state expires with the
    watermark — bounded memory at any scale)."""
    return stream_df.dropDuplicatesWithinWatermark(["event_id"])
