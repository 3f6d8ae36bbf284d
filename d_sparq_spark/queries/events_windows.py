"""Event-time windowing harness queries (SURVEY §2.C streaming rows), in
batch mode with exact DuckDB oracles — window starts as epoch-microsecond
bigints so every boundary is integer arithmetic on both engines — plus a
real Structured Streaming run (rows-only) of the same tumbling logic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from d_sparq_spark.queries.helpers import sql_dsum
from d_sparq_spark.registry import register
from d_sparq_spark.sources.tables import load_table
from d_sparq_spark.streaming.windows import (
    HOUR_US,
    Q_HOUR_US,
    run_stream_to_batch,
    session_30m,
    sliding_hourly,
    stream_events,
    tumbling_hourly,
)

_TS_US = "epoch_us(date_trunc('microseconds', ts))"

# --- tumbling -----------------------------------------------------------------

_ORACLE_TUMBLING = f"""
SELECT ({_TS_US} // {HOUR_US}) * {HOUR_US} AS win_start_us,
       event_type,
       COUNT(*) AS n,
       {sql_dsum('value')} AS total
FROM events GROUP BY 1, 2
"""


@register("q_window_tumbling", oracle=_ORACLE_TUMBLING)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_hourly(load_table(spark, sf_dir, "events"))


# --- sliding ------------------------------------------------------------------

_ORACLE_SLIDING = f"""
WITH ex AS (
  SELECT (({_TS_US} // {Q_HOUR_US}) - j) * {Q_HOUR_US} AS win_start_us, value
  FROM events, range(0, 4) t(j)
)
SELECT win_start_us, COUNT(*) AS n, {sql_dsum('value')} AS total
FROM ex GROUP BY 1
"""


@register("q_window_sliding", oracle=_ORACLE_SLIDING)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_hourly(load_table(spark, sf_dir, "events"))


# --- session ------------------------------------------------------------------

_ORACLE_SESSION = f"""
WITH e AS (
  SELECT user_id, {_TS_US} AS ts_us FROM events
),
flagged AS (
  SELECT user_id, ts_us,
         CASE WHEN ts_us - lag(ts_us) OVER w >= 1800000000 OR
                   lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
),
sessions AS (
  SELECT user_id, ts_us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
)
SELECT user_id, MIN(ts_us) AS sess_start_us, COUNT(*) AS n_events
FROM sessions GROUP BY user_id, sess_id
"""


@register("q_window_session", oracle=_ORACLE_SESSION)
def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_30m(load_table(spark, sf_dir, "events"))


# --- stateful dedup (batch equivalent) -------------------------------------------

_ORACLE_DEDUP_EVENTS = """
SELECT user_id, event_type, MIN(event_id) AS first_event_id, COUNT(*) AS n
FROM events GROUP BY user_id, event_type
"""


@register("q_dedup_events", oracle=_ORACLE_DEDUP_EVENTS)
def q_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of stateful keep-first dedup on (user_id, event_type);
    the streaming form is dropDuplicatesWithinWatermark (rows-only smoke
    in tests/test_streaming.py)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"), F.count(F.lit(1)).alias("n")
    )


# --- real Structured Streaming run (rows-only) -------------------------------------


@register("q_stream_tumbling", oracle=None)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same tumbling aggregation executed through readStream +
    watermark + availableNow trigger into a memory sink. Finite input and
    complete-mode output make it deterministic; equality with the batch
    q_window_tumbling is asserted in tests/test_streaming.py."""
    name = "stream_tumbling_" + os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    stream = stream_events(spark, sf_dir)
    return run_stream_to_batch(stream, tumbling_hourly, name)


_ORACLE_OHLC = """
WITH e AS (
  SELECT date_trunc('hour', date_trunc('microseconds', ts)) AS h,
         event_type, event_id, value,
         date_trunc('microseconds', ts) AS tsu
  FROM events
),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY h, event_type
                            ORDER BY tsu, event_id) AS rn,
         row_number() OVER (PARTITION BY h, event_type
                            ORDER BY tsu DESC, event_id DESC) AS rnd
  FROM e
)
SELECT CAST(epoch_us(h) AS BIGINT) AS hour_us, event_type,
       MAX(CASE WHEN rn = 1 THEN value END) AS open,
       MAX(value) AS high, MIN(value) AS low,
       MAX(CASE WHEN rnd = 1 THEN value END) AS close,
       COUNT(*) AS n
FROM r GROUP BY 1, 2
"""


@register("q_ohlc_hourly", oracle=_ORACLE_OHLC)
def q_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling (time-series downsample): per hour and event_type,
    the first/max/min/last value — open/close picked deterministically by
    (ts, event_id). Partitioned windows only (hash on the bucket key);
    at scale this is the standard candle/rollup shape with no global
    sort anywhere."""
    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("h"),
        "event_type", "event_id", "value", "ts",
    )
    w_asc = Window.partitionBy("h", "event_type").orderBy("ts", "event_id")
    w_desc = Window.partitionBy("h", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = e.withColumn("rn", F.row_number().over(w_asc)).withColumn(
        "rnd", F.row_number().over(w_desc)
    )
    return r.groupBy(
        F.unix_micros(F.col("h")).alias("hour_us"), "event_type"
    ).agg(
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rnd") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


@register("q_stream_funnel", oracle=None)
def q_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-stream interval join (signup -> purchase within 1 h):
    two watermarked readStream sources, inner join with a time-range
    bound (evictable state), append-mode memory sink. Rows-only by
    design (streaming execution); equality with the batch q_join_range
    shape is asserted in tests/test_streaming.py."""
    from d_sparq_spark.streaming.joins import stream_stream_funnel

    name = "stream_funnel_" + os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    return stream_stream_funnel(spark, sf_dir, name)


_ORACLE_STREAM_ENRICH = """
SELECT event_id, e.user_id, c_mktsegment AS segment,
       c_nationkey AS nation, value
FROM events e LEFT JOIN customer ON e.user_id = c_custkey
"""


@register("q_stream_enrich", oracle=_ORACLE_STREAM_ENRICH)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL stream-static join (r6): events readStream left-joins the
    broadcast customer dimension, append-mode memory sink. STATELESS, so
    — unlike the windowed streaming entries — the streamed result is
    EXACTLY the batch join and carries a full DuckDB oracle: the one
    streaming query in the registry with a hash-checked oracle."""
    from d_sparq_spark.sources.tables import load_table
    from d_sparq_spark.streaming.joins import stream_static_enrich
    from d_sparq_spark.streaming.windows import run_stream_to_batch, stream_events

    customers = load_table(spark, sf_dir, "customer")
    name = "stream_enrich_" + os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    stream = stream_events(spark, sf_dir, with_watermark=None)
    return run_stream_to_batch(
        stream,
        lambda s: stream_static_enrich(s, customers),
        name,
        output_mode="append",
    )


# --- gap-fill / resample (time-series regularization) ------------------------------

_ORACLE_GAP_FILL = """
WITH h AS (
  SELECT user_id, CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour,
         (CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / COUNT(value)) AS v
  FROM events GROUP BY 1, 2
),
spans AS (
  SELECT user_id, unnest(generate_series(min(hour), max(hour), 3600)) AS hour
  FROM h GROUP BY user_id
),
j AS (SELECT s.user_id, s.hour, h.v FROM spans s LEFT JOIN h USING (user_id, hour))
SELECT user_id, hour,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
FROM j
"""


@register("q_gap_fill", oracle=_ORACLE_GAP_FILL)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + forward fill: hourly per-user average,
    missing hours materialized over each user's [min, max] span
    (F.sequence + explode — distributed, one row group per user, no
    driver-side calendar), gaps carried forward with last(ignorenulls)
    over an ordered window. Hours are epoch-second BIGINTs (integer
    arithmetic on both engines). At scale the explode output is bounded
    by users x span-hours, partitioned by user_id — no skewed global
    state; the window is per-user and Spark spills it."""
    from d_sparq_spark.queries.helpers import davg

    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "user_id",
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour"),
        )
        .agg(davg(F.col("value")).alias("v"))
    )
    spans = (
        hourly.groupBy("user_id")
        .agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.lit(3600))).alias("hour"),
        )
    )
    j = spans.join(hourly, ["user_id", "hour"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id", "hour", F.last("v", ignorenulls=True).over(w).alias("value_filled")
    )


_ORACLE_SCD2 = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
changes AS (
  SELECT user_id, ts, event_id, event_type
  FROM ordered
  WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id, event_type AS state,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
FROM changes
"""


@register("q_scd2_history", oracle=_ORACLE_SCD2)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension build from an event stream: per
    user, collapse consecutive equal states (gaps-and-islands change
    detection via lag) and emit [valid_from, valid_to) intervals, open
    interval = current state. Both windows partition by user_id — the
    shuffle is one hash partitioning on the dimension key reused by both
    window stages, no global ordering anywhere. The as-of join
    (q_join_asof) is this table's point-in-time lookup twin."""
    ev = load_table(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w_ord))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
    )
    # (ts, event_id) ordering on BOTH windows: equal timestamps would
    # otherwise make lead() engine/partitioning-dependent
    w_chg = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w_chg).alias("valid_to"),
    )
