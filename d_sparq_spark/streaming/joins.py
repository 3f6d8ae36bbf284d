"""Stream-stream joins (Structured Streaming). The batch twin of this
shape is q_join_range (signup -> purchase within 1 hour per user); here
BOTH sides are streams, which is the shape Spark requires watermarks +
a time-range join condition for: the range bound lets the engine compute
how long a left row can possibly find a right match, so buffered state
is evicted as the watermark advances — bounded memory at any scale,
instead of keeping every event forever.

Inner stream-stream joins emit append-only output; results equal the
batch join on finite input (asserted in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split one event relation into the funnel's two legs. Column names
    are disambiguated here because stream-stream joins cannot rename
    through the join condition."""
    s = events.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("signup_id"), F.col("ts").alias("s_ts")
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return s, p


def funnel_join(s: DataFrame, p: DataFrame) -> DataFrame:
    """signup -> purchase by the same user within 1 hour (interval join).
    The upper bound is what makes streaming state evictable."""
    return s.join(
        p,
        (s.user_id == p.p_user)
        & (p.p_ts >= s.s_ts)
        & (p.p_ts < s.s_ts + F.expr("INTERVAL 1 HOUR")),
    ).select("signup_id", "purchase_id", "user_id")


def stream_stream_funnel(spark, sf_dir: str, name: str) -> DataFrame:
    """Run the funnel as a REAL stream-stream join: two independent
    watermarked readStream sources over the same events parquet, inner
    interval join, append-mode memory sink, availableNow trigger. Finite
    complete input makes the result deterministic and equal to the batch
    q_join_range."""
    from d_sparq_spark.streaming.windows import run_stream_to_batch, stream_events

    s, _ = funnel_sides(stream_events(spark, sf_dir, with_watermark="10 minutes"))
    _, p = funnel_sides(stream_events(spark, sf_dir, with_watermark="10 minutes"))
    # shared runner (review r4 wave 7: this block was a verbatim copy of
    # run_stream_to_batch differing only in outputMode — timeout/stop
    # fixes there must apply here too)
    return run_stream_to_batch(s, lambda _df: funnel_join(s, p), name, "append")


def stream_static_enrich(events_stream: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static dimension enrichment (r6) — THE production streaming
    join: an unbounded event stream left-joins a bounded dimension table.
    No watermark and no state store are needed (the static side is fully
    available every micro-batch; Spark re-plans the join per batch, so a
    refreshed dimension snapshot is picked up on the next trigger), and
    the stream side stays append-only. The dimension is broadcast-hinted:
    at any scale the dim is metadata-sized next to the stream, and the
    hint keeps every micro-batch a map-side join instead of re-shuffling
    the batch's events."""
    dim = F.broadcast(
        customers.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").alias("nation"),
        )
    )
    return events_stream.join(dim, "user_id", "left").select(
        "event_id", "user_id", "segment", "nation", "value"
    )
