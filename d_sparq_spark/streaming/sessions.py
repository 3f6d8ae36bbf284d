"""Custom stateful streaming operator: sessionization via
applyInPandasWithState (SURVEY §2.C streaming rows — the 'custom stateful
operator' slot the built-in session_window can't cover when you need
per-session derived features).

State per user: (open session start, last event ts, event count, value
sum). A batch arrives -> extend or close sessions; closed sessions emit
(user_id, sess_start_us, n_events, total_value). Timeout closes idle
sessions after the gap. The batch-mode twin (sessionize_batch) computes
identical output with window functions — that's what the equivalence test
checks, and the oracle-checked q_window_session covers the same semantics
for counts.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_US = 1_800_000_000  # 30 min

OUT_SCHEMA = "user_id long, sess_start_us long, n_events long, total_value double"
# total accumulates in integer MICRO-UNITS (value quantized to 6dp, half
# away from zero — the same rounding Spark's cast(double as decimal(25,6))
# applies), so stream and batch sums are BIT-identical regardless of
# accumulation order; the emitted double is micros / 1e6.
STATE_SCHEMA = "start long, last long, n long, total long"


def _make_sessionizer(use_timeout: bool):
    def _sessionize_group(key, pdfs, state):
        return _sessionize_group_impl(key, pdfs, state, use_timeout)

    return _sessionize_group


def _sessionize_group_impl(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    use_timeout: bool,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start, last, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            {"user_id": [user_id], "sess_start_us": [start], "n_events": [n],
             "total_value": [total / 1e6]}
        )
        return

    rows = pd.concat(list(pdfs)).sort_values("ts_us")
    out = []
    if state.exists:
        start, last, n, total = state.get
    else:
        start = last = None
        n, total = 0, 0

    def micros(v) -> int:
        # quantize like Spark's cast(double AS decimal(25,6)): 6dp, half
        # away from zero on the double's exact binary value
        return int(
            (Decimal(float(v)) * 1_000_000).quantize(Decimal(1), rounding=ROUND_HALF_UP)
        )

    for ts, val in zip(rows["ts_us"], rows["value"]):
        ts = int(ts)
        if start is None:
            start, last, n, total = ts, ts, 1, micros(val)
        elif ts - last >= GAP_US:
            out.append((user_id, start, n, total / 1e6))
            start, last, n, total = ts, ts, 1, micros(val)
        else:
            # max/min: rows sort only WITHIN a microbatch; a within-
            # watermark late event from a later batch must neither move
            # `last` backward nor lose the true session head
            start, last, n, total = min(start, ts), max(last, ts), n + 1, total + micros(val)
    state.update((start, last, n, total))
    if use_timeout:
        state.setTimeoutDuration(60_000)
    if out:
        yield pd.DataFrame(out, columns=["user_id", "sess_start_us", "n_events", "total_value"])


def sessionize_stream(events_stream: DataFrame, idle_timeout: bool = False) -> DataFrame:
    """events stream (with ts) -> closed sessions. Arrow-batched state per
    user; state size is O(active users), not O(events) — bounded at any
    scale, which is the whole point over a naive groupBy.

    idle_timeout=True additionally closes sessions for users who go quiet
    (ProcessingTimeTimeout, 60 s) — wanted in production, but on a finite
    replay it spawns one near-empty timeout microbatch per interval, so it
    is opt-in."""
    with_us = events_stream.select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    return with_us.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(idle_timeout),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )


def sessionize_batch(events: DataFrame) -> DataFrame:
    """Batch twin: gaps-and-islands with window functions. Emits ALL
    sessions (a finite batch closes every session)."""
    from pyspark.sql import Window

    e = events.select("user_id", F.unix_micros("ts").alias("ts_us"), "value")
    w = Window.partitionBy("user_id").orderBy("ts_us")
    flagged = e.withColumn(
        "new_sess",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w) >= GAP_US)
            | F.lag("ts_us").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = flagged.withColumn("sess_id", F.sum("new_sess").over(w_run))
    from d_sparq_spark.functions.numeric import dsum

    return sessions.groupBy("user_id", "sess_id").agg(
        F.min("ts_us").alias("sess_start_us"),
        F.count(F.lit(1)).alias("n_events"),
        # exact decimal sum: bit-identical to the stream twin's integer
        # micro-unit accumulation whatever the partition/merge order
        dsum(F.col("value")).alias("total_value"),
    ).drop("sess_id")
