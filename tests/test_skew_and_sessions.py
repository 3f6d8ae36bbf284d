"""Skew-mitigation operators and the applyInPandasWithState sessionizer."""

from pyspark.sql import functions as F

from d_sparq_spark.operators.skew import (
    salted_broadcast_left,
    salted_count_by_key,
)
from d_sparq_spark.sources.tables import load_table
from d_sparq_spark.streaming.sessions import sessionize_batch, sessionize_stream
from d_sparq_spark.streaming.windows import stream_events

SF = "/root/testdata/sf0.001"


def test_salted_count_equals_plain_count(spark):
    # heavily skewed: one key owns 90% of rows
    rows = [("hot" if i % 10 else f"k{i}", i) for i in range(2000)]
    df = spark.createDataFrame(rows, "k string, v long")
    plain = {r["k"]: r["cnt"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    salted = {r["k"]: r["cnt"] for r in salted_count_by_key(df, ["k"]).collect()}
    assert salted == plain


def test_salted_broadcast_left_preserves_multiplicity(spark):
    big = spark.createDataFrame(
        [("hot", i) if i % 5 else (f"k{i}", i) for i in range(1000)], "k string, v long"
    )
    small = spark.createDataFrame([("hot", 1), ("k5", 2), ("nope", 3)], "k string, tag long")
    plain = big.join(small, "k")
    salted = salted_broadcast_left(big, small, "k")
    assert salted.count() == plain.count()
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    # and the big side is not shuffled: no Exchange below the join input
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_aqe_skew_join_splits_hot_key(spark):
    """VERDICT r2 #7: AQE's OptimizeSkewedJoin is the runtime counterpart
    of operators/skew.py — on a shuffle join with one hot key it must
    split the oversized partition (plan shows SortMergeJoin(skew=true) +
    AQEShuffleRead skewed). Thresholds are lowered so the sf-test-sized
    data trips the same code path a 100 TB hot key would. Manual salting
    still wins where AQE can't reach: groupBy skew (salted_aggregate),
    keeping the big side unshuffled entirely (salted_broadcast_left), and
    streaming joins (no AQE) — see BASELINE.md."""
    overrides = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        big = spark.range(0, 300000).select(
            F.when(F.col("id") < 250000, F.lit(0))
            .otherwise(F.col("id") % 64)
            .alias("k"),
            # sha2 pad: incompressible, so the hot partition's SHUFFLE size
            # (what the threshold compares) stays above 256KB
            F.concat(
                F.sha2(F.col("id").cast("string"), 256),
                F.sha2((F.col("id") + 1).cast("string"), 256),
            ).alias("pad"),
        )
        small = spark.range(0, 64).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        j = big.join(small, "k").agg(F.sum(F.length("pad")).alias("n"))
        [row] = j.collect()
        assert row["n"] == 300000 * 128  # correctness unchanged by the split
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_sessionize_stream_matches_batch(spark):
    batch = sessionize_batch(load_table(spark, SF, "events"))
    stream = sessionize_stream(stream_events(spark, SF, with_watermark=None))
    q = (
        stream.writeStream.format("memory")
        .queryName("t_sessions_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("t_sessions_stream")
    # the stream run (finite, single user partition order) emits CLOSED
    # sessions; the final open session per user stays in state. So the
    # streamed output must be exactly batch minus each user's LAST session.
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("sess_start_us").desc())
    batch_closed = (
        batch.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") > 1).drop("rn")
    )
    b = sorted(
        (r["user_id"], r["sess_start_us"], r["n_events"], r["total_value"])
        for r in batch_closed.collect()
    )
    g = sorted(
        (r["user_id"], r["sess_start_us"], r["n_events"], r["total_value"])
        for r in got.collect()
    )
    assert g == b
