"""Streaming semantics: the streamed aggregation must equal its batch
form on finite input (FIXTURES.md §4), and stateful dedup must hold."""

from pyspark.sql import functions as F

from d_sparq_spark.sources.tables import load_table
from d_sparq_spark.streaming.windows import (
    dedup_within_watermark,
    run_stream_to_batch,
    stream_events,
    tumbling_hourly,
)

SF = "/root/testdata/sf0.001"


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_equals_batch_tumbling(spark):
    batch = tumbling_hourly(load_table(spark, SF, "events"))
    streamed = run_stream_to_batch(
        stream_events(spark, SF), tumbling_hourly, "t_stream_eq_batch"
    )
    assert _sorted_rows(streamed) == _sorted_rows(batch)


def test_stream_dedup_within_watermark(spark):
    stream = stream_events(spark, SF)
    deduped = dedup_within_watermark(stream)
    q = (
        deduped.groupBy("event_type")
        .count()
        .writeStream.format("memory")
        .queryName("t_stream_dedup")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["event_type"]: r["count"] for r in spark.table("t_stream_dedup").collect()}
    batch = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # event_ids are unique in the fixture, so dedup must be a no-op
    assert got == batch


def test_stream_foreachbatch_sink(spark, tmp_path):
    """foreachBatch — the escape hatch for sinks Structured Streaming has
    no native writer for: every micro-batch arrives as a plain DataFrame
    with a monotonic batch_id (the idempotence key a real sink would
    dedupe re-deliveries on). Totals across batches must equal batch."""
    out = str(tmp_path / "fb_out")
    stream = stream_events(spark, SF, with_watermark=None)

    def write_batch(df, batch_id):
        (
            df.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out)
        )

    q = stream.writeStream.foreachBatch(write_batch).trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = {
        r["event_type"]: r["total"]
        for r in spark.read.parquet(out)
        .groupBy("event_type")
        .agg(F.sum("n").alias("total"))
        .collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_stream_stream_join_equals_batch(spark):
    """Stream-stream interval join (two watermarked sources, append mode)
    must emit exactly the batch join's rows on finite input."""
    from d_sparq_spark.streaming.joins import (
        funnel_join,
        funnel_sides,
        stream_stream_funnel,
    )

    s, p = funnel_sides(load_table(spark, SF, "events"))
    batch = funnel_join(s, p)
    streamed = stream_stream_funnel(spark, SF, "t_stream_stream_funnel")
    assert _sorted_rows(streamed) == _sorted_rows(batch)
    assert len(_sorted_rows(streamed)) > 0


def test_stream_static_join_equals_batch(spark):
    """Stream-static join (enrichment): the streamed events join a static
    dim (user_id % 25 -> nation) and aggregate; must equal the batch form.
    The static side broadcasts — the standard streaming-enrichment shape."""
    nation = load_table(spark, SF, "nation").select(
        F.col("n_nationkey").alias("nk"), "n_name"
    )

    def enrich_and_count(events):
        return (
            events.withColumn("nk", F.col("user_id") % 25)
            .join(F.broadcast(nation), "nk")
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    batch = enrich_and_count(load_table(spark, SF, "events"))
    streamed = run_stream_to_batch(
        stream_events(spark, SF, with_watermark=None), enrich_and_count,
        "t_stream_static_join",
    )
    assert _sorted_rows(streamed) == _sorted_rows(batch)


def test_replay_dedup_then_sessionize_sf01(spark):
    """VERDICT r2 #8: availableNow replay of the dedup-within-watermark →
    stateful-sessionize pipeline at sf0.1 (150k events), row-exact vs the
    batch twin — the unit-fixture equivalence, rerun at data scale."""
    from d_sparq_spark.streaming.sessions import sessionize_batch, sessionize_stream

    SF01 = "/root/testdata/sf0.1"
    stream = dedup_within_watermark(stream_events(spark, SF01))
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("t_replay_sessions_sf01")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    got = spark.table("t_replay_sessions_sf01")

    batch = sessionize_batch(
        load_table(spark, SF01, "events").dropDuplicates(["event_id"])
    )
    # finite replay: each user's final session never closes — the batch
    # twin minus the last session per user is the exact expected output
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("sess_start_us").desc())
    batch_closed = (
        batch.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .drop("rn")
    )
    b = sorted(
        (r["user_id"], r["sess_start_us"], r["n_events"], r["total_value"])
        for r in batch_closed.collect()
    )
    g = sorted(
        (r["user_id"], r["sess_start_us"], r["n_events"], r["total_value"])
        for r in got.collect()
    )
    assert len(g) > 0
    assert g == b

def test_stream_incremental_dedup_equals_batch_sf01(spark, tmp_path):
    """VERDICT r3 #7: the incremental-dedup shape driven as a STREAM of
    microbatches (foreachBatch + persisted corpus-digest table) must be
    verdict-exact vs the one-shot batch twin (q_dedup_incremental) at
    sf0.1. The new set arrives as 4 doc_id-ascending files with
    maxFilesPerTrigger=1, so first-seen == global-min representative and
    every label (dup_of_corpus / dup_in_batch / keep) must coincide."""
    from d_sparq_spark.queries.llm_ops import q_dedup_incremental
    from d_sparq_spark.streaming import dedup as SD

    SF01 = "/root/testdata/sf0.1"
    docs = load_table(spark, SF01, "documents")
    corpus_dir = str(tmp_path / "corpus")
    verdict_dir = str(tmp_path / "verdicts")
    src = str(tmp_path / "incoming")

    SD.seed_corpus(docs.filter(F.col("doc_id") % 2 == 0), corpus_dir)

    new = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    lo, hi = new.agg(F.min("doc_id"), F.max("doc_id")).first()
    step = (hi - lo) // 4 + 1
    import glob as _glob
    import os as _os
    import time as _time

    # FileStreamSource orders by modification time (ms granularity); pin
    # strictly ascending mtimes per doc_id range so an mtime tie between
    # two fast writes can't reorder batches and flip keep/dup_in_batch
    # (part-file names carry random UUIDs, so track files per write)
    base_ts, seen = _time.time() - 3600, set()
    for k in range(4):
        new.filter(
            (F.col("doc_id") >= lo + k * step) & (F.col("doc_id") < lo + (k + 1) * step)
        ).coalesce(1).write.mode("append").parquet(src)
        for part in set(_glob.glob(src + "/part-*.parquet")) - seen:
            _os.utime(part, (base_ts + 10 * k, base_ts + 10 * k))
            seen.add(part)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # compact_every=2: the parity gate runs WITH corpus-layer compaction on
    # (r9, VERDICT r8 #3) — batch 2 folds layers 0..1 into base-1
    q = SD.dedup_stream(
        stream, corpus_dir, verdict_dir, str(tmp_path / "ckpt"), compact_every=2
    )
    q.awaitTermination(600)

    got_df = spark.read.parquet(verdict_dir)
    assert got_df.select("batch_id").distinct().count() == 4  # really incremental
    got = sorted((r["doc_id"], r["verdict"]) for r in got_df.collect())
    want = sorted(tuple(r) for r in q_dedup_incremental(spark, SF01).collect())
    assert len(got) > 0
    assert got == want
    # the live layer count is O(compact_every), not O(batches): batch 2
    # folded 0..1; seed/ stays its own (batch_id=-1) directory
    import os as _os

    assert sorted(_os.listdir(corpus_dir)) == [
        "base-1", "batch-2", "batch-3", "seed",
    ]


def test_stream_near_dedup_equals_batch(spark, tmp_path):
    """r7 (VERDICT r6 #5): the incremental MinHash near-dup pipeline
    (persisted band-signature store + candidate-selective exact verify,
    streaming/near_dedup.py) replayed over the corpus in doc_id-ascending
    microbatches must emit EXACTLY the batch twin's verified pair set —
    same signatures, same buckets, same Jaccard doubles."""
    from d_sparq_spark.operators import dedup as D
    from d_sparq_spark.streaming import near_dedup as ND

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    src = str(tmp_path / "incoming")
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    step = (hi - lo) // 3 + 1
    import glob as _glob
    import os as _os
    import time as _time

    base_ts, seen = _time.time() - 3600, set()
    for k in range(3):
        docs.filter(
            (F.col("doc_id") >= lo + k * step) & (F.col("doc_id") < lo + (k + 1) * step)
        ).coalesce(1).write.mode("append").parquet(src)
        for part in set(_glob.glob(src + "/part-*.parquet")) - seen:
            _os.utime(part, (base_ts + 10 * k, base_ts + 10 * k))
            seen.add(part)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = ND.near_dedup_stream(
        stream,
        str(tmp_path / "store"),
        str(tmp_path / "pairs"),
        str(tmp_path / "ckpt"),
        threshold=0.5,
    )
    q.awaitTermination(600)

    got_df = spark.read.parquet(str(tmp_path / "pairs"))
    assert got_df.select("batch_id").distinct().count() == 3  # really incremental
    got = _sorted_rows(got_df.select("a", "b", "jaccard"))
    want = _sorted_rows(D.minhash_near_dups(docs, threshold=0.5))
    assert len(want) > 0  # vacuity guard (28 pairs at sf0.001)
    assert got == want
    # the band store grows O(corpus x num_bands) rows — the documented
    # state bound: exactly 8 band rows per document, nothing else
    bands = spark.read.parquet(str(tmp_path / "store") + "/bands/batch-*")
    assert bands.count() == docs.count() * 8


def test_stream_near_dedup_compaction_parity_and_bound(spark, tmp_path):
    """r8 (VERDICT r7 #4): with compact_every=2 the per-batch band/text
    layers fold into a single base layer every two batches. The emitted
    pair union must be UNCHANGED across the compaction boundary (stream ==
    batch parity), and the live layer count must stay O(compact_every) —
    the listing bound that motivates compaction — not O(batches)."""
    import os as _os

    from d_sparq_spark.operators import dedup as D
    from d_sparq_spark.streaming import near_dedup as ND

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    store, pairs = str(tmp_path / "store"), str(tmp_path / "pairs")
    fn = ND.near_dedup_foreach_batch(store, pairs, threshold=0.5, compact_every=2)
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    step = (hi - lo) // 5 + 1
    for k in range(5):
        fn(
            docs.filter(
                (F.col("doc_id") >= lo + k * step)
                & (F.col("doc_id") < lo + (k + 1) * step)
            ),
            k,
        )
    got = _sorted_rows(spark.read.parquet(pairs).select("a", "b", "jaccard"))
    want = _sorted_rows(D.minhash_near_dups(docs, threshold=0.5))
    assert len(want) > 0
    assert got == want
    # batch 4 folded layers 0..3 into base-3; only its own delta remains
    assert sorted(_os.listdir(store + "/bands")) == ["base-3", "batch-4"]
    assert sorted(_os.listdir(store + "/texts")) == ["base-3", "batch-4"]
    # the fold preserves rows exactly: 8 band rows per document, once each
    live = ND._read_layer(spark, store + "/bands", ND.BANDS_SCHEMA, 5)
    assert live.count() == docs.count() * 8
    # original batch_id values survive the fold (retry-exclusion filter
    # keeps working on folded data)
    assert live.select("batch_id").distinct().count() == 5

    # crash window: a folded batch dir the cleanup never deleted (crash
    # between base commit and rmtree) must be IGNORED by readers — its id
    # is <= the committed base id, so no row is double-counted
    stale = live.filter(F.col("batch_id") == 2)
    stale.write.parquet(store + "/bands/batch-2")
    assert store + "/bands/batch-2" not in ND._live_layer_dirs(store + "/bands")
    relive = ND._read_layer(spark, store + "/bands", ND.BANDS_SCHEMA, 5)
    assert relive.count() == docs.count() * 8
    # ...and the next compaction pass deletes the leftover
    ND.compact_layers(spark, store + "/bands", ND.BANDS_SCHEMA, 4)
    assert sorted(_os.listdir(store + "/bands")) == ["base-4"]
    assert (
        ND._read_layer(spark, store + "/bands", ND.BANDS_SCHEMA, 5).count()
        == docs.count() * 8
    )

    # review r8: a PARTIAL base (part- files present, _SUCCESS missing —
    # a crash mid job-commit) must NOT count as committed: adopting it
    # would supersede the intact layers it was folded from. Simulate by
    # stripping the marker from a fresh higher base.
    import shutil as _sh

    live_before = ND._read_layer(spark, store + "/bands", ND.BANDS_SCHEMA, 9)
    n_before = live_before.count()
    live_before.write.parquet(store + "/bands/base-7")
    _os.remove(store + "/bands/base-7/_SUCCESS")
    assert store + "/bands/base-7" not in ND._live_layer_dirs(store + "/bands")
    assert (
        ND._read_layer(spark, store + "/bands", ND.BANDS_SCHEMA, 9).count()
        == n_before
    )
    # the next compaction pass (a fresh batch layer makes it fold) treats
    # the partial base as an uncommitted leftover: rebuilt from the
    # intact inputs and swept, never adopted partially
    spark.createDataFrame(
        [(900 + i, 0, 12345 + i, 8) for i in range(5)], ND.BANDS_SCHEMA
    ).write.parquet(store + "/bands/batch-8")
    ND.compact_layers(spark, store + "/bands", ND.BANDS_SCHEMA, 8)
    assert sorted(_os.listdir(store + "/bands")) == ["base-8"]
    assert _os.path.exists(store + "/bands/base-8/_SUCCESS")
    assert (
        ND._read_layer(spark, store + "/bands", ND.BANDS_SCHEMA, 9).count()
        == n_before + 5
    )
    _sh.rmtree(store, ignore_errors=True)


def test_stream_near_dedup_retry_across_compaction(spark, tmp_path):
    """A foreachBatch retry of the batch that PERFORMED the compaction must
    emit the same pairs and leave the same live store: the committed base
    is detected and not rebuilt, the rewritten batch-<id> delta is never
    folded (so its rows exist exactly once), and reads exclude the current
    batch id exactly as before compaction existed."""
    import os as _os

    from d_sparq_spark.streaming import near_dedup as ND

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    store, pairs = str(tmp_path / "store"), str(tmp_path / "pairs")
    fn = ND.near_dedup_foreach_batch(store, pairs, threshold=0.5, compact_every=2)
    parts = [docs.filter(F.col("doc_id") % 3 == k) for k in range(3)]
    for k, part in enumerate(parts):
        fn(part, k)  # batch 2 folds layers 0..1 into base-1
    assert sorted(_os.listdir(store + "/bands")) == ["base-1", "batch-2"]
    first_pairs = _sorted_rows(spark.read.parquet(pairs))
    first_bands = _sorted_rows(
        ND._read_layer(spark, store + "/bands", ND.BANDS_SCHEMA, 3)
    )
    fn(parts[2], 2)  # retry of the compacting batch
    assert _sorted_rows(spark.read.parquet(pairs)) == first_pairs
    assert (
        _sorted_rows(ND._read_layer(spark, store + "/bands", ND.BANDS_SCHEMA, 3))
        == first_bands
    )
    assert sorted(_os.listdir(store + "/bands")) == ["base-1", "batch-2"]


def test_stream_near_dedup_batch_retry_is_idempotent(spark, tmp_path):
    """A foreachBatch retry of the SAME near-dup microbatch must emit the
    same pairs and leave the same store state: reads exclude the current
    batch id, writes overwrite batch-<id>."""
    from d_sparq_spark.streaming import near_dedup as ND

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    store, pairs = str(tmp_path / "store"), str(tmp_path / "pairs")
    fn = ND.near_dedup_foreach_batch(store, pairs, threshold=0.5)
    fn(b0, 0)
    fn(b1, 1)
    first_pairs = _sorted_rows(spark.read.parquet(pairs))
    first_bands = spark.read.parquet(store + "/bands/batch-*").count()
    fn(b1, 1)  # retry of batch 1
    assert _sorted_rows(spark.read.parquet(pairs)) == first_pairs
    assert spark.read.parquet(store + "/bands/batch-*").count() == first_bands


def test_stream_dedup_batch_retry_is_idempotent(spark, tmp_path):
    """Review r4: a foreachBatch retry must re-read exactly the corpus
    state the FIRST attempt saw — batch N's own corpus output is excluded
    via the batch_id column — so the retried verdicts and corpus
    contribution are identical (first attempt's keepers must not come back
    as 'stream' dups, and the corpus dir must not be overwritten empty)."""
    from d_sparq_spark.streaming import dedup as SD

    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a"), (4, "c")], "doc_id long, text string"
    )
    corpus_dir, verdict_dir = str(tmp_path / "corpus"), str(tmp_path / "v")
    SD.seed_corpus(
        spark.createDataFrame([(0, "c")], "doc_id long, text string"), corpus_dir
    )
    proc = SD.dedup_foreach_batch(corpus_dir, verdict_dir)

    def verdicts():
        return sorted(
            tuple(r)
            for r in spark.read.schema(SD.VERDICT_SCHEMA)
            .parquet(verdict_dir + "/batch_id=0")
            .collect()
        )

    def corpus0():
        return sorted(
            tuple(r)
            for r in spark.read.schema(SD.CORPUS_SCHEMA)
            .parquet(corpus_dir + "/batch-0")
            .collect()
        )

    proc(docs, 0)
    first_v, first_c = verdicts(), corpus0()
    by_id = {d: v for d, _dg, v in first_v}
    assert by_id == {1: "keep", 2: "keep", 3: "dup_in_batch", 4: "dup_of_corpus"}
    assert len(first_c) == 2  # digests of "a" and "b"

    proc(docs, 0)  # simulated retry AFTER the first attempt's writes landed
    assert verdicts() == first_v
    assert corpus0() == first_c

    # the next batch DOES see batch-0's keepers — as in-batch dups
    proc(spark.createDataFrame([(9, "a")], "doc_id long, text string"), 1)
    nxt = spark.read.schema(SD.VERDICT_SCHEMA).parquet(verdict_dir + "/batch_id=1")
    assert [r["verdict"] for r in nxt.collect()] == ["dup_in_batch"]


def test_stream_dedup_retry_across_compaction(spark, tmp_path):
    """r9 (VERDICT r8 #3): a foreachBatch retry of the exact-dedup batch
    that PERFORMED the corpus compaction must emit the same verdicts and
    leave the same live corpus: the committed base is detected and not
    rebuilt, the rewritten batch-<id> delta is never folded, and reads
    exclude the current batch id exactly as before compaction existed."""
    import os as _os

    from d_sparq_spark.streaming import dedup as SD

    corpus_dir, verdict_dir = str(tmp_path / "corpus"), str(tmp_path / "v")
    SD.seed_corpus(
        spark.createDataFrame([(0, "s")], "doc_id long, text string"), corpus_dir
    )
    proc = SD.dedup_foreach_batch(corpus_dir, verdict_dir, compact_every=2)
    batches = [
        spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string"),
        spark.createDataFrame([(3, "a"), (4, "c")], "doc_id long, text string"),
        spark.createDataFrame([(5, "c"), (6, "s"), (7, "d")],
                              "doc_id long, text string"),
    ]
    for k, b in enumerate(batches):
        proc(b, k)  # batch 2 folds layers 0..1 into base-1
    assert sorted(_os.listdir(corpus_dir)) == ["base-1", "batch-2", "seed"]

    def state():
        verdicts = sorted(
            tuple(r)
            for r in spark.read.parquet(verdict_dir)
            .select("doc_id", "dg", "verdict")  # drop the batch_id= dir col
            .collect()
        )
        corpus = sorted(
            tuple(r) for r in SD.read_corpus(spark, corpus_dir).collect()
        )
        return verdicts, corpus

    first = state()
    by_id = {d: v for d, _dg, v in first[0]}
    # cross-batch keepers are dup_in_batch, the seed digest dup_of_corpus
    assert by_id == {1: "keep", 2: "keep", 3: "dup_in_batch", 4: "keep",
                     5: "dup_in_batch", 6: "dup_of_corpus", 7: "keep"}
    proc(batches[2], 2)  # retry of the compacting batch
    assert state() == first
    assert sorted(_os.listdir(corpus_dir)) == ["base-1", "batch-2", "seed"]
    # folded rows keep their original batch_id (retry-exclusion survives)
    assert sorted(
        r["batch_id"]
        for r in SD.read_corpus(spark, corpus_dir).select("batch_id").distinct().collect()
    ) == [-1, 0, 1, 2]


def test_watermark_drops_late_rows_exact_split(spark, tmp_path):
    """r5 (VERDICT r4 #8): the suite proved stream==batch on replay but
    never asserted DROPPED late data. Four micro-batches (file source,
    maxFilesPerTrigger=1, mtime-ordered) drive the documented watermark
    life cycle with a 30-min delay on 1-hour tumbling windows. A late row
    is dropped only once its window's state was EVICTED (eviction uses
    the during-batch watermark; a late row landing in the same batch its
    window finalizes still counts — measured, not assumed):

      b0: 10:00, 10:10, 12:00      -> wm after b0 = 11:30
      b1: 11:45 (end 12:00 > 11:30 KEPT), 12:30
          window [10:00,11:00) evicted at end of b1 -> emits count 2
      b2 (wm 12:00): 10:20 -> window end 11:00 <= 12:00, state gone:
          DROPPED (numRowsDroppedByWatermark). 12:15 -> end 13:00 >
          12:00: late but KEPT. 13:30 advances wm.
      b3 (wm 13:00): dummy 14:30 -> evicts [12:00,13:00) = 3 rows
          (12:00 + 12:30 + the late-kept 12:15). availableNow then runs
          one final EMPTY batch with wm 14:00, flushing [13:00,14:00)=1
          (measured: the final commit batch is part of the contract).
    """
    import os
    import time

    src = str(tmp_path / "wm_src")
    os.makedirs(src)

    def write_file(name, ts_list, mtime):
        df = spark.createDataFrame(
            [(f"2024-01-01 {t}:00",) for t in ts_list], "raw string"
        ).select(F.col("raw").cast("timestamp").alias("ts"))
        part = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(part)
        pf = next(f for f in os.listdir(part) if f.endswith(".parquet"))
        dst = os.path.join(src, name + ".parquet")
        os.rename(os.path.join(part, pf), dst)
        os.utime(dst, (mtime, mtime))

    t0 = time.time() - 1000
    write_file("b0", ["10:00", "10:10", "12:00"], t0)
    write_file("b1", ["11:45", "12:30"], t0 + 100)
    write_file("b2", ["10:20", "12:15", "13:30"], t0 + 200)
    write_file("b3", ["14:30"], t0 + 300)

    stream = (
        spark.readStream.schema("ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "30 minutes")
    )
    agg = stream.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.count(F.lit(1)).alias("n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_wm_late_drop")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {
        r["w"].start.strftime("%H:%M"): r["n"]
        for r in spark.table("t_wm_late_drop").collect()
    }
    assert got == {"10:00": 2, "11:00": 1, "12:00": 3, "13:00": 1}, got
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p.get("stateOperators", [])
    )
    assert dropped == 1, q.recentProgress  # exactly the 10:20 row


def test_stream_static_enrich_equals_batch_and_broadcasts(spark):
    """r6: the stream-static dimension join is stateless, so the streamed
    result must equal the batch join EXACTLY; the dimension side must
    broadcast (no per-batch shuffle of the events)."""
    from pyspark.sql import functions as F

    from d_sparq_spark.sources.tables import load_table
    from d_sparq_spark.streaming.joins import stream_static_enrich
    from d_sparq_spark.streaming.windows import run_stream_to_batch, stream_events

    sf = "/root/testdata/sf0.001"
    customers = load_table(spark, sf, "customer")
    streamed = run_stream_to_batch(
        stream_events(spark, sf, with_watermark=None),
        lambda s: stream_static_enrich(s, customers),
        "t_enrich_eq",
        output_mode="append",
    )
    batch = stream_static_enrich(
        load_table(spark, sf, "events"), customers
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
