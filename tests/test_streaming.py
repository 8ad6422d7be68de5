"""Structured Streaming twin of the batch tumbling-window query: draining
the stream with availableNow must reproduce the batch aggregation."""

import shutil

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.analytics import q_events_tumbling
from migrate_blob_data_from_rdbms_to_amazon_s3_spark.sources.tables import load_events
from migrate_blob_data_from_rdbms_to_amazon_s3_spark.streaming import events as SE


def test_stream_matches_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "stream_src")
    # re-materialize events as micro-batch-sized parquet drops with
    # microsecond timestamps (the streaming reader needs a readable schema)
    load_events(spark, sf_dir).repartition(4).write.parquet(src)

    stream = SE.read_event_stream(spark, src)
    assert stream.isStreaming
    result = SE.windowed_counts(stream)
    SE.run_to_memory(result, "win_counts")
    got = {
        (r.bucket_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }

    want = {
        (r.bucket_start, r.event_type): (r.n_events, r.sum_value)
        for r in q_events_tumbling(spark, sf_dir).collect()
    }
    assert got == want
    shutil.rmtree(src, ignore_errors=True)


def test_hopping_stream_matches_batch(spark, sf_dir, tmp_path):
    """Hopping drain == the batch hop-explode arithmetic: every event in
    exactly window/slide = 2 epoch-aligned windows."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "hop_src")
    load_events(spark, sf_dir).repartition(4).write.parquet(src)

    result = SE.hopping_counts(
        SE.read_event_stream(spark, src, files_per_trigger=None)
    )
    SE.run_to_memory(result, "hop_counts")
    got = {
        (r.bucket_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM hop_counts").collect()
    }

    ev = load_events(spark, sf_dir)
    batch = (
        ev.select(
            "event_type",
            "value",
            F.explode(F.array(F.lit(0), F.lit(1))).alias("k"),
            F.floor(F.col("ts").cast("double") / 300).alias("bucket"),
        )
        .select(
            "event_type",
            "value",
            F.date_format(
                ((F.col("bucket") - F.col("k")) * 300).cast("timestamp"),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("bucket_start"),
        )
        .groupBy("bucket_start", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    want = {
        (r.bucket_start, r.event_type): (r.n_events, r.sum_value)
        for r in batch.collect()
    }
    assert got == want
    shutil.rmtree(src, ignore_errors=True)


def test_stateful_sessionize_matches_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState sessionization == batch sessions minus each
    user's final (still-open) session, which stays in state when the
    stream drains."""
    import pyspark.sql.functions as F

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.streaming.stateful import (
        sessionize_stream,
    )

    src = str(tmp_path / "stateful_src")
    load_events(spark, sf_dir).repartition(4).write.parquet(src)

    result = sessionize_stream(SE.read_event_stream(spark, src))
    SE.run_to_memory_append(result, "sessions_stateful")
    got = {
        (r.user_id, r.session_seq): (r.n_events, r.session_value)
        for r in spark.sql("SELECT * FROM sessions_stateful").collect()
    }

    # expected: every batch session except those still open when the
    # stream drains — i.e. each user's final session UNLESS its gap had
    # already elapsed at the final watermark (max ts - 2h delay).
    ev = load_events(spark, sf_dir)
    from pyspark.sql.window import Window

    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag(F.col("ts").cast("double")).over(by_user)
    is_new = F.when(
        prev_ts.isNull() | ((F.col("ts").cast("double") - prev_ts) > 1800), 1
    ).otherwise(0)
    sess = (
        ev.withColumn("session_seq", F.sum(is_new).over(by_user))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
            F.max(F.col("ts").cast("double")).alias("end_ts"),
        )
    )
    wm_final = (
        ev.agg(F.max(F.col("ts").cast("double"))).collect()[0][0] - 7200.0
    )
    last_seq = F.max("session_seq").over(Window.partitionBy("user_id"))
    expected = (
        sess.withColumn("last_seq", last_seq)
        .filter(
            (F.col("session_seq") < F.col("last_seq"))
            | (F.col("end_ts") + 1800.0 < F.lit(wm_final))
        )
        .collect()
    )
    want = {
        (r.user_id, r.session_seq): (r.n_events, r.session_value) for r in expected
    }
    assert got == want
    assert len(got) > 0
    shutil.rmtree(src, ignore_errors=True)


def test_stream_static_join(spark, sf_dir, tmp_path):
    """Stream-static join: streaming events enriched against a static dim
    (per-user tier), drained == the batch join."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "ss_src")
    ev = load_events(spark, sf_dir)
    ev.repartition(2).write.parquet(src)
    dim = ev.select("user_id").distinct().select(
        "user_id", (F.col("user_id") % 3).alias("tier")
    )

    stream = SE.read_event_stream(spark, src)
    enriched = (
        stream.join(dim, "user_id")
        .groupBy("tier")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))
    )
    SE.run_to_memory(enriched, "tiered")
    got = {r.tier: (r.n, r.sv) for r in spark.sql("SELECT * FROM tiered").collect()}

    want = {
        r.tier: (r.n, r.sv)
        for r in ev.join(dim, "user_id")
        .groupBy("tier")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sv"))
        .collect()
    }
    assert got == want
    shutil.rmtree(src, ignore_errors=True)


def test_stream_dedup_with_watermark(spark, sf_dir, tmp_path):
    """Streaming exact dedup: dropDuplicates on the event key with a
    watermark bounding the dedup state. A source with every event written
    twice drains to exactly the distinct set."""
    import pyspark.sql.functions as F

    src = str(tmp_path / "dup_src")
    ev = load_events(spark, sf_dir)
    ev.union(ev).repartition(4).write.parquet(src)

    stream = SE.read_event_stream(spark, src)
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .groupBy()
        .agg(F.count("*").alias("n"), F.sum("value").alias("sv"))
    )
    SE.run_to_memory(deduped, "dedup_counts")
    got = spark.sql("SELECT * FROM dedup_counts").collect()[0]

    want = ev.agg(F.count("*").alias("n"), F.sum("value").alias("sv")).collect()[0]
    assert got.n == want.n
    assert abs(got.sv - want.sv) < 1e-6
    shutil.rmtree(src, ignore_errors=True)


def test_foreachbatch_merge_sink(spark, sf_dir, tmp_path):
    """foreachBatch merge sink: each micro-batch merges into a keyed
    parquet table keeping the max-(ts,event_id) row per user. After the
    drain, the table equals the batch 'latest event per user' query,
    regardless of batch/file order."""
    import pyspark.sql.functions as F

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.mutation import (
        rewrite,
    )

    src = str(tmp_path / "fb_src")
    tgt = f"file:{tmp_path}/latest_per_user"
    ev = load_events(spark, sf_dir)
    ev.repartition(4).write.parquet(src)

    def latest(df):
        w = F.struct("ts", "event_id")
        return (
            df.groupBy("user_id")
            .agg(F.max(w).alias("m"))
            .select("user_id", F.col("m.ts").alias("ts"), F.col("m.event_id").alias("event_id"))
        )

    def merge_batch(batch_df, batch_id):
        incoming = latest(batch_df)
        try:
            existing = batch_df.sparkSession.read.parquet(tgt)
            merged = latest(existing.unionByName(incoming))
        except Exception:
            merged = incoming
        rewrite(merged, tgt)

    stream = spark.readStream.schema(SE.EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = stream.writeStream.foreachBatch(merge_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    got = {(r.user_id, r.ts, r.event_id) for r in spark.read.parquet(tgt).collect()}
    want = {(r.user_id, r.ts, r.event_id) for r in latest(ev).collect()}
    assert got == want
    shutil.rmtree(src, ignore_errors=True)


def test_stream_dedup_doubled_source(spark, sf_dir, tmp_path):
    """Streaming exact dedup over a source staged twice (at-least-once
    upstream) must drain to exactly the distinct event set."""
    src = str(tmp_path / "dedup_src")
    ev = load_events(spark, sf_dir)
    ev.repartition(4).write.parquet(src)
    ev.repartition(4).write.mode("append").parquet(src)

    result = SE.dedup_stream(SE.read_event_stream(spark, src))
    SE.run_to_memory_append(result, "dedup_drain")
    got = spark.sql("SELECT * FROM dedup_drain")
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()
    shutil.rmtree(src, ignore_errors=True)


def test_registry_streaming_entries_drain_by_name(spark, sf_dir):
    """The two rows-only registry entries — stream_tumbling_windows and
    stream_sessionize_stateful — drain end-to-end through the same
    callables the driver invokes. The driver only row-checks these (no
    value oracle: emission timing isn't SQL-expressible), so this named
    drain is their correctness gate alongside the stream==batch parity
    tests above."""
    import __spark_entry__ as E

    qs = E.queries()
    tw = qs["stream_tumbling_windows"](spark, sf_dir)
    tw_rows = tw.collect()
    assert len(tw_rows) > 0
    assert {"event_type", "n_events"} <= set(tw.columns)

    ss = qs["stream_sessionize_stateful"](spark, sf_dir)
    ss_rows = ss.collect()
    assert len(ss_rows) > 0
    assert {"user_id", "session_seq", "n_events"} <= set(ss.columns)


def test_window_champions_watermark_boundary_inclusive(spark, tmp_path):
    """Pins the emission rule stream_window_champions' oracle depends on:
    a window whose end is EXACTLY equal to the final watermark
    (max(ts) - delay) IS flushed by the availableNow no-data batch —
    Spark's eviction predicate is window.end <= watermark, so the oracle
    cutoff must be `<=`, not `<`."""
    import pyspark.sql.functions as F

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.streaming import (
        events as SE,
    )

    rows = [
        (1, "2024-01-01 00:30:00", 10, "click", 1.0, "{}"),
        # max ts 01:10:00 -> watermark 01:00:00 == end of [00:00, 01:00)
        (2, "2024-01-01 01:10:00", 10, "click", 2.0, "{}"),
    ]
    df = (
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.to_timestamp("ts"))
    )
    src = str(tmp_path / "wm_boundary_src")
    df.write.mode("overwrite").parquet(src)
    res = SE.window_champions(SE.read_event_stream(spark, src, files_per_trigger=None))
    SE.run_to_memory_append(res, "wm_boundary_t")
    out = spark.table("wm_boundary_t").collect()
    assert [(r.bucket_start, r.n_events, r.top_event_id) for r in out] == [
        ("2024-01-01 00:00:00", 1, 1)
    ]
