"""Structured Streaming over the events table (SURVEY §2 H: the reference
is batch-only; this is the §7 streaming extension).

Batch/stream parity: the tumbling-window aggregation here is the streaming
twin of ``plans.analytics.q_events_tumbling`` — same window fn, same aggs —
so the batch oracle doubles as the streaming result check when the stream
is drained with ``trigger(availableNow=True)``.

Watermarking: event-time watermark of 10 minutes bounds state for late
data; at production rates the state store holds only open windows + the
lateness horizon, independent of total stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, source_dir: str, files_per_trigger: int | None = 8
) -> DataFrame:
    """File-source stream over a directory of parquet drops. Explicit
    schema (streaming requires it; also our catalog stance, SURVEY §1.5).
    ``files_per_trigger=None`` removes the per-batch file cap so an
    availableNow drain processes everything in ONE micro-batch — required
    by the value-oracled drains (dedup, interval join), where a batch
    boundary would advance the watermark mid-drain and legitimately drop
    late rows the batch-SQL oracle keeps."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", files_per_trigger)
    return reader.parquet(source_dir)


def windowed_counts(stream: DataFrame, window: str = "5 minutes",
                    watermark: str = "10 minutes") -> DataFrame:
    """Tumbling-window counts/sums with a late-data watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def hopping_counts(stream: DataFrame, window: str = "10 minutes",
                   slide: str = "5 minutes",
                   watermark: str = "10 minutes") -> DataFrame:
    """Hopping (overlapping) window counts/sums: ``F.window`` with a
    slide shorter than the size assigns each event to window÷slide
    epoch-aligned windows (2 here) — the streaming twin of the batch
    ``events_hopping`` hop-explode. State per group stays one
    (count, sum) pair; the 2× group fan-out is the price of overlap,
    NOT a per-event buffer."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def window_champions(stream: DataFrame, window: str = "1 hour",
                     watermark: str = "10 minutes") -> DataFrame:
    """Per-(tumbling window, event_type) champion: the arg-max event by
    (value, event_id) plus count/sum — the streaming top-1 that keeps
    CONSTANT state per group (one struct), unlike a collect_list top-k
    whose buffer grows with the window's row count. ``max`` over a
    struct compares lexicographically, so the event_id tiebreak makes
    the champion deterministic; drained append-mode in one batch, the
    final no-data micro-batch advances the watermark to max(ts) -
    delay and flushes exactly the windows whose end is at or below it
    — a deterministic, SQL-expressible emission rule, so this drain
    carries a full value oracle."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.max(F.struct("value", "event_id")).alias("champ"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "bucket_start"
            ),
            "event_type",
            "n_events",
            "sum_value",
            F.col("champ.event_id").alias("top_event_id"),
            F.col("champ.value").alias("top_value"),
        )
    )


def dedup_stream(stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup: first occurrence of each event_id wins;
    later copies are dropped while their key is inside the watermark
    horizon (state holds only the horizon's keys, not the full history —
    the property that makes streaming dedup feasible at all: unbounded
    exact dedup would need unbounded state). Copies arriving later than
    the watermark are dropped as late data, so the output is exactly one
    row per event_id either way."""
    return (
        stream.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
            "user_id",
            "event_type",
            "value",
        )
    )


def interval_join_streams(
    purchases: DataFrame,
    clicks: DataFrame,
    horizon: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Stream-stream interval join (attribution shape): each purchase
    matched to the same user's clicks in the preceding ``horizon``. Both
    sides carry event-time watermarks and the join condition bounds
    click_ts relative to purchase_ts, so Spark can evict click state once
    the purchase-side watermark passes the horizon — bounded state at any
    stream length. A full availableNow drain emits exactly the batch
    interval-join result, so this streaming query has a plain-SQL
    oracle."""
    p = (
        purchases.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "value",
        )
        .withWatermark("purchase_ts", watermark)
    )
    c = (
        clicks.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
    )
    return p.join(c, cond, "inner").select(
        "purchase_id",
        "click_id",
        "user_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "value",
    )


def run_to_memory_append(result: DataFrame, name: str) -> None:
    """Drain an append-mode stream (stateful operators emit incrementally)."""
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_to_memory(result: DataFrame, name: str) -> None:
    """Drain the stream with availableNow into an in-memory sink (test
    harness; a production job would writeStream to parquet/Kafka)."""
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
