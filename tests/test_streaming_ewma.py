"""Stateful streaming EWMA == recursive definition == batch closed form.

The stream carries finalized daily aggregates, one parquet file per day
(written oldest-first, maxFilesPerTrigger=1), so the kernel sees periods
in event-time order across micro-batches and must carry its one-double
state correctly between them — the property that distinguishes a real
stateful fold from a per-batch recompute.
"""

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.profiling import q_events_ewma
from migrate_blob_data_from_rdbms_to_amazon_s3_spark.sources.tables import load_events
from migrate_blob_data_from_rdbms_to_amazon_s3_spark.streaming.ewma import (
    EWMA_SCHEMA,
    EWMA_STREAM_ALPHA,
    ewma_stream,
)


def test_stream_ewma_matches_recursion_and_batch(spark, sf_dir, tmp_path):
    daily = (
        load_events(spark, sf_dir)
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .orderBy("day")
        .collect()
    )
    days = sorted({r.day for r in daily})
    src = str(tmp_path / "daily")
    os.makedirs(src)
    base = time.time() - 3600
    for i, day in enumerate(days):  # one finalized period per file, oldest first
        rows = [r for r in daily if r.day == day]
        path = f"{src}/{i:03d}.parquet"
        pq.write_table(
            pa.table(
                {
                    "event_type": pa.array([r.event_type for r in rows], pa.string()),
                    "day": pa.array([r.day for r in rows], pa.date32()),
                    "n": pa.array([r.n for r in rows], pa.int64()),
                }
            ),
            path,
        )
        # explicit mtimes 1 s apart: the file source orders by mtime and
        # natural write timestamps can collide under coarse clock
        # granularity (see plans/streaming_entries.q_stream_ewma)
        os.utime(path, (base + i, base + i))

    in_schema = T.StructType([f for f in EWMA_SCHEMA.fields if f.name != "ewma"])
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        stream = (
            spark.readStream.schema(in_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            ewma_stream(stream)
            .writeStream.format("memory")
            .queryName("stream_ewma")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    got = {
        (r.event_type, r.day): (r.n, r.ewma)
        for r in spark.table("stream_ewma").collect()
    }

    # (a) recursive definition, folded in Python
    expect = {}
    state = {}
    for r in sorted(daily, key=lambda r: (r.event_type, r.day)):
        prev = state.get(r.event_type)
        prev = (
            float(r.n)
            if prev is None
            else EWMA_STREAM_ALPHA * r.n + (1 - EWMA_STREAM_ALPHA) * prev
        )
        state[r.event_type] = prev
        expect[(r.event_type, r.day)] = (r.n, prev)

    assert set(got) == set(expect)
    for k, (n, ewma) in expect.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(ewma, abs=1e-9)

    # (b) the batch closed-form twin agrees (same recursion, window algebra)
    batch = {
        (r.event_type, r.day): r.ewma for r in q_events_ewma(spark, sf_dir).collect()
    }
    assert set(batch) == set(got)
    for k in got:
        assert got[k][1] == pytest.approx(batch[k], abs=1e-3)
