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
