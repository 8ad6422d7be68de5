"""Streaming text ingest gate (streaming/ingest_gate.text_ingest_gate):
probe-then-append per micro-batch over the standing MinHash index.

Contracts under test (the IVF gate's, on the text side):
- stream == batch: draining N arrival slices produces, per slice,
  exactly what the batch operators produce sequentially (probe with the
  slice excluded, then append);
- arrival order honored: a doc's registry neighbors come from the
  corpus ingested BEFORE it;
- exactly-once membership and a no-op re-drain on the same checkpoint.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.text_index import (
    append_text_index,
    build_text_index,
    freshness_audit,
    ingest_text_persisted,
    read_meta,
)
from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.dedup import _docs
from migrate_blob_data_from_rdbms_to_amazon_s3_spark.streaming.ingest_gate import (
    text_ingest_gate,
)

STREAM_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


def _rowset(df):
    return {(r["batch_doc"], r["registry_doc"], r["est_jaccard"]) for r in df.collect()}


def _drain(spark, feed, index_path, results):
    stream = (
        spark.readStream.schema(STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    q = text_ingest_gate(stream, index_path, results)
    q.awaitTermination(180)


def test_text_gate_stream_equals_sequential_batches(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    base = docs.filter(F.col("doc_id") < 300)
    slice_a = docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
    slice_b = docs.filter(F.col("doc_id") >= 400)

    index_path = str(tmp_path / "tidx")
    build_text_index(base, index_path)

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    slice_a.select("doc_id", "text").coalesce(1).write.parquet(f"{feed}/a")
    time.sleep(1.1)
    slice_b.select("doc_id", "text").coalesce(1).write.parquet(f"{feed}/b")
    for sub in ("a", "b"):
        for fn in os.listdir(f"{feed}/{sub}"):
            if fn.endswith(".parquet"):
                os.rename(f"{feed}/{sub}/{fn}", f"{feed}/{sub}.parquet")

    results = str(tmp_path / "gate_out")
    _drain(spark, feed, index_path, results)

    # sequential twin on a second index
    twin = str(tmp_path / "tidx_twin")
    build_text_index(base, twin)
    want = {}
    for i, sl in enumerate((slice_a, slice_b)):
        want[i] = _rowset(
            ingest_text_persisted(spark, sl, twin, exclude_ids=sl.select("doc_id"))
        )
        append_text_index(spark, sl, twin)

    out = spark.read.parquet(results)
    for i in (0, 1):
        got = _rowset(out.filter(F.col("batch_id") == i))
        assert got == want[i]
    assert len(want[0]) > 0 or len(want[1]) > 0  # gate saw real evidence

    # exactly-once membership: index == every signable doc, once
    assert read_meta(spark, index_path)["n_docs"] == read_meta(spark, twin)["n_docs"]
    assert freshness_audit(spark, index_path)["consistent"]

    # arrival order: batch-0 neighbors predate slice_a
    assert all(reg < 300 for _, reg, _ in _rowset(out.filter("batch_id = 0")))

    # re-drain on the same checkpoint: no new batches, index unchanged
    n_before = read_meta(spark, index_path)["n_docs"]
    _drain(spark, feed, index_path, results)
    assert read_meta(spark, index_path)["n_docs"] == n_before
    assert {r.batch_id for r in out.select("batch_id").distinct().collect()} == {0, 1}
