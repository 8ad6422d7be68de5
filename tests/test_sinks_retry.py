"""Idempotent foreachBatch Parquet sink (replay-safe) and bounded-retry
object-store wrapper."""

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.sources.object_store import (
    LocalFSObjectStore,
    RetryingStore,
)
from migrate_blob_data_from_rdbms_to_amazon_s3_spark.sources.tables import load_events
from migrate_blob_data_from_rdbms_to_amazon_s3_spark.streaming import events as SE
from migrate_blob_data_from_rdbms_to_amazon_s3_spark.streaming.sinks import (
    write_idempotent_parquet,
)


def test_foreachbatch_parquet_sink_exactly_once(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ev = load_events(spark, sf_dir)
    ev.repartition(4).write.parquet(src)

    stream = SE.read_event_stream(spark, src).select("event_id", "event_type")
    q = write_idempotent_parquet(stream, out, "sink_drain")
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()

    # replay the same batch data through a FRESH checkpoint (simulating a
    # post-crash replay of already-written batch ids): dynamic partition
    # overwrite rewrites the same batch_id partitions — no duplicates
    import shutil

    shutil.rmtree(f"{out}__checkpoint")
    q2 = write_idempotent_parquet(stream, out, "sink_drain_replay")
    q2.awaitTermination()
    again = spark.read.parquet(out)
    assert again.count() == ev.count()
    assert again.select("event_id").distinct().count() == ev.count()


class _FlakyStore:
    """Fails the first N calls of each mutating op, then succeeds."""

    def __init__(self, inner, fail_first: int):
        self.inner = inner
        self.fails = {"put": fail_first, "get": fail_first, "delete": fail_first}

    def _maybe_fail(self, op):
        if self.fails[op] > 0:
            self.fails[op] -= 1
            raise ConnectionResetError(f"transient {op} failure")

    def put(self, key, payload):
        self._maybe_fail("put")
        return self.inner.put(key, payload)

    def get(self, key):
        self._maybe_fail("get")
        return self.inner.get(key)

    def delete(self, key):
        self._maybe_fail("delete")
        return self.inner.delete(key)

    def head(self, key):
        return self.inner.head(key)


def test_retrying_store_masks_transient_failures(tmp_path):
    base = LocalFSObjectStore(str(tmp_path))
    store = RetryingStore(_FlakyStore(base, fail_first=2), attempts=3, backoff_s=0.001)
    store.put("a/b.bin", b"payload")
    assert store.get("a/b.bin") == b"payload"
    assert store.head("a/b.bin")
    assert store.delete("a/b.bin") is True
    assert not base.head("a/b.bin")


def test_retrying_store_gives_up_after_attempts(tmp_path):
    base = LocalFSObjectStore(str(tmp_path))
    store = RetryingStore(_FlakyStore(base, fail_first=5), attempts=3, backoff_s=0.001)
    try:
        store.put("x", b"y")
        raised = False
    except ConnectionResetError:
        raised = True
    assert raised
    assert not base.head("x")


def test_retrying_store_fails_fast_on_permanent_errors(tmp_path):
    """A missing key is permanent: one attempt, no backoff sleeps."""
    base = LocalFSObjectStore(str(tmp_path))
    calls = {"n": 0}

    class Counting:
        def get(self, key):
            calls["n"] += 1
            return base.get(key)

        def head(self, key):
            return base.head(key)

    store = RetryingStore(Counting(), attempts=3, backoff_s=0.001)
    try:
        store.get("definitely/missing")
        raised = False
    except FileNotFoundError:
        raised = True
    assert raised
    assert calls["n"] == 1


def test_retrying_store_classifies_s3_client_errors(tmp_path):
    """botocore ClientError shapes: 404/403 are permanent (one attempt);
    503 SlowDown is transient (retried to exhaustion)."""

    class FakeClientError(Exception):
        def __init__(self, status):
            super().__init__(f"http {status}")
            self.response = {"ResponseMetadata": {"HTTPStatusCode": status}}

    for status, want_calls in ((404, 1), (403, 1), (503, 3)):
        calls = {"n": 0}

        class Failing:
            def get(self, key):
                calls["n"] += 1
                raise FakeClientError(status)

        store = RetryingStore(Failing(), attempts=3, backoff_s=0.001)
        try:
            store.get("k")
            raised = False
        except FakeClientError:
            raised = True
        assert raised
        assert calls["n"] == want_calls, (status, calls["n"])


def test_fresh_checkpoint_drain_clears_stale_batch_partitions(spark, sf_dir, tmp_path):
    """A drain starting WITHOUT a checkpoint renumbers batches from 0 —
    any surviving batch_id partitions from a previous run would read as
    duplicates, so the sink clears them first."""
    import os

    src = str(tmp_path / "src2")
    out = str(tmp_path / "out2")
    ev = load_events(spark, sf_dir).limit(100)
    ev.coalesce(1).write.parquet(src)

    # plant a stale partition a crashed previous run might have left
    os.makedirs(f"{out}/batch_id=99")
    spark.createDataFrame([(-999, "stale")], "event_id long, event_type string")\
        .coalesce(1).write.mode("overwrite").parquet(f"{out}/batch_id=99")

    stream = SE.read_event_stream(spark, src).select("event_id", "event_type")
    q = write_idempotent_parquet(stream, out, "sink_fresh_ckpt")
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.filter("event_id = -999").count() == 0
    assert got.count() == 100
