"""Streaming operators surfaced through the driver contract.

Each entry materializes the fixture as a file-source stream (micro-batch
drops in a temp dir), runs the streaming query with
``trigger(availableNow=True)``, and returns the drained result as a batch
DataFrame. No ``oracle_sql()`` twins — streaming drains aren't
SQL-expressible — so the driver records rows-only checks; the strong
correctness statements (stream == batch twin) live in
tests/test_streaming.py.
"""

from __future__ import annotations

import tempfile
from contextlib import contextmanager

from pyspark.sql import functions as F

from ..sources.tables import load_events
from ..streaming import events as SE


@contextmanager
def _bounded_state_partitions(spark, n: int = 16):
    """Streaming state-store partition count is frozen from
    spark.sql.shuffle.partitions at query start; a vanilla session's 200
    is pure overhead for a fixture-sized drain. Pin, then restore."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _stage_stream_source(spark, sf_dir: str) -> str:
    """Re-materialize events as micro-batch-sized parquet drops (the
    fixture file has TIMESTAMP(NANOS), which the streaming reader's fixed
    schema can't take directly)."""
    src = tempfile.mkdtemp(prefix="stream_src_")
    load_events(spark, sf_dir).repartition(4).write.mode("overwrite").parquet(src)
    return src


def q_stream_tumbling(spark, sf_dir):
    """Watermarked tumbling-window counts, drained with availableNow.
    Batch twin (and oracle): analytics.q_events_tumbling."""
    import shutil

    src = _stage_stream_source(spark, sf_dir)
    try:
        with _bounded_state_partitions(spark):
            result = SE.windowed_counts(SE.read_event_stream(spark, src))
            SE.run_to_memory(result, "q_stream_tumbling")  # awaits full drain
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return spark.table("q_stream_tumbling")


def q_stream_sessionize(spark, sf_dir):
    """applyInPandasWithState gap sessionization (closed sessions only —
    each user's final session stays open in the state store at drain)."""
    import shutil

    from ..streaming.stateful import sessionize_stream

    src = _stage_stream_source(spark, sf_dir)
    try:
        with _bounded_state_partitions(spark):
            result = sessionize_stream(SE.read_event_stream(spark, src))
            SE.run_to_memory_append(result, "q_stream_sessionize")
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return spark.table("q_stream_sessionize").orderBy("user_id", "session_seq")


QUERIES = {
    "stream_tumbling_windows": q_stream_tumbling,
    "stream_sessionize_stateful": q_stream_sessionize,
}

ORACLES: dict[str, str] = {}
