"""Streaming operators surfaced through the driver contract.

Each entry materializes the fixture as a file-source stream (micro-batch
drops in a temp dir), runs the streaming query with
``trigger(availableNow=True)``, and returns the drained result as a batch
DataFrame. Since round 8 EVERY drain carries a full value oracle: the
single-batch drain (files_per_trigger=None) makes emission deterministic
— no mid-drain watermark can drop late rows — and the final no-data
micro-batch's watermark cutoff (max(ts) - delay) is a scalar subquery in
the twin (the stream_window_champions pattern; the stateful sessionizer
adds the timeout-flush rule pinned by tests/test_streaming.py). The
stream==batch parity statements remain in tests/test_streaming.py.
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
    is pure overhead for a fixture-sized drain. Pin to min(n, cores),
    then restore: state-store setup/commit is a per-partition fixed cost
    every micro-batch, so partitions beyond the available cores only add
    waves (r12 scaling block: the drains ANTI-scaled 14.3 s at 32 cores
    -> 24.5 s at 8 with the flat pin of 16). Production tuning raises n
    to the stateful-key parallelism the job needs; the bound stays
    cores-derived, never a local constant (r13: RocksDB provider was
    also measured for these drains — 15-20% SLOWER at fixture state
    sizes, where native-store setup outweighs any working-set win)."""
    cores = int(spark.sparkContext.defaultParallelism)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(max(1, min(n, cores))))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _stage_stream_source(spark, sf_dir: str) -> str:
    """Re-materialize events as micro-batch-sized parquet drops (the
    fixture file has TIMESTAMP(NANOS), which the streaming reader's fixed
    schema can't take directly)."""
    src = tempfile.mkdtemp(prefix="stream_src_")
    # coalesce, not repartition (r13): the drop-file count is cosmetic —
    # every oracled drain runs files_per_trigger=None (single batch) —
    # so the staging write doesn't need a round-robin exchange of the
    # whole fixture, just a narrow fan-in to a handful of files.
    load_events(spark, sf_dir).coalesce(4).write.mode("overwrite").parquet(src)
    return src


def q_stream_tumbling(spark, sf_dir):
    """Watermarked tumbling-window counts, drained with availableNow in
    COMPLETE mode — the final snapshot holds every window (complete mode
    never evicts emitted groups), and the single-batch drain
    (files_per_trigger=None) means no mid-drain watermark can drop late
    rows, so the result deterministically equals the batch twin
    analytics.q_events_tumbling and carries its FULL VALUE ORACLE
    (round 8 — this drain was the fleet's last rows-only entry besides
    the sessionizer)."""
    import shutil

    src = _stage_stream_source(spark, sf_dir)
    try:
        with _bounded_state_partitions(spark):
            result = SE.windowed_counts(
                SE.read_event_stream(spark, src, files_per_trigger=None)
            )
            SE.run_to_memory(result, "q_stream_tumbling")  # awaits full drain
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return spark.table("q_stream_tumbling")


def q_stream_hopping(spark, sf_dir):
    """Watermarked HOPPING-window counts (10-min windows every 5 min),
    drained with availableNow in COMPLETE mode — same determinism
    argument as q_stream_tumbling (complete mode never evicts, the
    single-batch drain admits no mid-drain watermark), so the drain
    equals the epoch-aligned hop-explode arithmetic and carries a full
    value oracle (the batch twin is timeseries_ext.q_events_hopping)."""
    import shutil

    src = _stage_stream_source(spark, sf_dir)
    try:
        with _bounded_state_partitions(spark):
            result = SE.hopping_counts(
                SE.read_event_stream(spark, src, files_per_trigger=None)
            )
            SE.run_to_memory(result, "q_stream_hopping")
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return spark.table("q_stream_hopping")


def q_stream_sessionize(spark, sf_dir):
    """applyInPandasWithState gap sessionization. Emission rule under a
    single-batch availableNow drain (files_per_trigger=None, so no
    mid-drain watermark drops): every gap-closed session emits, and the
    final no-data micro-batch advances the watermark to max(ts) - 2h and
    fires the EventTimeTimeout for each user's still-open session whose
    gap deadline (last_ts + 30 min) lies strictly below it — the rule
    tests/test_streaming.py::test_stateful_sessionize_matches_batch pins
    against the batch sessions. Deterministic, SQL-expressible, hence a
    FULL VALUE ORACLE since round 8 (the same cutoff-subquery pattern as
    stream_window_champions)."""
    import shutil

    from ..streaming.stateful import sessionize_stream

    src = _stage_stream_source(spark, sf_dir)
    try:
        with _bounded_state_partitions(spark):
            result = sessionize_stream(
                SE.read_event_stream(spark, src, files_per_trigger=None)
            )
            SE.run_to_memory_append(result, "q_stream_sessionize")
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return spark.table("q_stream_sessionize").orderBy("user_id", "session_seq")


def q_stream_dedup(spark, sf_dir):
    """Streaming exact dedup over a deliberately DOUBLED source (the
    fixture staged twice = an at-least-once upstream): one row per
    event_id survives. Unlike the other drains this one has a full value
    oracle — the output is deterministically the distinct event set, so
    the DuckDB twin is a plain SELECT over events."""
    import shutil

    src = tempfile.mkdtemp(prefix="stream_src_")
    try:
        ev = load_events(spark, sf_dir)
        ev.coalesce(4).write.mode("overwrite").parquet(src)  # copy A
        ev.coalesce(4).write.mode("append").parquet(src)     # copy B (dupes)
        with _bounded_state_partitions(spark):
            # files_per_trigger=None: the value oracle requires a single-
            # batch drain (a batch boundary would watermark-drop late rows)
            result = SE.dedup_stream(
                SE.read_event_stream(spark, src, files_per_trigger=None)
            )
            SE.run_to_memory_append(result, "q_stream_dedup")
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return spark.table("q_stream_dedup")


def q_stream_interval_join(spark, sf_dir):
    """Stream-stream interval join (purchase↔click attribution within a
    10-minute horizon). Deterministic under a full drain → full value
    oracle (the SQL range join over the same events)."""
    import shutil

    src = _stage_stream_source(spark, sf_dir)
    try:
        with _bounded_state_partitions(spark):
            # single-batch drain for the same reason as stream_dedup_exact
            result = SE.interval_join_streams(
                SE.read_event_stream(spark, src, files_per_trigger=None),
                SE.read_event_stream(spark, src, files_per_trigger=None),
            )
            SE.run_to_memory_append(result, "q_stream_interval_join")
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return spark.table("q_stream_interval_join")


def q_stream_window_champions(spark, sf_dir):
    """Append-mode tumbling-window champions (constant-state arg-max per
    window x type), drained in ONE batch so the final no-data micro-batch
    advances the watermark to max(ts) - delay and flushes exactly the
    windows whose end is at or below it — the emission cutoff the oracle
    reproduces with a scalar subquery. Windows still open at the cutoff
    (the stream's trailing hour) stay in state, exactly as they would in
    production."""
    import shutil

    src = _stage_stream_source(spark, sf_dir)
    try:
        with _bounded_state_partitions(spark):
            result = SE.window_champions(
                SE.read_event_stream(spark, src, files_per_trigger=None)
            )
            SE.run_to_memory_append(result, "q_stream_window_champions")
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return spark.table("q_stream_window_champions")


SPEND_TIER_CUT = 500.0


def q_stream_enrich_static(spark, sf_dir):
    """Stream-static enrichment: every purchase event joins a BROADCAST
    static dimension (per-user spend tier, built batch-side) as it
    arrives — the lookup-table pattern of every streaming enrichment
    stage. The static side is planned as a broadcast hash join against
    each micro-batch, so no stream state is kept at all and rows emit
    immediately; that per-row determinism is why this drain (unlike the
    windowed ones) carries a full value oracle."""
    import shutil

    src = _stage_stream_source(spark, sf_dir)
    try:
        dim = (
            load_events(spark, sf_dir)
            .groupBy("user_id")
            .agg(F.round(F.sum("value"), 2).alias("total_value"))
            .select(
                "user_id",
                F.when(F.col("total_value") >= SPEND_TIER_CUT, "high")
                .otherwise("standard")
                .alias("tier"),
            )
        )
        with _bounded_state_partitions(spark):
            stream = SE.read_event_stream(spark, src, files_per_trigger=None)
            result = (
                stream.filter(F.col("event_type") == "purchase")
                .join(F.broadcast(dim), "user_id")
                .select(
                    "event_id",
                    "user_id",
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
                    "value",
                    "tier",
                )
            )
            SE.run_to_memory_append(result, "q_stream_enrich_static")
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return spark.table("q_stream_enrich_static")


def q_stream_ewma(spark, sf_dir):
    """Stateful streaming EWMA drain (streaming/ewma.py): finalized daily
    aggregates arrive one period per micro-batch (one file per day,
    oldest-first, maxFilesPerTrigger=1), and the applyInPandasWithState
    kernel folds ewma_t = α·x_t + (1−α)·ewma_{t−1} carrying ONE double of
    state per event type across batches — the unbounded-series twin of
    the guarded batch closed form (plans/profiling.q_events_ewma).

    Unlike the windowed drains this one is value-DETERMINISTIC (per-key
    event-time order is forced by the file staging, floats are a fixed
    fold), so it carries a full value oracle: a DuckDB recursive CTE
    folding the SAME expression α·x + (1−α)·prev with the SAME float
    literals — IEEE-identical step for step. The driver-side staging
    collect is the constant-size reporting grain (|types|·|days| rows),
    the documented bounded-collect pattern."""
    import os
    import shutil
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..streaming.ewma import EWMA_SCHEMA, ewma_stream

    daily = (
        load_events(spark, sf_dir)
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    days = sorted({r.day for r in daily})
    src = tempfile.mkdtemp(prefix="stream_ewma_")
    try:
        base = time.time() - 3600  # well in the past; see utime below
        for i, day in enumerate(days):
            rows = [r for r in daily if r.day == day]
            path = f"{src}/{i:03d}.parquet"
            pq.write_table(
                pa.table(
                    {
                        "event_type": pa.array(
                            [r.event_type for r in rows], pa.string()
                        ),
                        "day": pa.array([r.day for r in rows], pa.date32()),
                        "n": pa.array([r.n for r in rows], pa.int64()),
                    }
                ),
                path,
            )
            # EXPLICIT mtimes one second apart: Spark's file source orders
            # files by modification time, and natural write timestamps can
            # COLLIDE under coarse kernel clock granularity (observed: a
            # 2 ms sleep produced equal mtimes on a loaded box, two days
            # swapped micro-batches, and the fold silently diverged —
            # caught by the value oracle). utime makes the order a fact,
            # not a race.
            os.utime(path, (base + i, base + i))
        from pyspark.sql import types as T

        in_schema = T.StructType(
            [f for f in EWMA_SCHEMA.fields if f.name != "ewma"]
        )
        with _bounded_state_partitions(spark, 8):
            stream = (
                spark.readStream.schema(in_schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            SE.run_to_memory_append(ewma_stream(stream), "q_stream_ewma")
    finally:
        shutil.rmtree(src, ignore_errors=True)
    return spark.table("q_stream_ewma")


QUERIES = {
    "stream_tumbling_windows": q_stream_tumbling,
    "stream_hopping_windows": q_stream_hopping,
    "stream_ewma": q_stream_ewma,
    "stream_enrich_static": q_stream_enrich_static,
    "stream_sessionize_stateful": q_stream_sessionize,
    "stream_dedup_exact": q_stream_dedup,
    "stream_window_champions": q_stream_window_champions,
    "stream_interval_join": q_stream_interval_join,
}

def _batch_tumbling_oracle() -> str:
    """events_tumbling's oracle, shared verbatim — a complete-mode
    single-batch drain is the batch aggregation."""
    from .analytics import ORACLES as _A

    return _A["events_tumbling"]


def _stream_ewma_oracle() -> str:
    """Recursive-CTE fold of EXACTLY the kernel's float recursion: the
    repr'd double literals parse to the same IEEE doubles Python
    multiplies by (repr(1-0.3) == '0.7', and DuckDB's 0.7 is the same
    double), and the step expression α·x + β·prev has the same operation
    order — so every intermediate double is bit-identical and the
    UNROUNDED values hash-match (verified: a tie row at sf0.01 showed
    DuckDB's multiply-floor ROUND disagreeing with Python's exact-decimal
    round on the SAME double — so neither side rounds)."""
    from ..streaming.ewma import EWMA_STREAM_ALPHA as A

    return f"""
        WITH RECURSIVE daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        ordered AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                         ORDER BY day) AS rn
            FROM daily
        ),
        fold(event_type, day, n, rn, e) AS (
            SELECT event_type, day, n, rn, CAST(n AS DOUBLE)
            FROM ordered WHERE rn = 1
            UNION ALL
            SELECT o.event_type, o.day, o.n, o.rn,
                   {A!r} * CAST(o.n AS DOUBLE) + {1 - A!r} * f.e
            FROM fold f JOIN ordered o
              ON o.event_type = f.event_type AND o.rn = f.rn + 1
        )
        SELECT event_type, day, n, e AS ewma FROM fold
    """


ORACLES = {
    "stream_ewma": _stream_ewma_oracle(),
    # complete-mode single-batch drain == the epoch-aligned hop-explode
    # (see q_stream_hopping; batch twin timeseries_ext.events_hopping)
    "stream_hopping_windows": """
        WITH exploded AS (
            SELECT event_type, value,
                   CAST((floor(epoch(ts) / 300) - k.k) * 300 AS BIGINT)
                     AS wstart
            FROM events
            CROSS JOIN (SELECT UNNEST(range(0, 2)) AS k) k
        )
        SELECT strftime(to_timestamp(wstart), '%Y-%m-%d %H:%M:%S')
                 AS bucket_start,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM exploded
        GROUP BY 1, 2
    """,
    # complete-mode single-batch drain == the batch tumbling aggregation
    # (see q_stream_tumbling) — share the batch twin's oracle verbatim
    "stream_tumbling_windows": _batch_tumbling_oracle(),
    "stream_sessionize_stateful": """
        WITH seq AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN LAG(epoch(ts)) OVER w IS NULL
                             OR (epoch(ts) - LAG(epoch(ts)) OVER w) > 1800
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, value, epoch(ts) AS ts_epoch,
                   SUM(is_new) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM seq
        ),
        agg AS (
            SELECT user_id, session_seq,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 2) AS session_value,
                   MAX(ts_epoch) AS end_ts,
                   MAX(MAX(session_seq)) OVER (PARTITION BY user_id)
                       AS last_seq
            FROM sessions GROUP BY user_id, session_seq
        ),
        wm AS (SELECT MAX(epoch(ts)) - 7200.0 AS w FROM events)
        SELECT user_id, session_seq, n_events, session_value
        FROM agg, wm
        WHERE session_seq < last_seq OR end_ts + 1800.0 < wm.w
    """,
    "stream_window_champions": """
        WITH cut AS (SELECT MAX(ts) - INTERVAL 10 MINUTE AS wm FROM events),
        bucketed AS (
            SELECT to_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT))
                     AS ws,
                   event_type, value, event_id
            FROM events
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY ws, event_type
                                         ORDER BY value DESC, event_id DESC)
                        AS rn
            FROM bucketed
        ),
        agg AS (
            SELECT ws, event_type, COUNT(*) AS n_events,
                   ROUND(SUM(value), 2) AS sum_value
            FROM bucketed GROUP BY ws, event_type
        )
        SELECT strftime(a.ws, '%Y-%m-%d %H:%M:%S') AS bucket_start,
               a.event_type, a.n_events, a.sum_value,
               r.event_id AS top_event_id,
               r.value AS top_value
        FROM agg a
        JOIN ranked r ON r.ws = a.ws AND r.event_type = a.event_type
                     AND r.rn = 1, cut
        WHERE a.ws + INTERVAL 1 HOUR <= wm
    """,
    "stream_enrich_static": f"""
        WITH dim AS (
            SELECT user_id,
                   CASE WHEN ROUND(SUM(value), 2) >= {SPEND_TIER_CUT}
                        THEN 'high' ELSE 'standard' END AS tier
            FROM events GROUP BY user_id
        )
        SELECT e.event_id, e.user_id,
               strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
               e.value, d.tier
        FROM events e JOIN dim d USING (user_id)
        WHERE e.event_type = 'purchase'
    """,
    "stream_dedup_exact": """
        SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
               user_id, event_type, value
        FROM events
    """,
    "stream_interval_join": """
        SELECT p.event_id AS purchase_id, c.event_id AS click_id,
               p.user_id AS user_id,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
               strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
               p.value AS value
        FROM events p JOIN events c
          ON p.user_id = c.user_id
         AND p.event_type = 'purchase' AND c.event_type = 'click'
         AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts
    """,
}