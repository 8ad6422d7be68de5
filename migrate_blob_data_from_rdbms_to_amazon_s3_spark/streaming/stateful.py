"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY §2 H is empty in the reference — this
is the §7 streaming extension's stateful leg).

Semantics match the batch twin ``plans.analytics.q_events_sessionize``
(a session breaks when >30 min separate consecutive events of one user),
so the batch query doubles as the correctness oracle: draining the stream
emits exactly the batch sessions minus each user's final (still-open)
session, which stays in the state store awaiting the watermark.

Scale: state is O(open sessions) = O(active users), not O(events); the
shuffle is one hash exchange on user_id. Late data beyond the watermark
is dropped by the engine before the kernel sees it.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 1800.0

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_seq", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_value", T.DoubleType()),
    ]
)

# state: (next_session_seq, last_ts_epoch, open_n_events, open_sum_value)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("next_seq", T.LongType()),
        T.StructField("last_ts", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _sessionize_kernel(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user kernel: folds event batches into the open session, emitting
    a row whenever a >30 min gap closes one. Events arrive unsorted within
    a micro-batch, and one group's micro-batch may be delivered as SEVERAL
    Arrow chunks with no cross-chunk ordering — so all chunks are
    concatenated and sorted ONCE by (ts, event_id) before folding (sorting
    each chunk independently would mis-split sessions and let an older
    event rewind last_ts). Cross-MICRO-BATCH reordering remains bounded by
    the watermark: the engine drops events older than it before the kernel
    runs, so a session already folded can only be perturbed by events
    within the watermark delay — the same guarantee Spark's own
    session_window offers."""
    (user_id,) = key

    if state.hasTimedOut:
        # gap elapsed with no new events: flush the open session
        if state.exists:
            next_seq, last_ts, n_events, sum_value = state.get
            if n_events:
                yield pd.DataFrame(
                    [(user_id, next_seq, n_events, round(sum_value, 2))],
                    columns=["user_id", "session_seq", "n_events", "session_value"],
                )
        state.remove()
        return

    if state.exists:
        next_seq, last_ts, n_events, sum_value = state.get
    else:
        next_seq, last_ts, n_events, sum_value = 1, None, 0, 0.0

    closed: list[tuple[int, int, int, float]] = []
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        batch = pd.concat(chunks, ignore_index=True).sort_values(["ts", "event_id"])
        for ts, value in zip(batch["ts"], batch["value"]):
            ts_epoch = ts.timestamp()
            if last_ts is not None and ts_epoch - last_ts > SESSION_GAP_SECONDS:
                closed.append((user_id, next_seq, n_events, round(sum_value, 2)))
                next_seq, n_events, sum_value = next_seq + 1, 0, 0.0
            n_events += 1
            sum_value += float(value)
            last_ts = ts_epoch

    state.update((next_seq, last_ts, n_events, sum_value))
    if last_ts is not None:
        # close the open session if no event arrives within the gap; never
        # earlier than the watermark (the engine rejects stale timeouts)
        gap_end_ms = int((last_ts + SESSION_GAP_SECONDS) * 1000)
        state.setTimeoutTimestamp(max(gap_end_ms, state.getCurrentWatermarkMs() + 1))

    if closed:
        yield pd.DataFrame(
            closed, columns=["user_id", "session_seq", "n_events", "session_value"]
        )


def sessionize_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful sessionization over a streaming events DataFrame."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_kernel,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
