"""Stateful streaming EWMA: the O(1)-state smoothing twin of the batch
``plans.profiling.q_events_ewma`` (whose closed-form running-sum window
needs the whole series; this kernel needs only the previous smoothed
value, so it runs forever on an unbounded stream).

Contract: the input stream carries FINALIZED per-period aggregates
(event_type, day, n) — the shape an upstream watermarked window emits —
delivered in event-time order per key (Spark's file/Kafka sources keep
per-partition order; a watermarked upstream window finalizes periods in
order). The kernel folds ewma_t = α·x_t + (1−α)·ewma_{t−1} per
event_type, seeding with the first observation, and keeps exactly one
double of state per key. Out-of-order periods within one micro-batch are
repaired by a per-batch sort; cross-batch disorder is the upstream
window's watermark contract, not this kernel's.

Scale: state = |keys| doubles; the shuffle is one hash exchange on
event_type; each micro-batch does O(rows) work.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_STREAM_ALPHA = 0.3

EWMA_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("day", T.DateType()),
        T.StructField("n", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

# state: the previous smoothed value — the entire memory of the stream
STATE_SCHEMA = T.StructType([T.StructField("prev_ewma", T.DoubleType())])


def _ewma_kernel(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    prev = state.get[0] if state.exists else None

    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        state.update((prev,))
        return
    batch = pd.concat(chunks, ignore_index=True).sort_values("day")

    out = []
    for day, n in zip(batch["day"], batch["n"]):
        x = float(n)
        prev = x if prev is None else EWMA_STREAM_ALPHA * x + (1 - EWMA_STREAM_ALPHA) * prev
        # emit the UNROUNDED fold value: the DuckDB oracle reproduces the
        # recursion bit-for-bit (same literals, same op order), so the
        # full doubles hash-match — while any decimal rounding reopens
        # the Python-round (exact) vs SQL-ROUND (multiply-floor) tie gap
        out.append((event_type, day, int(n), prev))

    state.update((prev,))
    yield pd.DataFrame(out, columns=["event_type", "day", "n", "ewma"])


def ewma_stream(daily: DataFrame) -> DataFrame:
    """Stateful EWMA over a streaming (event_type, day, n) DataFrame."""
    return daily.groupBy("event_type").applyInPandasWithState(
        _ewma_kernel,
        outputStructType=EWMA_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
