"""Fixture-loader schema-drift shims (sources/tables.py).

The round driver regenerates the fixture parquet between rounds and the
physical timestamp encoding has varied twice already: TIMESTAMP(NANOS)
(rejected outright by Spark's vectorized reader) and tz-naive
TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ, which forbids the numeric casts
the sessionize/as-of plans use). These tests pin the loader contract: no
matter which encoding the files carry, `load_table`/`load_events` hand the
plans a plain session-tz TimestampType column with identical wall-clock
values.
"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.sources.tables import (
    load_events,
    load_table,
)

TS = [
    datetime.datetime(2024, 1, 1, 12, 0, 0),
    datetime.datetime(2024, 1, 2, 1, 30, 15, 123456),
]


def _write_events(dirpath, arrow_type):
    arr = pa.array(TS, type=arrow_type)
    table = pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": arr,
            "user_id": pa.array([10, 20], type=pa.int64()),
        }
    )
    pq.write_table(table, f"{dirpath}/events.parquet")


@pytest.mark.parametrize(
    "arrow_type",
    [
        pa.timestamp("us"),
        pa.timestamp("us", tz="UTC"),
        pa.timestamp("ns"),
        pa.timestamp("ns", tz="UTC"),
    ],
    ids=["ntz-micros", "utc-micros", "nanos", "utc-nanos"],
)
def test_events_loader_normalizes_every_encoding(spark, tmp_path, arrow_type):
    _write_events(tmp_path, arrow_type)
    df = load_events(spark, str(tmp_path))
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(r.ts for r in df.select("ts").collect())
    assert got == TS  # session tz is UTC, so values are wall-clock-identical
    # the numeric cast the sessionize/as-of plans rely on must analyze
    from pyspark.sql import functions as F

    secs = sorted(r.s for r in df.select(F.col("ts").cast("double").alias("s")).collect())
    assert secs == [t.replace(tzinfo=datetime.timezone.utc).timestamp() for t in TS]


@pytest.mark.parametrize(
    "arrow_type",
    [pa.timestamp("us"), pa.timestamp("ns")],
    ids=["ntz-micros", "nanos"],
)
def test_load_table_normalizes_any_table(spark, tmp_path, arrow_type):
    """The shims are not events-specific: a regenerated orders.parquet with
    a drifted o_orderdate encoding must normalize the same way."""
    table = pa.table(
        {
            "o_orderkey": pa.array([1], type=pa.int64()),
            "o_orderdate": pa.array([TS[0]], type=arrow_type),
        }
    )
    pq.write_table(table, f"{tmp_path}/orders.parquet")
    df = load_table(spark, str(tmp_path), "orders")
    assert dict(df.dtypes)["o_orderdate"] == "timestamp"
    assert [r.o_orderdate for r in df.collect()] == [TS[0]]


def test_loader_matches_current_fixture(spark, sf_dir):
    """Whatever encoding this round's fixtures use, the loaded events table
    exposes plain TimestampType (the type every plan and oracle assumes)."""
    df = load_events(spark, sf_dir)
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_bare_read_consistent_before_and_after_load_table(spark, tmp_path):
    """The nanosAsLong conf is session-global BY CONTRACT (set at session
    creation in session.py, not flipped mid-session by the loader): a bare
    spark.read.parquet on a nanos file yields the SAME types before and
    after a load_table call — raw int64 nanos both times, with the fix-up
    projection applied only by the loader (VERDICT r4 item 3 / ADVICE r3
    item 2)."""
    _write_events(tmp_path, pa.timestamp("ns"))
    path = f"{tmp_path}/events.parquet"
    before = dict(spark.read.parquet(path).dtypes)["ts"]
    df = load_events(spark, str(tmp_path))
    assert dict(df.dtypes)["ts"] == "timestamp"
    after = dict(spark.read.parquet(path).dtypes)["ts"]
    assert before == after == "bigint"


def test_nanos_loader_floors_pre_epoch_timestamps(spark, tmp_path):
    """Pre-epoch (negative) nanosecond values must FLOOR to micros, not
    truncate toward zero: -1001 ns is -2 µs (floor), while `div` alone
    would give -1 µs — a 1 µs divergence from the oracle's conversion."""
    pre = datetime.datetime(1969, 12, 31, 23, 59, 59, 999999)  # -1000 ns
    arr = pa.array([pre, TS[0]], type=pa.timestamp("ns"))
    # nudge both to non-zero sub-µs nanos: row 1 becomes -1001 ns
    import pyarrow.compute as pc

    arr = pc.add(arr.cast(pa.int64()), pa.scalar(-1)).cast(pa.timestamp("ns"))
    table = pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": arr,
            "user_id": pa.array([10, 20], type=pa.int64()),
        }
    )
    pq.write_table(table, f"{tmp_path}/events.parquet")
    got = {r.event_id: r.ts for r in load_events(spark, str(tmp_path)).collect()}
    # -1001 ns floors to -2 µs (`div` alone would truncate to -1 µs)
    assert got[1] == datetime.datetime(1969, 12, 31, 23, 59, 59, 999998)
    # positive value: 2024-01-01 12:00:00.000000 minus 1 ns floors back
    assert got[2] == datetime.datetime(2024, 1, 1, 11, 59, 59, 999999)
