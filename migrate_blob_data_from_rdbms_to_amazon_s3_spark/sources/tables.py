"""Fixture-table loaders, including parquet compatibility shims.

The driver regenerates the fixture parquet between rounds and the physical
timestamp encoding has varied; the engine's semantics are defined on
session-timezone timestamps (session tz pinned to UTC in `session.py`), so
the loader normalizes whatever the files contain to plain TimestampType:

- TIMESTAMP(NANOS): Spark's vectorized Parquet reader rejects it
  (PARQUET_TYPE_ILLEGAL). The documented escape hatch is
  ``spark.sql.legacy.parquet.nanosAsLong``: read nanos as int64, then convert
  to a proper TimestampType at microsecond precision (`ts div 1000` — integer
  division, exact; a double round-trip would lose precision at 1.7e18 ns).
- TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 maps it to
  TIMESTAMP_NTZ, which forbids numeric casts (`cast(ts as double)` is a
  DATATYPE_MISMATCH) and diverges from the DuckDB oracle's naive-timestamp
  arithmetic. NTZ → TIMESTAMP_LTZ under a UTC session tz is value-identity,
  so the cast restores the exact semantics every oracle was validated
  against.

Both shims are one JVM-side projection — no Python, no extra scan, and the
projection collapses into the scan node so column pruning still works.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast any TIMESTAMP_NTZ column to session-tz TimestampType (see module
    docstring; identity on values while session tz is UTC)."""
    ntz_cols = [name for name, dtype in df.dtypes if dtype == "timestamp_ntz"]
    if not ntz_cols:
        return df
    return df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return _normalize_ntz(spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def _has_nanos(path: str) -> bool:
    """Cheap footer-only probe (no Spark job) for TIMESTAMP(NANOS) columns."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path.removeprefix("file:"))
        return any(str(t) == "timestamp[ns]" for t in schema.types)
    except Exception:
        return False


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    path = f"{sf_dir}/events.parquet"
    if _has_nanos(path):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return _normalize_ntz(df)
