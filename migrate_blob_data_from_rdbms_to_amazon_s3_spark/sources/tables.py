"""Fixture-table loaders, including parquet compatibility shims.

``events.parquet`` is written with TIMESTAMP(NANOS) which Spark's vectorized
Parquet reader rejects (PARQUET_TYPE_ILLEGAL). The documented escape hatch is
``spark.sql.legacy.parquet.nanosAsLong``: read nanos as int64, then convert
to a proper TimestampType at microsecond precision (`ts div 1000` — integer
division, exact; a double round-trip would lose precision at 1.7e18 ns).
The conversion is one JVM-side projection — no Python, no extra scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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
    return df
