"""Fixture-table loaders, including parquet compatibility shims.

The driver regenerates the fixture parquet between rounds and the physical
timestamp encoding has varied; the engine's semantics are defined on
session-timezone timestamps (session tz pinned to UTC in `session.py`), so
the loader normalizes whatever the files contain to plain TimestampType:

- TIMESTAMP(NANOS) (tz-adjusted or not): Spark's vectorized Parquet reader
  rejects it (PARQUET_TYPE_ILLEGAL). The documented escape hatch is
  ``spark.sql.legacy.parquet.nanosAsLong``: read nanos as int64, then convert
  to a proper TimestampType at microsecond precision (`div 1000` — integer
  division, exact; a double round-trip would lose precision at 1.7e18 ns).
- TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 maps it to
  TIMESTAMP_NTZ, which forbids numeric casts (`cast(ts as double)` is a
  DATATYPE_MISMATCH) and diverges from the DuckDB oracle's naive-timestamp
  arithmetic. NTZ → TIMESTAMP_LTZ under a UTC session tz is value-identity,
  so the cast restores the exact semantics every oracle was validated
  against.

Both shims apply to EVERY table (any column the footer declares as nanos,
any column Spark surfaces as NTZ), are one JVM-side projection — no Python,
no extra scan — and the projection collapses into the scan node so column
pruning still works.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _nanos_columns(path: str) -> list[str]:
    """Footer-only probe (no Spark job): names of TIMESTAMP(NANOS) columns,
    tz-adjusted or not — ``str(type)`` would miss ``timestamp[ns, tz=UTC]``,
    so match on the unit."""
    try:
        import pyarrow.parquet as pq
        import pyarrow.types as pt

        schema = pq.read_schema(path.removeprefix("file:"))
        return [
            f.name
            for f in schema
            if pt.is_timestamp(f.type) and f.type.unit == "ns"
        ]
    except Exception:
        return []


def _normalize(df: DataFrame, nanos_cols: list[str]) -> DataFrame:
    dtypes = dict(df.dtypes)
    fixes = {}
    for c in nanos_cols:
        if dtypes.get(c) == "bigint":  # read via nanosAsLong
            # FLOOR division on the long (exact — no double round-trip):
            # `div` truncates toward zero, which would round a pre-epoch
            # (negative) nanosecond value UP by 1µs; the % guard restores
            # floor semantics for all signs (Spark's % takes the dividend's
            # sign, so -1001 ns -> -2 µs, matching the oracle's conversion)
            fixes[c] = F.timestamp_micros(
                F.expr(
                    f"`{c}` div 1000 - (CASE WHEN `{c}` % 1000 < 0 THEN 1 ELSE 0 END)"
                )
            )
    for c, dtype in dtypes.items():
        if dtype == "timestamp_ntz":
            fixes[c] = F.col(c).cast("timestamp")
    return df.withColumns(fixes) if fixes else df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    nanos_cols = _nanos_columns(path)
    # ``nanosAsLong`` is session-global BY CONTRACT and set at session
    # creation (session.py) — so a bare spark.read.parquet on a nanos file
    # behaves identically before and after any load_table call (raw bigint
    # both times; only the loader applies the fix-up projection). The set
    # below is a fallback for sessions not built by get_spark; it cannot be
    # scoped-and-restored because Spark resolves the conf lazily at action
    # time, so restoring before the action would break the read
    # (PARQUET_TYPE_ILLEGAL). Asserted by tests/test_tables_loader.py.
    if nanos_cols and spark.conf.get(
        "spark.sql.legacy.parquet.nanosAsLong", "false"
    ) != "true":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return _normalize(spark.read.parquet(path), nanos_cols)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")
