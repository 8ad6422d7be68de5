"""Storage-layout operators: partitioned writes and small-file compaction.

At 100 TB, layout is the optimizer's biggest lever:

- **Hive-style partitioning** (``partitionBy`` on a low-cardinality derived
  column, e.g. order month) turns date-range predicates into directory
  pruning — the scan never opens non-matching files. The reference's
  row-store analog is the indexed ``ORDER BY order_id LIMIT`` scan; here
  pruning happens at the file listing.
- **Compaction** re-coalesces a table into target-sized files. Streaming
  sinks and keyed-mutation rewrites accrete small files; scans then pay
  per-file open cost and lose vectorized-read efficiency. Size targets:
  ~128 MB parquet files (one row-group) so one file ≈ one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_by_month(
    df: DataFrame, path: str, ts_col: str = "o_orderdate"
) -> None:
    """Write Hive-partitioned by (year, month) of `ts_col`."""
    (
        df.withColumn("yr", F.year(ts_col))
        .withColumn("mo", F.month(ts_col))
        .write.mode("overwrite")
        .partitionBy("yr", "mo")
        .parquet(path)
    )


def read_month(spark: SparkSession, path: str, yr: int, mo: int) -> DataFrame:
    """Partition-pruned read: the (yr, mo) predicate resolves at file
    listing — check PartitionFilters in the scan node."""
    return spark.read.parquet(path).filter((F.col("yr") == yr) & (F.col("mo") == mo))


def compact(spark: SparkSession, path: str, target_file_mb: int = 128) -> int:
    """Rewrite `path` with files sized ~`target_file_mb`. Returns the new
    file count. Uses the table's on-disk byte size to pick the partition
    count (cheap: file-listing metadata only, no data scan)."""
    from pathlib import Path

    local = path.removeprefix("file:")
    total_bytes = sum(p.stat().st_size for p in Path(local).rglob("*.parquet"))
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = f"{path.rstrip('/')}_compacting"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    # atomic-ish swap (same filesystem)
    import shutil

    tmp_local = tmp.removeprefix("file:")
    shutil.rmtree(local)
    shutil.move(tmp_local, local)
    return n_files


def zorder_write(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Z-order-clustered write: interleave the bits of two (min/max
    scaled) numeric columns into one Morton key, range-partition and sort
    the table by it, and write — so EVERY file covers a narrow range of
    BOTH columns and parquet min/max (or a table format's file stats) can
    prune scans filtered on either one. A plain sort clusters only its
    leading column; Z-order is the layout move for two independent
    predicate columns (the multi-dimensional analog of
    write_partitioned_by_month's directory pruning).

    The column bounds come from one min/max aggregation inlined as
    literals (k-means-style legitimate driver collect — 4 scalars);
    the Morton key is a pure JVM-side bit expression, dropped before
    write. Scaling is linear, so heavy value skew concentrates buckets —
    for skewed columns substitute a rank/percentile scale (same
    interleave)."""
    row = df.agg(
        F.min(col_x).alias("nx"),
        F.max(col_x).alias("xx"),
        F.min(col_y).alias("ny"),
        F.max(col_y).alias("xy"),
    ).collect()[0]
    m = 1 << bits

    def _scaled(col: str, lo: float, hi: float) -> str:
        span = (hi - lo) or 1.0
        return (
            f"CAST(LEAST({m - 1}, GREATEST(0, FLOOR("
            f"(CAST({col} AS DOUBLE) - {float(lo)!r}) / {float(span)!r} * {m}"
            f"))) AS BIGINT)"
        )

    sx = _scaled(col_x, row.nx, row.xx)
    sy = _scaled(col_y, row.ny, row.xy)
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(shiftright(_zx, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright(_zy, {i}) & 1, {2 * i + 1})")
    (
        df.withColumn("_zx", F.expr(sx))
        .withColumn("_zy", F.expr(sy))
        .withColumn("_z", F.expr(" + ".join(terms)))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_zx", "_zy", "_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def read_evolved(
    spark: SparkSession, path: str, target_schema, fill_defaults: dict | None = None
) -> DataFrame:
    """Schema-evolution read: a table whose files were written under
    DIFFERENT schema versions (columns added over time) reads back as one
    DataFrame under ``target_schema``.

    ``mergeSchema`` makes the parquet footer union the file schemas (off
    by default — a per-file footer read, so only pay it on evolved
    tables); columns absent from old files surface as NULL and are then
    coalesced to ``fill_defaults``. Columns are also re-ordered/pruned to
    the target schema, so downstream code sees one stable shape no matter
    which era of files a partition pruned down to."""
    fill = fill_defaults or {}
    df = spark.read.option("mergeSchema", "true").parquet(path)
    cols = []
    for field in target_schema.fields:
        if field.name in df.columns:
            c = F.col(field.name).cast(field.dataType)
            if field.name in fill:
                c = F.coalesce(c, F.lit(fill[field.name]).cast(field.dataType))
        else:
            c = F.lit(fill.get(field.name)).cast(field.dataType)
        cols.append(c.alias(field.name))
    return df.select(*cols)
