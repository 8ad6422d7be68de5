"""Layout operators: partition pruning must show in the scan plan; the
compactor must reduce file count without changing data."""

from pathlib import Path

from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.layout import (
    compact,
    read_month,
    write_partitioned_by_month,
)


def test_partition_pruning(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = f"file:{tmp_path}/orders_part"
    write_partitioned_by_month(orders, path)

    pruned = read_month(spark, path, 1996, 7)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    part_filters = plan.split("PartitionFilters:", 1)[1][:200]
    assert "yr" in part_filters and "mo" in part_filters

    want = orders.filter(
        (F.year("o_orderdate") == 1996) & (F.month("o_orderdate") == 7)
    ).count()
    assert pruned.count() == want


def test_compact_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = f"file:{tmp_path}/orders_small_files"
    orders.repartition(37).write.parquet(path)
    before = len(list(Path(str(tmp_path) + "/orders_small_files").rglob("*.parquet")))
    assert before == 37

    n = compact(spark, path, target_file_mb=128)
    after = len(list(Path(str(tmp_path) + "/orders_small_files").rglob("*.parquet")))
    assert after == n < before
    assert spark.read.parquet(path).count() == orders.count()
