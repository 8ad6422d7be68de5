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


def test_schema_evolution_read(spark, tmp_path):
    """Files written under three schema versions read back as one stable
    shape: missing columns NULL-filled (or defaulted), types unified."""
    from pyspark.sql import types as T

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.layout import (
        read_evolved,
    )

    path = f"file:{tmp_path}/evolved"
    # v1: (id, name)
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string").write.parquet(
        path
    )
    # v2 adds score
    spark.createDataFrame(
        [(3, "c", 1.5)], "id long, name string, score double"
    ).write.mode("append").parquet(path)
    # v3 adds flag
    spark.createDataFrame(
        [(4, "d", 2.5, True)], "id long, name string, score double, flag boolean"
    ).write.mode("append").parquet(path)

    target = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("flag", T.BooleanType()),
            T.StructField("era", T.StringType()),  # never written anywhere
        ]
    )
    got = read_evolved(
        spark, path, target, fill_defaults={"score": 0.0, "flag": False, "era": "na"}
    )
    assert got.columns == ["id", "name", "score", "flag", "era"]
    rows = {r.id: r for r in got.collect()}
    assert rows[1].score == 0.0 and rows[1].flag is False and rows[1].era == "na"
    assert rows[3].score == 1.5 and rows[3].flag is False
    assert rows[4].flag is True
