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


def test_zorder_write_clusters_both_columns(spark, sf_dir, tmp_path):
    """Z-order files must cover narrow ranges of BOTH interleaved columns;
    a plain range-sort on one column leaves the other column's per-file
    range ~the global range (no pruning possible on it)."""
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.layout import (
        zorder_write,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zpath = str(tmp_path / "orders_z")
    lpath = str(tmp_path / "orders_linear")
    zorder_write(orders, zpath, "o_custkey", "o_totalprice", n_files=8)
    (
        orders.repartitionByRange(8, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.parquet(lpath)
    )

    import pyarrow.parquet as pq
    from pathlib import Path

    def mean_span_frac(path, col):
        spans, glo, ghi = [], None, None
        for f in Path(path).rglob("*.parquet"):
            md = pq.read_metadata(f)
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names[col]).statistics
                los.append(st.min)
                his.append(st.max)
            if not los:
                continue
            lo, hi = min(los), max(his)
            spans.append(hi - lo)
            glo = lo if glo is None else min(glo, lo)
            ghi = hi if ghi is None else max(ghi, hi)
        return sum(spans) / len(spans) / (ghi - glo)

    # z-order: both columns clustered (8 files = 3 leading Morton bits,
    # so one column splits ~4 ways and the other ~2 — both well under 1)
    assert mean_span_frac(zpath, "o_custkey") < 0.7
    assert mean_span_frac(zpath, "o_totalprice") < 0.7
    # linear sort: its own column clusters, the other stays ~global
    assert mean_span_frac(lpath, "o_custkey") < 0.3
    assert mean_span_frac(lpath, "o_totalprice") > 0.8
