"""Bucketed co-located join: the join plan must contain NO shuffle
exchange (the write-time bucketing already co-located the keys), and
results must match the plain join."""

import shutil

from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)


def _drop_table_and_orphan_location(spark, table):
    # A killed earlier run can leave the managed-table directory behind with
    # no catalog entry; saveAsTable then fails with LOCATION_ALREADY_EXISTS.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    # force the SMJ path: at this fixture size AQE would broadcast, which
    # also avoids the shuffle but wouldn't demonstrate bucket alignment
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _drop_table_and_orphan_location(spark, "b_orders")
        _drop_table_and_orphan_location(spark, "b_lineitem")
        write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
        write_bucketed(li.select("o_orderkey", "l_quantity"), "b_lineitem", "o_orderkey", n_buckets=8)

        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey").select(
            "o_orderkey", "o_totalprice", "l_quantity"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan

        want = (
            orders.join(li.select("o_orderkey", "l_quantity"), "o_orderkey")
            .count()
        )
        assert joined.count() == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
