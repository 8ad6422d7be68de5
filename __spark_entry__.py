"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship paginated-list query (reference lifecycle
SURVEY.md §3.1) on sf0.001. ``queries()`` / ``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 plus the analytics / LLM-pipeline
extensions; the driver hash-compares each against its DuckDB oracle at
sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans import collect_all

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's `GET /orders` list page end-to-end
    (count → clamp → ordered page → envelope fields; order.js:259-299)."""
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.pagination import (
        clamp_page_params,
        page,
    )
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.ref_shapes import ref_orders

    df = ref_orders(spark, _SMOKE_SF_DIR).select("order_id", "description", "s3_prefix")
    total = df.count()
    limit, offset = clamp_page_params(None, "10", total)
    return page(df, "order_id", limit, offset).select(
        "order_id",
        "description",
        "s3_prefix",
        F.lit(limit).alias("page_limit"),
        F.lit(offset).alias("page_offset"),
        F.lit(total).alias("orders_count"),
        F.lit(0 if limit > total else limit // total if total else 0).alias("pages"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 / §7)."""
    q, _ = collect_all()
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; keys without one get rows-only checks."""
    _, o = collect_all()
    return o
