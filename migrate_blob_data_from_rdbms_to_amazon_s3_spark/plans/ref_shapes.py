"""Reference-shaped tables derived deterministically from the driver fixtures.

FIXTURES.md §A defines the two reference tables (``orders`` target shape,
``orders_rdbms_blob`` legacy shape — sql_schema/order.sql:2-7 and
order_rdbms_blob.sql:2-7). The driver materializes TPC-H-ish fixtures
instead, so we derive reference shapes from them with transforms simple
enough to mirror exactly in the DuckDB oracle:

- ``orders`` (pointer table)   ← fixture ``orders``: PK is the orderkey as a
  varchar (the reference PK is a varchar UUID — what matters is *string*
  ordering semantics), description from o_orderpriority, default s3_prefix.
- ``orders_rdbms_blob``        ← fixture ``documents``: text encoded to a
  real ``BinaryType`` payload, standing in for the LONGBLOB column.

Both sides (Spark builder + SQL CTE) live here so they can never drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalars import DEFAULT_S3_PREFIX


def ref_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-shape pointer table: (order_id, description, s3_prefix)."""
    return spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").cast("string").alias("order_id"),
        F.col("o_orderpriority").alias("description"),
        F.lit(DEFAULT_S3_PREFIX).alias("s3_prefix"),
        F.col("o_orderkey").alias("_num_key"),  # kept for deterministic splits; dropped by consumers
    )


REF_ORDERS_SQL = (
    "SELECT CAST(o_orderkey AS VARCHAR) AS order_id, "
    "o_orderpriority AS description, "
    "'image.png' AS s3_prefix, "
    "o_orderkey AS _num_key FROM orders"
)


def ref_blob_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy-shape blob table: (order_id, description, order_blob)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("order_id"),
        F.substring("text", 1, 20).alias("description"),
        F.encode("text", "UTF-8").alias("order_blob"),
    )


REF_BLOB_ORDERS_SQL = (
    "SELECT CAST(doc_id AS VARCHAR) AS order_id, "
    "substring(text, 1, 20) AS description, "
    "encode(text) AS order_blob FROM documents"
)
