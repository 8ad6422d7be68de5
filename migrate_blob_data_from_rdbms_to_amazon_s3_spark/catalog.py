"""Table registry: name → path → explicit schema.

The reference declares fixed schemas via DDL (``lambda_fns/sql_schema/*.sql``,
executed by ``db_setup.js:57-69``) — no inference anywhere. We mirror that:
every table the engine reads has a declared ``StructType``; reads assert the
Parquet footer matches. ``CREATE TABLE IF NOT EXISTS`` (``order.sql:2``)
maps to ``Catalog.create_if_not_exists`` (write ``mode("ignore")``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Driver-provided synthetic tables (TESTDATA.md / FIXTURES.md §B).
TABLES: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# Reference-shaped schemas (SURVEY.md §1.1; FIXTURES.md §A).
ORDERS_S3_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType(), nullable=False),
        T.StructField("description", T.StringType(), nullable=False),
        T.StructField("s3_prefix", T.StringType(), nullable=False),
    ]
)
ORDERS_RDBMS_BLOB_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType(), nullable=False),
        T.StructField("description", T.StringType(), nullable=False),
        T.StructField("order_blob", T.BinaryType(), nullable=False),
    ]
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Catalog:
    """Path-addressed Parquet catalog over one scale-factor directory."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")

    def path(self, name: str) -> str:
        return f"{self.sf_dir}/{name}.parquet"

    def load(self, name: str) -> DataFrame:
        """Read a registered table. Column pruning and predicate pushdown on
        this scan are Catalyst's job — callers just ``select``/``filter``."""
        return self.spark.read.parquet(self.path(name))

    def load_all(self) -> dict[str, DataFrame]:
        return {name: self.load(name) for name in TABLES}

    def register_views(self) -> None:
        """Expose every table as a SQL temp view (the ``spark.sql`` path)."""
        for name in TABLES:
            self.load(name).createOrReplaceTempView(name)

    def create_if_not_exists(self, df: DataFrame, path: str) -> None:
        """`CREATE TABLE IF NOT EXISTS` analog (order.sql:2): write only when
        the target does not already exist — idempotent, like the DDL."""
        df.write.mode("ignore").parquet(path)


def parse_sql_script(text: str) -> list[str]:
    """SQL-script source parser — SURVEY §2 A11 (db_setup.js:71-92): drop
    ``--`` comment lines and blanks, concatenate the rest, split on ``;``.
    Feed each statement to ``spark.sql`` (db_setup.js runs one statement per
    file; we generalize to many)."""
    kept = []
    for line in text.splitlines():
        stripped = line.strip()
        if not stripped or stripped.startswith("--"):
            continue
        kept.append(stripped)
    joined = " ".join(kept)
    return [s.strip() for s in joined.split(";") if s.strip()]


def run_sql_script(spark: SparkSession, text: str) -> list[DataFrame]:
    """Execute every statement of a DDL/DML script (db_setup.js:170-186)."""
    return [spark.sql(stmt) for stmt in parse_sql_script(text)]
