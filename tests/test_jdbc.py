"""Real JDBC round-trip through embedded Derby (the driver ships with
Spark), standing in for the reference's Aurora-MySQL-via-RDS-Proxy
connector (order.js:521-588). Proves:

- DataFrameWriter.jdbc creates + loads an RDBMS table,
- JdbcSource reads it back (partitioned range scan),
- predicate pushdown reaches the DB (plan shows the filter in the scan),
- the north-star pipeline runs end-to-end from a real RDBMS: legacy
  blob-in-row table --JDBC--> externalize to object store + pointer table
  (BASELINE.json: "Spark JDBC source to S3 write").

Derby quirk: Spark's JDBC writer emits the table name unquoted (Derby
folds it to upper case) but quotes column names (case preserved), so
reads use the bare table name and quoted partition columns.
"""

import pytest
from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.sources.jdbc import JdbcSource

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def derby(spark, sf_dir, tmp_path_factory):
    """Embedded Derby DB pre-loaded with the orders fixture over JDBC."""
    url = f"jdbc:derby:{tmp_path_factory.mktemp('derby')}/testdb;create=true"
    spark.read.parquet(f"{sf_dir}/orders.parquet").write.format("jdbc").options(
        url=url,
        dbtable="orders_rt",
        driver=DERBY_DRIVER,
        # generic dialect maps StringType -> CLOB, which Derby can't compare;
        # force VARCHAR so pushed-down predicates execute
        createTableColumnTypes="o_orderstatus VARCHAR(5), o_orderpriority VARCHAR(20)",
    ).mode("overwrite").save()
    return url


def _source(url: str, table: str, **kw) -> JdbcSource:
    return JdbcSource(url=url, table=table, driver=DERBY_DRIVER, **kw)


def test_jdbc_roundtrip_partitioned(spark, sf_dir, derby):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    src = _source(derby, "orders_rt", partition_column='"o_orderkey"', num_partitions=4)
    lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
    back = src.load(spark, lo, hi)
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == orders.count()
    want = {r.o_orderkey: r.o_totalprice for r in orders.collect()}
    got = {r.o_orderkey: r.o_totalprice for r in back.collect()}
    assert got == want


def test_jdbc_predicate_pushdown(spark, sf_dir, derby):
    src = _source(derby, "orders_rt")
    df = src.load(spark).filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderstatus" in plan.split("PushedFilters", 1)[1][:200]
    want = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderstatus") == "F")
        .count()
    )
    assert df.count() == want


def test_jdbc_blob_externalization_end_to_end(spark, derby, tmp_path):
    """The reference's whole migration, from a real RDBMS: blobs live
    in-row (LONGBLOB analog: Derby BLOB), Spark reads them over JDBC,
    externalizes to the object store, emits the pointer table, and the
    reconciliation report is clean."""
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.blob_pipeline import (
        externalize_blobs,
        pointer_table,
        validate_migration,
    )

    legacy = spark.createDataFrame(
        [(f"id-{i:03d}", f"desc {i}", bytes([i % 251] * (100 + i))) for i in range(40)],
        "order_id string, description string, order_blob binary",
    )
    legacy.write.format("jdbc").options(
        url=derby, dbtable="orders_rdbms_blob", driver=DERBY_DRIVER
    ).mode("overwrite").save()

    store_url = f"file://{tmp_path}/objstore"
    over_jdbc = _source(derby, "orders_rdbms_blob").load(spark)
    manifest = externalize_blobs(over_jdbc, store_url)
    report = validate_migration(over_jdbc, manifest, store_url)
    assert report["n_rows"] == 40
    assert report["size_mismatches"] == 0
    assert report["md5_mismatches"] == 0
    assert report["missing_writes"] == 0
    assert report["missing_objects"] == 0

    ptr = pointer_table(over_jdbc)
    assert ptr.columns == ["order_id", "description", "s3_prefix"]
    assert ptr.count() == 40


# --- MySQL dialect parity (no MySQL reachable: test the dialect layer) -------
# The reference's production source is Aurora MySQL through RDS Proxy
# (order.js:521-563), with backtick-quoted identifiers (order.js:596,621)
# and LONGBLOB blob columns (sql_schema). Spark ships MySQLDialect; these
# tests pin the dialect behaviors the migration depends on, so a future
# MySQL jar/container drop-in changes nothing but the URL.


def test_mysql_dialect_resolves_and_backtick_quotes(spark):
    jvm = spark._jvm
    d = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:mysql://proxy:3306/main")
    assert "MySQLDialect" in d.toString()
    # order.js:596: `UPDATE main.orders SET `description` = ...` — backticks,
    # never the ANSI double quotes the default/Derby dialect emits
    assert d.quoteIdentifier("o_orderkey") == "`o_orderkey`"
    derby = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:derby:memory:x")
    assert derby.quoteIdentifier("o_orderkey") == '"o_orderkey"'


def test_mysql_dialect_blob_type_mapping(spark):
    """Write direction: BinaryType -> BLOB (java.sql.Types.BLOB = 2004).
    Read direction: MySQLDialect defers LONGBLOB (LONGVARBINARY) to
    Spark's default JDBC mapping — BinaryType — which the embedded-Derby
    e2e (test_jdbc_blob_externalization_end_to_end) proves behaviorally:
    a JDBC BLOB column round-trips as BinaryType bytes."""
    jvm = spark._jvm
    types = jvm.org.apache.spark.sql.types.DataTypes
    d = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:mysql://proxy:3306/main")
    jt = d.getJDBCType(types.BinaryType)
    assert jt.isDefined()
    assert jt.get().databaseTypeDefinition() == "BLOB"
    assert jt.get().jdbcNullType() == jvm.java.sql.Types.BLOB
    # read direction: None = defer to the default LONGVARBINARY mapping
    mb = jvm.org.apache.spark.sql.types.MetadataBuilder()
    ct = d.getCatalystType(jvm.java.sql.Types.LONGVARBINARY, "LONGBLOB", 2147483647, mb)
    assert not ct.isDefined()


def test_jdbc_source_mysql_defaults_and_longblob_ddl():
    """JdbcSource defaults to the MySQL driver class the reference loads,
    and the LONGBLOB DDL override (10 MB blobs exceed BLOB's 64 KB cap in
    MySQL, sql_schema's LONGBLOB) rides through ``extra`` into the
    writer/reader options verbatim."""
    src = JdbcSource(
        url="jdbc:mysql://proxy:3306/main",
        table="orders",
        partition_column="order_id",
        num_partitions=8,
        extra={"createTableColumnTypes": "order_blob LONGBLOB"},
    )
    opts = src.options(lower_bound=0, upper_bound=1000)
    assert opts["driver"] == "com.mysql.cj.jdbc.Driver"
    assert opts["createTableColumnTypes"] == "order_blob LONGBLOB"
    assert opts["partitionColumn"] == "order_id"
    assert opts["numPartitions"] == "8"
    assert opts["pushDownAggregate"] == "true"
