"""Driver-contract shape tests: every query materializes at sf0.001 with a
stable schema; every oracle key has a query twin. (Value-level checking is
tools/check_correctness.py, run at sf0.01.)"""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == [
        "order_id", "description", "s3_prefix",
        "page_limit", "page_offset", "orders_count", "pages",
    ]


def test_contract_coverage():
    qs, os_ = E.queries(), E.oracle_sql()
    assert len(qs) >= 45
    assert set(os_) <= set(qs)


def test_every_query_runs_at_smoke_sf(spark, sf_dir):
    for name, fn in E.queries().items():
        df = fn(spark, sf_dir)
        n = df.count()
        assert n >= 0, name


def test_sql_script_parser(spark, tmp_path):
    """A10/A11: comment-stripping SQL-script parse + idempotent DDL
    execution (db_setup.js:57-92 semantics)."""
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.catalog import (
        Catalog,
        parse_sql_script,
        run_sql_script,
    )

    script = """
    -- schema for the pointer table (order.sql:2-7)
    CREATE TABLE IF NOT EXISTS orders_ddl (
        order_id    STRING,
        description STRING,
        s3_prefix   STRING
    ) USING parquet;

    -- second statement exercises the multi-statement path
    SHOW TABLES;
    """
    stmts = parse_sql_script(script)
    assert len(stmts) == 2
    assert stmts[0].startswith("CREATE TABLE IF NOT EXISTS orders_ddl")
    assert "--" not in stmts[0]
    run_sql_script(spark, script)
    run_sql_script(spark, script)  # IF NOT EXISTS => idempotent
    assert spark.catalog.tableExists("orders_ddl")
    spark.sql("DROP TABLE orders_ddl")

    # write-mode analog: mode("ignore") second write is a no-op
    cat = Catalog(spark, str(tmp_path))
    df1 = spark.range(5).toDF("order_id")
    cat.create_if_not_exists(df1, f"{tmp_path}/t.parquet")
    cat.create_if_not_exists(spark.range(99).toDF("order_id"), f"{tmp_path}/t.parquet")
    assert spark.read.parquet(f"{tmp_path}/t.parquet").count() == 5
