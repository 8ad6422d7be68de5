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
