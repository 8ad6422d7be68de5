"""Bounds checks for sketch estimates (the raw HLL++ value is engine-
specific, so the oracle checks a deterministic error-bound boolean; this
test additionally bounds the raw estimate itself)."""

from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.analytics import (
    _t,
    q_approx_distinct,
    q_distinct_counts,
)


def test_approx_distinct_within_tolerance(spark, sf_dir):
    exact = q_distinct_counts(spark, sf_dir).collect()[0].n_customers
    approx = (
        _t(spark, sf_dir, "orders")
        .agg(F.approx_count_distinct("o_custkey", rsd=0.01).alias("a"))
        .collect()[0]
        .a
    )
    assert abs(approx - exact) / exact < 0.05


def test_approx_distinct_contract_row(spark, sf_dir):
    row = q_approx_distinct(spark, sf_dir).collect()[0]
    assert row.estimate_within_5pct is True
    assert row.n_customers_exact > 0 and row.n_orders >= row.n_customers_exact


def test_cms_never_undercounts_and_is_tight_on_heavy_hitters(spark, sf_dir):
    """The count-min guarantee: est >= exact always; and with d=4, w=512
    over ~1e4 events the top-10 heavy hitters should estimate within the
    standard e/w * N bound."""
    import math

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.analytics import (
        CMS_WIDTH,
        q_cms_frequency,
    )

    rows = q_cms_frequency(spark, sf_dir).collect()
    assert len(rows) == 10
    n_total = _t(spark, sf_dir, "events").count()
    bound = math.e / CMS_WIDTH * n_total
    for r in rows:
        assert r.overcount >= 0, r  # CMS can only overcount
        assert r.cms_est == r.exact_n + r.overcount
        assert r.overcount <= bound, (r, bound)
