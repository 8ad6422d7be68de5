"""Bounds checks for estimates that have no cross-engine oracle."""

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.analytics import (
    q_approx_distinct,
    q_distinct_counts,
)


def test_approx_distinct_within_tolerance(spark, sf_dir):
    exact = q_distinct_counts(spark, sf_dir).collect()[0].n_customers
    approx = q_approx_distinct(spark, sf_dir).collect()[0].approx_customers
    assert abs(approx - exact) / exact < 0.05
