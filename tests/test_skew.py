"""Salted-join equivalence: result identical to the plain join on skewed
data (one key holds half the rows), for inner and left joins including
unmatched probe keys."""

from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.skew import salted_join


def _skewed(spark):
    # key 0 owns 5000 rows; keys 1..99 own ~50 each; key 999 has no dim row
    probe = spark.range(10000).select(
        F.when(F.col("id") < 5000, 0)
        .when(F.col("id") >= 9990, 999)
        .otherwise((F.col("id") % 99) + 1)
        .alias("k"),
        F.col("id").alias("v"),
    )
    build = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    return probe, build


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_matches_plain(spark):
    probe, build = _skewed(spark)
    assert _canon(salted_join(probe, build, "k", n_salts=8)) == _canon(
        probe.join(build, "k")
    )


def test_salted_left_keeps_unmatched(spark):
    probe, build = _skewed(spark)
    got = _canon(salted_join(probe, build, "k", n_salts=8, how="left"))
    want = _canon(probe.join(build, "k", "left"))
    assert got == want
    assert any(r[2] is None for r in got)  # key 999 survived unmatched
