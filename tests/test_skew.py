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


def test_aqe_skew_join_splits_hot_partition(spark):
    """The AQE twin of salted_join: with skew-join enabled (session
    default) and test-scaled thresholds, Spark splits the hot key's
    oversized shuffle partition at runtime — no manual salting — and the
    final adaptive plan carries the proof (SortMergeJoin(skew=true),
    AQEShuffleRead ... skewed). Results stay identical to the plain join.

    When is manual handling still needed?
    - JOIN skew: AQE handles it (this test) — prefer AQE over salted_join
      whenever the join is a plain shuffled equi-join.
    - AGGREGATION skew: AQE's OptimizeSkewedJoin only splits join
      partitions; a groupBy on the hot key still lands on one reducer.
      That is what the salted two-phase aggregation is for
      (plans/analytics.q_salted_hot_key_agg).
    - Skew into a join whose output partitioning feeds a same-key
      downstream op: AQE skips the split to avoid an extra shuffle
      (unless forceOptimizeSkewedJoin) — salted_join still applies.
    """
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        pad = F.lpad(F.lit("x"), 64, "x")  # inflate row bytes past threshold
        probe = spark.range(200_000).select(
            F.when(F.col("id") < 150_000, 0)
            .otherwise(F.col("id") % 99 + 1)
            .alias("k"),
            F.col("id").alias("v"),
            pad.alias("pad"),
        )
        build = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        # global agg in the SAME DataFrame: no required output
        # distribution (so AQE may split), and collect() executes this
        # exact QueryExecution — the one whose final plan we inspect
        result = probe.join(build, "k").agg(
            F.count("*").alias("n"), F.sum("v").alias("sv")
        )
        row = result.collect()[0]
        assert row.n == 200_000  # every probe row matched exactly once
        assert row.sv == sum(range(200_000))
        plan = result._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert "skewed" in plan  # AQEShuffleRead ... skewed
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
