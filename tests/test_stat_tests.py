"""Unit pins for the stat_tests rank machinery — the session's one real
bug lived exactly here (a descending-monotone bucket expression copied
into an ascending cumulative), so the distributed forms are pinned
against naive single-partition computations on a seeded frame."""

import math
import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.stat_tests import (
    _avg_rank2,
    _two_sample_cum,
)


def _toy_orders(spark, n=500, seed=7):
    rng = random.Random(seed)
    rows = [
        (
            i,
            round(rng.uniform(10, 200), 2),
            "1-URGENT" if rng.random() < 0.5 else "5-LOW",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderpriority string"
    )


def test_avg_rank2_matches_naive_ranks(spark, tmp_path):
    df = _toy_orders(spark)
    got = {
        (r.g, r.r2)
        for r in _avg_rank2(df, "o_totalprice", "r2").collect()
    }
    # naive: midpoint-averaged rank per distinct grain, one partition
    grain = (
        df.select(F.round(F.col("o_totalprice") * 100).cast("bigint").alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(F.lit(0)).orderBy("g").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        (r.g, 2 * r.cum - r.cnt + 1)
        for r in grain.select(
            "g", "cnt", F.sum("cnt").over(w).alias("cum")
        ).collect()
    }
    assert got == want


def test_two_sample_cum_is_a_true_cdf(spark, tmp_path):
    sf = str(tmp_path)
    _toy_orders(spark).write.parquet(f"{sf}/orders.parquet")
    rows = _two_sample_cum(spark, sf).orderBy("g").collect()
    # monotone, inclusive, and ends at the totals
    last_a = last_b = 0
    for r in rows:
        assert r.cum_a == last_a + r.n_a
        assert r.cum_b == last_b + r.n_b
        last_a, last_b = r.cum_a, r.cum_b
    assert last_a == rows[0].tot_a and last_b == rows[0].tot_b


def test_mann_whitney_matches_scipy_free_reference(spark, tmp_path):
    """U and z recomputed straight from collected samples with pure
    Python (rank-sum definition, tie-corrected normal approximation) —
    an implementation-independent reference."""
    sf = str(tmp_path)
    _toy_orders(spark).write.parquet(f"{sf}/orders.parquet")
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.stat_tests import (
        q_mann_whitney_u,
    )

    got = q_mann_whitney_u(spark, sf).collect()[0]
    import duckdb  # only to re-read the parquet without Spark

    vals = duckdb.sql(
        f"SELECT o_orderpriority, round(o_totalprice*100) FROM '{sf}/orders.parquet/*.parquet'"
    ).fetchall()
    a = sorted(v for p, v in vals if p == "1-URGENT")
    b = sorted(v for p, v in vals if p == "5-LOW")
    combined = sorted([(v, "a") for v in a] + [(v, "b") for v in b])
    # midpoint ranks
    ranks, i = {}, 0
    n = len(combined)
    while i < n:
        j = i
        while j < n and combined[j][0] == combined[i][0]:
            j += 1
        ranks[combined[i][0]] = (i + 1 + j) / 2
        i = j
    r_a = sum(ranks[v] for v in a)
    u_a = r_a - len(a) * (len(a) + 1) / 2
    assert got.n_a == len(a) and got.n_b == len(b)
    assert math.isclose(got.u_stat, u_a, abs_tol=1e-9)
    # tie-corrected z
    from collections import Counter

    na, nb = len(a), len(b)
    nn = na + nb
    ties = sum(t**3 - t for t in Counter(v for v, _ in combined).values())
    var = na * nb / 12 * ((nn + 1) - ties / (nn * (nn - 1)))
    z = (u_a - na * nb / 2) / math.sqrt(var)
    assert math.isclose(got.z_score, z, abs_tol=1e-5)
