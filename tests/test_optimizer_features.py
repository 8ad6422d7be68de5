"""Optimizer scale features proven at the plan level: dynamic partition
pruning (DPP) and runtime bloom-filter joins — the two runtime-filtering
mechanisms that, at 100 TB, decide whether a selective dim join scans the
whole fact table or a sliver of it. Both are plan-shape demonstrations:
the engine's layout (Hive partitioning) and session defaults make them
available; these tests pin that they actually fire."""

import io
from contextlib import contextmanager, redirect_stdout

from pyspark.sql import functions as F


def _formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@contextmanager
def _confs(spark, **kv):
    prev = {k: spark.conf.get(k, None) for k in kv}
    for k, v in kv.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning_fires_on_partitioned_fact(spark, sf_dir, tmp_path):
    """A Hive-partitioned fact joined to a filtered dim on the partition
    columns must plan dynamicpruning partition filters: the fact's file
    listing is cut to the dim's surviving partitions at RUNTIME — at
    100 TB this is the difference between scanning 84 months and 2."""
    path = str(tmp_path / "dpp_orders")
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("yr", F.year("o_orderdate"))
        .withColumn("mo", F.month("o_orderdate"))
        .write.partitionBy("yr", "mo")
        .parquet(path)
    )
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(y, m, "peak" if m in (11, 12) else "off")
         for y in range(1992, 1999) for m in range(1, 13)],
        "yr int, mo int, season string",
    )
    j = fact.join(dim.filter(F.col("season") == "peak"), ["yr", "mo"]).groupBy(
        "yr"
    ).agg(F.count("*").alias("n"))
    plan = _formatted(j)
    assert "dynamicpruning" in plan.lower(), plan
    # and the result is right: only Nov/Dec orders counted
    total = sum(r.n for r in j.collect())
    want = fact.filter(
        F.col("mo").isin(11, 12) & F.col("yr").between(1992, 1998)
    ).count()
    assert total == want


def test_runtime_bloom_filter_injected_for_selective_join(spark, sf_dir):
    """With broadcast off (the 100 TB shuffle-join regime), a selective
    build side must inject a bloom filter onto the probe side's scan
    (might_contain pre-filter) so most fact rows drop before the shuffle.
    applicationSideScanSizeThreshold=0 is test-only — production keeps
    the 10GB default since the mechanism only pays off on huge probes."""
    with _confs(
        spark,
        **{
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    ):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        sel = orders.filter(F.col("o_totalprice") > 400000).select("o_orderkey")
        q = li.join(sel, li.l_orderkey == sel.o_orderkey).groupBy().count()
        plan = _formatted(q)
        assert "might_contain" in plan, plan


def test_observe_count_is_pushdown_barrier(spark):
    """_kmeans_fit derives k from a corpus count OBSERVED on the same job
    that collects the seed rows (one scan instead of two). That is only
    correct if the seed filter cannot be pushed below the CollectMetrics
    node — the observed count must be the PRE-filter corpus count. Pin
    it on a corpus larger than the seed cap, where a pushed-down filter
    would silently shrink the count (and hence the derived k)."""
    from pyspark.sql import Observation

    n = 6000  # > KMEANS_K_CAP = 4096
    df = spark.range(n).select(F.col("id").alias("vec_id"))
    obs = Observation()
    seed = (
        df.observe(obs, F.count(F.lit(1)).alias("n"))
        .filter(F.col("vec_id") < 4096)
        .collect()
    )
    assert len(seed) == 4096
    assert int(obs.get["n"]) == n  # pre-filter count: the barrier held


def test_cross_label_pushdown_matches_post_scoring_filter(spark, sf_dir):
    """hard_negative_mining's r12 pushdown: _knn_scored_pairs(cross_label=...)
    must return exactly the rows of the old shape — score every candidate
    pair, mirror, THEN join labels and keep label_a != label_b. The
    predicate is symmetric in the pair, so pushing it below the embedding
    joins / cosine fold cannot change the surviving (pair, score) set."""
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans import (
        similarity as S,
    )

    emb = S._emb(spark, sf_dir)
    labels = emb.select("vec_id", "label")

    pushed = S._knn_scored_pairs(emb, cross_label=labels)
    la = labels.select(F.col("vec_id").alias("vec_a"), F.col("label").alias("label_a"))
    lb = labels.select(F.col("vec_id").alias("vec_b"), F.col("label").alias("label_b"))
    posthoc = (
        S._knn_scored_pairs(emb)
        .join(la, "vec_a")
        .join(lb, "vec_b")
        .filter(F.col("label_a") != F.col("label_b"))
    )

    cols = ["vec_a", "vec_b", "label_a", "label_b", "score"]
    got = sorted(map(tuple, pushed.select(*cols).collect()))
    want = sorted(map(tuple, posthoc.select(*cols).collect()))
    assert got == want and len(got) > 0
