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
        assert r.overcount >= 0, r  # CMS can only overcount — hard invariant
        assert r.cms_est == r.exact_n + r.overcount
    # the e/w*N bound is probabilistic (P[exceed] <= e^-d ~ 1.8% per probe),
    # so a regenerated fixture may legitimately push a probe past it;
    # require the bulk inside rather than asserting the tail away
    within = sum(r.overcount <= bound for r in rows)
    assert within >= 8, (within, bound, rows)


def test_importance_sample_ht_estimate_is_unbiased(spark, sf_dir):
    """Horvitz-Thompson: Σ_kept 1/p estimates the true population. The
    per-stratum draws at sf0.001 (~70 short docs, p ~ 0.15) are too noisy
    to bound tightly — resampling the deterministic coin under 8 hash
    salts spans globals of 413..546 around N=500 — so the strata get
    deterministic invariants (1/p >= 1 ⇒ ht >= n_kept; identical rerun)
    and the GLOBAL estimate gets the statistical envelope: ±25% of N,
    which the salt sweep shows noise stays inside while a wrong weight
    (using p, or forgetting 1/p) lands 2-3x out."""
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.corpus_ops import (
        q_importance_sample,
    )

    rows = {r.lang: r for r in q_importance_sample(spark, sf_dir).collect()}
    assert rows
    for lang, r in rows.items():
        # a tiny stratum may legitimately keep zero docs (p ~ 0.15 coins);
        # only the global sample must be non-empty
        assert 0 <= r.n_kept <= r.n_docs, (lang, r)
        assert r.ht_estimate is None or r.ht_estimate >= r.n_kept, (lang, r)
    assert sum(r.n_kept for r in rows.values()) > 0
    # a stratum that kept zero docs has NULL ht_estimate (legitimate, see
    # above) — it contributes nothing to the global estimate
    total_ht = sum(r.ht_estimate or 0 for r in rows.values())
    total_n = sum(r.n_docs for r in rows.values())
    assert abs(total_ht - total_n) / total_n < 0.25, (total_ht, total_n)
    again = {r.lang: r for r in q_importance_sample(spark, sf_dir).collect()}
    assert again == rows


def test_pagerank_concentrates_on_hub_parts(spark, sf_dir):
    """Sanity on the power iteration: scores positive and descending, and
    the top hub beats the uniform 1/N start (mass concentrates on
    high-degree parts instead of staying flat)."""
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.analytics_ext import (
        q_part_pagerank,
    )

    rows = q_part_pagerank(spark, sf_dir).collect()
    assert rows and all(r.pagerank > 0 for r in rows)
    scores = [r.pagerank for r in rows]
    assert scores == sorted(scores, reverse=True)
    li = _t(spark, sf_dir, "lineitem").select("l_partkey").distinct()
    assert scores[0] > 1.0 / li.count()


def test_ri_audit_detects_constructed_orphans(spark, tmp_path, sf_dir):
    """The fixture is referentially clean (all-zero report), so prove the
    audit actually detects: copy the tables, strip a nation and null one
    customer FK, expect exactly those orphans."""
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.quality import (
        q_referential_integrity_audit,
    )

    clean = {r.fk_edge: r.n_orphans for r in
             q_referential_integrity_audit(spark, sf_dir).collect()}
    assert set(clean.values()) == {0}

    sf = str(tmp_path)
    # drop a nation some supplier actually references, so orphans exist
    victim_nk = _t(spark, sf_dir, "supplier").select("s_nationkey").first()[0]
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        df = _t(spark, sf_dir, t)
        if t == "nation":
            df = df.filter(F.col("n_nationkey") != victim_nk)
        if t == "orders":
            df = df.withColumn(
                "o_custkey",
                F.when(F.col("o_orderkey") == 1, F.lit(None)).otherwise(F.col("o_custkey")),
            )  # a NULL FK is an orphan too
        df.write.parquet(f"{sf}/{t}.parquet")
    broken = {r.fk_edge: r.n_orphans for r in
              q_referential_integrity_audit(spark, sf).collect()}
    assert broken["supplier.s_nationkey->nation"] > 0
    assert broken["orders.o_custkey->customer"] == 1
    assert broken["lineitem.l_orderkey->orders"] == 0


def test_distribution_percentiles_equal_buffering_exact(spark, sf_dir):
    """The count-distribution quartiles (domain-bounded memory, the
    100 TB exact path) must equal Spark's buffering ``percentile`` —
    same groups, same p25/p50/p75 to the 4-decimal output grain, same
    counts — on the real fixture distribution."""
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.analytics_ext import (
        q_grouped_percentiles,
        q_grouped_percentiles_distribution,
    )

    exact = {
        r.l_returnflag: (r.p25, r.p50, r.p75, r.n)
        for r in q_grouped_percentiles(spark, sf_dir).collect()
    }
    dist = {
        r.l_returnflag: (r.p25, r.p50, r.p75, r.n)
        for r in q_grouped_percentiles_distribution(spark, sf_dir).collect()
    }
    assert dist == exact


def test_curriculum_order_is_annealed_permutation(spark, sf_dir):
    """curriculum_rank must be a permutation of 1..n, buckets must be
    contiguous rank blocks in ascending difficulty, and the distributed
    (bucket, coin-shard) rank composition must equal the naive global
    order — i.e. ranks within a bucket follow the coin order."""
    from pyspark.sql import functions as F

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.corpus_ops import (
        q_curriculum_order,
    )

    rows = q_curriculum_order(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    assert sorted(r.curriculum_rank for r in rows) == list(range(1, n + 1))
    # every rank in bucket b is below every rank in bucket b+1
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r.curriculum_rank)
    buckets = sorted(by_bucket)
    for lo, hi in zip(buckets, buckets[1:]):
        assert max(by_bucket[lo]) < min(by_bucket[hi])
    # quartile cuts: no bucket dominates (fixture scores are spread)
    assert len(buckets) == 4
    assert max(len(v) for v in by_bucket.values()) < 0.6 * n
