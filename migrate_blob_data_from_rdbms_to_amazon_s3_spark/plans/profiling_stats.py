"""Statistical profiling operators: weighted medians, equi-depth
histograms, correlation / completeness audits, and a chi-square
independence test (SURVEY §7 M2/M4 — the column-statistics pass a
catalog or feature store runs over every ingested table).

Scale notes (100 TB):
- ``weighted_median_price`` computes exact weighted quantiles via the
  COUNT-DISTRIBUTION method (``functions/quantiles``) — no per-group
  buffering at all; the DuckDB oracle expands rows (generate_series per
  unit of weight) precisely because that naive shape is what the
  operator avoids.
- ``histogram_equidepth`` derives its cut-points from the distribution
  method (broadcast as an array scalar) and buckets with a pure
  `aggregate()` fold over that array — no rank/ntile, so no
  single-partition global sort (the customer_rfm_segments discipline).
- ``numeric_corr_audit`` / ``completeness_audit`` are single partial+
  final aggregations: every statistic (corr pairs, null counts, distinct
  counts) shares one scan.
- ``chisq_independence`` contracts to the contingency grain first
  (|types|×|weekdays| cells), so margins and the statistic are joins over
  a constant-size table regardless of raw volume.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.quantiles import distribution_quantiles, distribution_quantiles_duck
from ..sources.tables import load_table as _t

EQUIDEPTH_BUCKETS = 8


def q_weighted_median_price(spark, sf_dir):
    """Quantity-weighted median (and quartiles) of the lineitem extended
    price per return flag: each row counts l_quantity times. The oracle
    materializes the weight by row expansion — the exact anti-pattern
    this operator exists to avoid at scale.

    Round-7 plan: the weighted COUNT-DISTRIBUTION method
    (functions/quantiles.distribution_quantiles — cumulative WEIGHT over
    the cents-exact value distribution straddles rank (N-1)p, N = total
    weight). The previous plan used Spark's percentile(col, ps, freq),
    which buffers every (value, weight) of a group in one aggregation
    buffer — exact but O(group) memory, and the suite's worst measured
    scaling step (4.35x per 10x data; the distribution plan steps
    ~1.6x). Identical output: frequency-weighted percentile over the
    expanded sequence IS quantile_cont with cumulative weights."""
    from ..functions.quantiles import distribution_quantiles

    li = _t(spark, sf_dir, "lineitem")
    qs = distribution_quantiles(
        li,
        "l_returnflag",
        "l_extendedprice",
        (0.25, 0.50, 0.75),
        weight_col="l_quantity",
        # wide_domain default (distributed prefix sum): the part catalog
        # grows linearly with SF, so distinct extended-price grains
        # (~|parts| x 50) are corpus-sized, not config-bounded — the
        # per-group window of the cheap path would single-task billions
        # of grains at 100 TB (r7 ADVICE)
    )
    return qs.select(
        "l_returnflag",
        "n_rows",
        "total_weight",
        F.round("q0", 4).alias("wq1"),
        F.round("q1", 4).alias("wmedian"),
        F.round("q2", 4).alias("wq3"),
    ).orderBy("l_returnflag")


def q_histogram_equidepth(spark, sf_dir):
    """Equi-depth histogram of order totals: EQUIDEPTH_BUCKETS buckets
    holding ~equal row counts, bounded by exact percentile cut-points.
    The cut array is one aggregate broadcast to the scan; bucket id is a
    fold over the array (count of cuts strictly below x) — never a global
    rank. The histogram a cost-based optimizer actually wants (equi-width
    twin: histogram_equiwidth).

    Round 7: the cut-points come from the exact COUNT-DISTRIBUTION
    method (functions/quantiles) — the previous GLOBAL ``percentile``
    buffered the ENTIRE table in one aggregation buffer, the worst
    possible shape at 100 TB. Cuts are compared in integer-GRAIN space
    (round(x*100) vs grain cuts): a cut that lands on a data value is
    an exact integer double and an interpolated cut sits strictly
    between integers, so tie behavior is exact in both engines."""
    o = _t(spark, sf_dir, "orders").select(F.col("o_totalprice").alias("x"))
    ps = tuple(i / EQUIDEPTH_BUCKETS for i in range(1, EQUIDEPTH_BUCKETS))
    cuts = distribution_quantiles(o, None, "x", ps, grain_space=True).select(
        F.array(*[F.col(f"q{i}") for i in range(len(ps))]).alias("cuts")
    )
    return (
        o.crossJoin(F.broadcast(cuts))
        .select(
            F.expr(
                "aggregate(cuts, 0, (acc, c) -> "
                "acc + IF(CAST(round(x * 100) AS DOUBLE) > c, 1, 0))"
            ).alias("bucket"),
            "x",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("x"), 2).alias("lo"),
            F.round(F.max("x"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


def q_numeric_corr_audit(spark, sf_dir):
    """Pairwise Pearson correlations between the lineitem numeric columns
    (price, quantity, discount, tax) in ONE aggregation — the
    feature-redundancy screen before model training. All six pairs share
    a single scan's partial moments."""
    li = _t(spark, sf_dir, "lineitem")
    pairs = [
        ("l_extendedprice", "l_quantity"),
        ("l_extendedprice", "l_discount"),
        ("l_extendedprice", "l_tax"),
        ("l_quantity", "l_discount"),
        ("l_quantity", "l_tax"),
        ("l_discount", "l_tax"),
    ]
    return li.agg(
        F.count("*").alias("n"),
        *[
            F.round(F.corr(a, b), 6).alias(f"corr_{a[2:]}_{b[2:]}")
            for a, b in pairs
        ],
    )


def q_completeness_audit(spark, sf_dir):
    """Column-completeness profile of orders: per column, the null count
    and distinct cardinality, plus blank-string counts for text columns —
    the ingest gate that catches a broken upstream export. One shared
    scan; distincts are exact (the approx twin at 100 TB is
    approx_count_distinct, cf. approx_distinct)."""
    o = _t(spark, sf_dir, "orders")

    def nulls(c):
        return F.sum(F.col(c).isNull().cast("int")).alias(f"nulls_{c[2:]}")

    return o.agg(
        F.count("*").alias("n_rows"),
        nulls("o_custkey"),
        nulls("o_orderdate"),
        nulls("o_totalprice"),
        nulls("o_orderstatus"),
        F.sum((F.trim(F.col("o_orderstatus")) == "").cast("int")).alias("blank_status"),
        F.countDistinct("o_orderstatus").alias("distinct_status"),
        F.countDistinct("o_orderpriority").alias("distinct_priority"),
        F.countDistinct("o_custkey").alias("distinct_custkey"),
    )


def q_chisq_independence(spark, sf_dir):
    """Chi-square independence test between event type and day-of-week:
    are clicks/purchases uniform across the week? Contracts to the
    contingency grain first (≤ |types|·7 cells), then margins and the
    Σ(O−E)²/E statistic are constant-size joins — raw event volume only
    touches the first aggregation. Output: chi2, degrees of freedom,
    cells."""
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count("*").alias("o"))
    row_m = cells.groupBy("event_type").agg(F.sum("o").alias("rt"))
    col_m = cells.groupBy("dow").agg(F.sum("o").alias("ct"))
    tot = cells.agg(F.sum("o").alias("n"))
    e = F.col("rt") * F.col("ct") / F.col("n")
    joined = (
        cells.join(F.broadcast(row_m), "event_type")
        .join(F.broadcast(col_m), "dow")
        .crossJoin(F.broadcast(tot))
    )
    return joined.agg(
        F.round(F.sum(F.pow(F.col("o") - e, 2) / e), 4).alias("chi2"),
        ((F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1)).alias("dof"),
        F.count("*").alias("n_cells"),
    )


RANK_BUCKETS = 16
# top-k bound of q_distributed_global_rank: the offsets prune (offset <
# GLOBAL_RANK_TOP_K), the post-window rank filter (rk <= GLOBAL_RANK_TOP_K)
# and the final limit are only correct RELATIVE TO EACH OTHER — one
# constant so an edit can never silently decouple them (ADVICE r12).
GLOBAL_RANK_TOP_K = 500


def q_distributed_global_rank(spark, sf_dir):
    """Global row-number over ALL orders by (totalprice DESC, orderkey)
    WITHOUT a single-partition window — the distributed-ranking pattern
    (sample-sort / TeraSort shape): exact percentile cut-points split the
    key space into RANK_BUCKETS monotone buckets (equal values never
    straddle a boundary because bucketing counts cuts STRICTLY above x);
    per-bucket counts prefix-sum into offsets over a B-row broadcast;
    rank = bucket offset + intra-bucket row_number (window PARTITIONED BY
    bucket). The naive ROW_NUMBER() OVER (ORDER BY ...) — one partition
    holding the entire table — is the oracle only. Output: the global
    top-500 slice (rank, key, price).

    Round 8: the cut-points come from the COUNT-DISTRIBUTION method in
    GRAIN space — the previous GLOBAL ``percentile`` buffered the
    ENTIRE table in one aggregation buffer (the exact shape the r7
    percentile conversions removed elsewhere). Bucketing compares
    round(price*100) grains against grain cuts: order-isomorphic to the
    value-space comparison (grains are monotone in price; equal prices
    share a grain, so ties still never straddle a boundary), hence the
    final ranks — and the naive oracle — are unchanged."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ps = tuple(i / RANK_BUCKETS for i in range(1, RANK_BUCKETS))
    # r12 (guide §2.3/§2.4, the _two_sample_cum discipline): ONE grain
    # contraction feeds both the cuts and the per-bucket counts, so raw
    # orders is scanned twice (contraction + the rank-window rows), not
    # three times. r13 (guide §1.2/§2.4 — one materialization per query,
    # not per stage): that contraction IS the quantile machinery's own
    # grain table now (return_grain), so the caller-side checkpoint —
    # a second eager-planning barrier plus a duplicate groupBy exchange
    # over the same rows — is gone. Cut values are identical: the helper
    # contracts the same raw rows to the same cent grains
    # (round((g/100.0)*100) == g exactly for cent grains). Bucket counts
    # are identical: rows in a grain share a bucket, so summing grain
    # weights per bucket == counting rows per bucket.
    cuts_df, tagged = distribution_quantiles(
        o.select(F.col("o_totalprice").alias("v")),
        None,
        "v",
        ps,
        grain_space=True,
        return_grain=True,
    )
    cuts = cuts_df.select(
        F.array(*[F.col(f"q{i}") for i in range(len(ps))]).alias("cuts")
    )
    grain = tagged.select(F.col("__c").alias("g"), F.col("__wsum").alias("w"))
    bucketed = o.crossJoin(F.broadcast(cuts)).select(
        "o_orderkey",
        "o_totalprice",
        F.expr(
            "aggregate(cuts, 0, (acc, c) -> "
            "acc + IF(CAST(round(o_totalprice * 100) AS DOUBLE) < c, 1, 0))"
        ).alias("b"),
    )
    counts = grain.crossJoin(F.broadcast(cuts)).select(
        "w",
        F.expr(
            "aggregate(cuts, 0, (acc, c) -> "
            "acc + IF(CAST(g AS DOUBLE) < c, 1, 0))"
        ).alias("b"),
    ).groupBy("b").agg(F.sum("w").alias("n"))
    prev = counts.select(F.col("b").alias("pb"), F.col("n").alias("pn"))
    offsets = (
        counts.join(F.broadcast(prev), F.col("pb") < F.col("b"), "left")
        .groupBy("b")
        .agg(F.coalesce(F.sum("pn"), F.lit(0)).alias("offset"))
        # r12 (guide §2.3 — shuffle fewer bytes): only buckets whose
        # offset is < 500 can reach the top-500 slice (every row's rank
        # = offset + row_number >= offset + 1), so the inner offsets
        # join below drops ~(B-1)/B of the table BEFORE the rank
        # window's exchange. Provably result-identical: each dropped
        # row's rank exceeds 500 and the final limit discards it.
        .filter(F.col("offset") < GLOBAL_RANK_TOP_K)
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("b").orderBy(F.desc("o_totalprice"), "o_orderkey")
    ranked = (
        bucketed.join(F.broadcast(offsets), "b")
        .withColumn("rk", F.col("offset") + F.row_number().over(w))
        # r12 (guide §1.2): drop rank > 500 rows right at the window's
        # output instead of carrying them into the final TakeOrdered —
        # the limit discards them anyway (ranks are a permutation of
        # 1..N, so exactly min(N, 500) rows survive either way), but the
        # filter keeps the per-partition top-k heaps from ever seeing
        # the ~(bucket - 500) deeper rows of the surviving buckets.
        .filter(F.col("rk") <= GLOBAL_RANK_TOP_K)
        .select(
            F.col("rk").cast("bigint").alias("global_rank"),
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )
    return ranked.orderBy("global_rank").limit(GLOBAL_RANK_TOP_K)


def q_join_cardinality_estimate(spark, sf_dir):
    """Join-size pre-flight: the exact output cardinality of
    orders⋈lineitem on the order key, computed from the two key-count
    tables (Σ c_o(k)·c_l(k)) WITHOUT running the join — the estimate a
    planner wants before committing shuffle resources, here exact because
    the full histograms are cheap at the key grain. The actual join count
    is computed too, and the match column proves the identity."""
    o = _t(spark, sf_dir, "orders").groupBy(
        F.col("o_orderkey").alias("k")
    ).agg(F.count("*").alias("c_o"))
    li = _t(spark, sf_dir, "lineitem").groupBy(
        F.col("l_orderkey").alias("k")
    ).agg(F.count("*").alias("c_l"))
    predicted = o.join(li, "k").agg(
        F.sum(F.col("c_o") * F.col("c_l")).alias("predicted"),
        F.count("*").alias("n_join_keys"),
    )
    actual = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .agg(F.count("*").alias("actual"))
    )
    return predicted.crossJoin(F.broadcast(actual)).select(
        "n_join_keys",
        "predicted",
        "actual",
        (F.col("predicted") == F.col("actual")).alias("match"),
    )


WINSOR_LO, WINSOR_HI = 0.01, 0.99


def q_winsorized_stats(spark, sf_dir):
    """Winsorized preprocessing audit: order totals clipped at the exact
    p1/p99 cut-points (one percentile aggregate broadcast back — no
    global sort), with raw-vs-winsorized mean/stddev side by side and the
    clip counts — the robust-feature preparation step, and the audit of
    how much tail mass it moved.

    Round 7: the p1/p99 cuts come from the exact COUNT-DISTRIBUTION
    method (functions/quantiles) — the previous GLOBAL ``percentile``
    buffered the entire table in one aggregation buffer. Both engines
    derive bit-identical cut doubles from the same builder arithmetic,
    so the clip comparisons can never disagree."""
    o = _t(spark, sf_dir, "orders").select(F.col("o_totalprice").alias("x"))
    cuts = distribution_quantiles(o, None, "x", (WINSOR_LO, WINSOR_HI)).select(
        F.col("q0").alias("lo"), F.col("q1").alias("hi")
    )
    w = F.least(F.greatest(F.col("x"), F.col("lo")), F.col("hi"))
    return o.crossJoin(F.broadcast(cuts)).agg(
        F.count("*").alias("n"),
        F.round(F.first("lo"), 4).alias("p01"),
        F.round(F.first("hi"), 4).alias("p99"),
        F.sum((F.col("x") < F.col("lo")).cast("int")).alias("n_clipped_low"),
        F.sum((F.col("x") > F.col("hi")).cast("int")).alias("n_clipped_high"),
        F.round(F.avg("x"), 4).alias("raw_mean"),
        F.round(F.avg(w), 4).alias("winsor_mean"),
        F.round(F.stddev_samp("x"), 4).alias("raw_std"),
        F.round(F.stddev_samp(w), 4).alias("winsor_std"),
    )


QQ_YEAR_P, QQ_YEAR_Q = 1996, 1997
BOOT_REPLICATES = 16
# Poisson(1) inverse-CDF ladder (cumulative pmf), enough mass through k=6
_POIS_CDF = [0.367879, 0.735759, 0.919699, 0.981012, 0.996340, 0.999406, 0.999917]


def q_price_qq_drift(spark, sf_dir):
    """Quantile-quantile drift table: the order-total deciles of 1996 vs
    1997 side by side with their gaps — the location-aware complement to
    price_psi_drift's single number (PSI says THAT the distribution
    moved; the Q-Q table says WHERE). Two grouped exact decile arrays
    from the COUNT-DISTRIBUTION method (functions/quantiles; round 7 —
    the previous per-year ``percentile`` buffered each year's totals in
    one aggregation buffer), exploded to the 9-row decile grid — no
    global sort, constant output."""
    o = _t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"), F.col("o_totalprice").alias("x")
    ).filter(F.col("yr").isin(QQ_YEAR_P, QQ_YEAR_Q))
    ps = tuple(i / 10 for i in range(1, 10))
    per_yr = distribution_quantiles(o, "yr", "x", ps)
    grid = per_yr.select(
        "yr",
        F.posexplode(
            F.array(*[F.col(f"q{i}") for i in range(len(ps))])
        ).alias("i", "q"),
    ).select("yr", ((F.col("i") + 1) * 10).alias("pctl"), "q")
    p_side = grid.filter(F.col("yr") == QQ_YEAR_P).select(
        "pctl", F.col("q").alias("q_p")
    )
    q_side = grid.filter(F.col("yr") == QQ_YEAR_Q).select(
        "pctl", F.col("q").alias("q_q")
    )
    return (
        p_side.join(q_side, "pctl")
        .select(
            "pctl",
            F.round("q_p", 4).alias(f"q{QQ_YEAR_P}"),
            F.round("q_q", 4).alias(f"q{QQ_YEAR_Q}"),
            F.round(F.col("q_q") - F.col("q_p"), 4).alias("shift"),
        )
        .orderBy("pctl")
    )


def q_bootstrap_mean_se(spark, sf_dir):
    """Poisson bootstrap standard error of the mean order total — THE
    resampling method that scales: instead of materializing B resamples,
    each row draws a deterministic Poisson(1) weight per replicate (md5
    coin → inverse-CDF ladder), so one pass computes all B replicate
    means (weighted, map-side partial aggregation; the shuffle carries B
    partial rows per partition, not B× the data). Reports the bootstrap
    SE next to the analytic se = s/√n — the agreement check that
    validates the coin. Kleiner et al.'s BLB / Chamandy et al.'s Poisson
    bootstrap lineage, Spark-shaped."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", F.col("o_totalprice").alias("x"))
    ladder = "CASE " + " ".join(
        f"WHEN u < {c} THEN {k}" for k, c in enumerate(_POIS_CDF)
    ) + " ELSE 7 END"
    rep = (
        o.select(
            "o_orderkey",
            "x",
            F.explode(F.expr(f"sequence(0, {BOOT_REPLICATES - 1})")).alias("b"),
        )
        .withColumn(
            "u",
            F.expr(
                "(CAST(conv(substring(md5(concat(CAST(o_orderkey AS STRING), '#', "
                "CAST(b AS STRING))), 1, 15), 16, 10) AS BIGINT) + 1) / "
                f"{float(1 << 60)}"
            ),
        )
        .withColumn("w", F.expr(ladder))
        .groupBy("b")
        .agg(F.try_divide(F.sum(F.col("x") * F.col("w")), F.sum("w")).alias("rep_mean"))
    )
    base = o.agg(
        F.count("*").alias("n"),
        F.avg("x").alias("mean_x"),
        (F.stddev_samp("x") / F.sqrt(F.count("*"))).alias("analytic_se"),
    )
    return rep.agg(
        F.count("*").alias("n_replicates"),
        F.round(F.avg("rep_mean"), 4).alias("boot_mean"),
        F.round(F.stddev_samp("rep_mean"), 4).alias("boot_se"),
    ).crossJoin(F.broadcast(base)).select(
        "n_replicates",
        "n",
        F.round("mean_x", 4).alias("mean_x"),
        "boot_mean",
        "boot_se",
        F.round("analytic_se", 4).alias("analytic_se"),
        F.round(F.col("boot_se") / F.col("analytic_se"), 2).alias("se_ratio"),
    )


# --- grouped closed-form OLS -------------------------------------------------
# Per-group multiple linear regression by normal equations: y = b0 + b1·q
# + b2·d, solved per group with Cramer's rule over the 3×3 moment matrix.
# The distributed-ML pattern: the ONLY shuffle is one partial+final
# aggregation of 10 moment sums per group; the solve is a constant-size
# projection. Cross-engine float exactness: inputs quantize to integers
# (quantity units, discount %, price cents), the moment sums are EXACT
# (Spark DECIMAL(38,0) / DuckDB int128), and both engines then evaluate
# the SAME arithmetic expression tree on the same doubles — identical
# IEEE results, no summation-order drift. At 100 TB the decimal sums are
# the point: double accumulation drifts with partitioning; decimal is
# associative.
_LR_DET = "(n*(sqq*sdd - sqd*sqd) - sq*(sq*sdd - sqd*sd) + sd*(sq*sqd - sqq*sd))"
_LR_B0 = "(sy*(sqq*sdd - sqd*sqd) - sq*(sqy*sdd - sqd*sdy) + sd*(sqy*sqd - sqq*sdy))"
_LR_B1 = "(n*(sqy*sdd - sdy*sqd) - sy*(sq*sdd - sqd*sd) + sd*(sq*sdy - sqy*sd))"
_LR_B2 = "(n*(sqq*sdy - sqd*sqy) - sq*(sq*sdy - sqy*sd) + sy*(sq*sqd - sqq*sd))"

_LR_COEFS = (
    f"ROUND(({_LR_B0})/({_LR_DET}), 6) AS b0_cents",
    f"ROUND(({_LR_B1})/({_LR_DET}), 6) AS b1_cents_per_qty",
    f"ROUND(({_LR_B2})/({_LR_DET}), 6) AS b2_cents_per_disc_pct",
    f"ROUND(1 - (syy - (({_LR_B0})*sy + ({_LR_B1})*sqy + ({_LR_B2})*sdy)/({_LR_DET}))"
    f" / (syy - sy*sy/n), 6) AS r2",
)


def q_grouped_linreg(spark, sf_dir):
    """Per-return-flag OLS of extended price (cents) on quantity and
    discount (%) with intercept — the closed-form grouped regression a
    feature store runs as a drift/pricing sanity screen. See the module
    block comment for the exact-sums / shared-expression-tree design."""
    li = _t(spark, sf_dir, "lineitem").selectExpr(
        "l_returnflag AS grp",
        "CAST(ROUND(l_quantity) AS BIGINT) AS q",
        "CAST(ROUND(l_discount * 100) AS BIGINT) AS d",
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y",
    )
    sums = li.groupBy("grp").agg(
        *[
            F.expr(e)
            for e in (
                "CAST(COUNT(*) AS DOUBLE) AS n",
                "CAST(SUM(CAST(q AS DECIMAL(38,0))) AS DOUBLE) AS sq",
                "CAST(SUM(CAST(d AS DECIMAL(38,0))) AS DOUBLE) AS sd",
                "CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy",
                "CAST(SUM(CAST(q*q AS DECIMAL(38,0))) AS DOUBLE) AS sqq",
                "CAST(SUM(CAST(q*d AS DECIMAL(38,0))) AS DOUBLE) AS sqd",
                "CAST(SUM(CAST(d*d AS DECIMAL(38,0))) AS DOUBLE) AS sdd",
                "CAST(SUM(CAST(q*y AS DECIMAL(38,0))) AS DOUBLE) AS sqy",
                "CAST(SUM(CAST(d*y AS DECIMAL(38,0))) AS DOUBLE) AS sdy",
                "CAST(SUM(CAST(y*y AS DECIMAL(38,0))) AS DOUBLE) AS syy",
            )
        ]
    )
    return sums.selectExpr(
        "grp", "CAST(n AS BIGINT) AS n_rows", *_LR_COEFS
    ).orderBy("grp")


QUERIES = {
    "grouped_linreg": q_grouped_linreg,
    "price_qq_drift": q_price_qq_drift,
    "bootstrap_mean_se": q_bootstrap_mean_se,
    "winsorized_stats": q_winsorized_stats,
    "distributed_global_rank": q_distributed_global_rank,
    "join_cardinality_estimate": q_join_cardinality_estimate,
    "weighted_median_price": q_weighted_median_price,
    "histogram_equidepth": q_histogram_equidepth,
    "numeric_corr_audit": q_numeric_corr_audit,
    "completeness_audit": q_completeness_audit,
    "chisq_independence": q_chisq_independence,
}

ORACLES = {
    "grouped_linreg": f"""
        WITH li AS (
            SELECT l_returnflag AS grp,
                   CAST(ROUND(l_quantity) AS BIGINT) AS q,
                   CAST(ROUND(l_discount * 100) AS BIGINT) AS d,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
            FROM lineitem
        ),
        sums AS (
            SELECT grp,
                   CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(q) AS DOUBLE) AS sq,
                   CAST(SUM(d) AS DOUBLE) AS sd,
                   CAST(SUM(y) AS DOUBLE) AS sy,
                   CAST(SUM(q*q) AS DOUBLE) AS sqq,
                   CAST(SUM(q*d) AS DOUBLE) AS sqd,
                   CAST(SUM(d*d) AS DOUBLE) AS sdd,
                   CAST(SUM(q*y) AS DOUBLE) AS sqy,
                   CAST(SUM(d*y) AS DOUBLE) AS sdy,
                   CAST(SUM(y*y) AS DOUBLE) AS syy
            FROM li GROUP BY grp
        )
        SELECT grp, CAST(n AS BIGINT) AS n_rows,
               {", ".join(_LR_COEFS)}
        FROM sums ORDER BY grp
    """,
    "price_qq_drift": f"""
        WITH o AS (
            SELECT EXTRACT(year FROM o_orderdate) AS yr, o_totalprice AS x
            FROM orders
            WHERE EXTRACT(year FROM o_orderdate) IN ({QQ_YEAR_P}, {QQ_YEAR_Q})
        ),
        per_yr AS (
            SELECT yr, [{", ".join(f"q{i}" for i in range(9))}] AS qs
            FROM ({distribution_quantiles_duck(
                "SELECT yr, x FROM o",
                "yr",
                "x",
                tuple(i / 10 for i in range(1, 10)),
            )})
        ),
        grid AS (
            SELECT yr, (i * 10) AS pctl, qs[i] AS q
            FROM per_yr, (SELECT UNNEST(generate_series(1, 9)) AS i)
        )
        SELECT p.pctl,
               ROUND(p.q, 4) AS q{QQ_YEAR_P},
               ROUND(q.q, 4) AS q{QQ_YEAR_Q},
               ROUND(q.q - p.q, 4) AS shift
        FROM (SELECT pctl, q FROM grid WHERE yr = {QQ_YEAR_P}) p
        JOIN (SELECT pctl, q FROM grid WHERE yr = {QQ_YEAR_Q}) q USING (pctl)
        ORDER BY p.pctl
    """,
    "bootstrap_mean_se": f"""
        WITH o AS (SELECT o_orderkey, o_totalprice AS x FROM orders),
        rep AS (
            SELECT b,
                   SUM(x * w) / SUM(w) AS rep_mean
            FROM (
                SELECT x, b,
                       CASE {" ".join(f"WHEN u < {c} THEN {k}" for k, c in enumerate(_POIS_CDF))}
                            ELSE 7 END AS w
                FROM (
                    SELECT x, b,
                           (CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '#'
                                                   || CAST(b AS VARCHAR)), 1, 15) AS BIGINT)
                            + 1) / {float(1 << 60)} AS u
                    FROM o, (SELECT UNNEST(generate_series(0, {BOOT_REPLICATES - 1})) AS b)
                )
            )
            GROUP BY b
        ),
        base AS (
            SELECT COUNT(*) AS n, AVG(x) AS mean_x,
                   STDDEV_SAMP(x) / SQRT(COUNT(*)) AS analytic_se
            FROM o
        )
        SELECT COUNT(*) AS n_replicates,
               MIN(base.n) AS n,
               ROUND(MIN(base.mean_x), 4) AS mean_x,
               ROUND(AVG(rep_mean), 4) AS boot_mean,
               ROUND(STDDEV_SAMP(rep_mean), 4) AS boot_se,
               ROUND(MIN(base.analytic_se), 4) AS analytic_se,
               ROUND(STDDEV_SAMP(rep_mean) / MIN(base.analytic_se), 2) AS se_ratio
        FROM rep, base
    """,
    "winsorized_stats": f"""
        WITH cuts AS (
            SELECT q0 AS lo, q1 AS hi
            FROM ({distribution_quantiles_duck(
                "SELECT o_totalprice AS x FROM orders",
                None,
                "x",
                (WINSOR_LO, WINSOR_HI),
            )})
        )
        SELECT COUNT(*) AS n,
               ROUND(MIN(lo), 4) AS p01,
               ROUND(MIN(hi), 4) AS p99,
               CAST(SUM(CASE WHEN o_totalprice < lo THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_clipped_low,
               CAST(SUM(CASE WHEN o_totalprice > hi THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_clipped_high,
               ROUND(AVG(o_totalprice), 4) AS raw_mean,
               ROUND(AVG(LEAST(GREATEST(o_totalprice, lo), hi)), 4) AS winsor_mean,
               ROUND(STDDEV_SAMP(o_totalprice), 4) AS raw_std,
               ROUND(STDDEV_SAMP(LEAST(GREATEST(o_totalprice, lo), hi)), 4)
                 AS winsor_std
        FROM orders, cuts
    """,
    "distributed_global_rank": f"""
        SELECT ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                 AS global_rank,
               o_orderkey,
               ROUND(o_totalprice, 2) AS totalprice
        FROM orders
        ORDER BY global_rank
        LIMIT {GLOBAL_RANK_TOP_K}
    """,
    "join_cardinality_estimate": """
        WITH o AS (SELECT o_orderkey AS k, COUNT(*) AS c_o FROM orders GROUP BY 1),
        li AS (SELECT l_orderkey AS k, COUNT(*) AS c_l FROM lineitem GROUP BY 1),
        p AS (
            SELECT CAST(SUM(c_o * c_l) AS BIGINT) AS predicted,
                   COUNT(*) AS n_join_keys
            FROM o JOIN li USING (k)
        ),
        a AS (
            SELECT COUNT(*) AS actual
            FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        )
        SELECT n_join_keys, predicted, actual, predicted = actual AS match
        FROM p, a
    """,
    "weighted_median_price": """
        WITH expanded AS (
            SELECT l_returnflag, l_extendedprice
            FROM lineitem, UNNEST(generate_series(1, CAST(l_quantity AS INTEGER)))
        ),
        base AS (
            SELECT l_returnflag, COUNT(*) AS n_rows,
                   CAST(SUM(CAST(l_quantity AS INTEGER)) AS BIGINT) AS total_weight
            FROM lineitem GROUP BY 1
        )
        SELECT b.l_returnflag, b.n_rows, b.total_weight,
               ROUND(quantile_cont(e.l_extendedprice, 0.25), 4) AS wq1,
               ROUND(quantile_cont(e.l_extendedprice, 0.5), 4) AS wmedian,
               ROUND(quantile_cont(e.l_extendedprice, 0.75), 4) AS wq3
        FROM expanded e JOIN base b USING (l_returnflag)
        GROUP BY b.l_returnflag, b.n_rows, b.total_weight
        ORDER BY b.l_returnflag
    """,
    "histogram_equidepth": f"""
        WITH cuts AS (
            SELECT [{", ".join(f"q{i}" for i in range(EQUIDEPTH_BUCKETS - 1))}] AS cs
            FROM ({distribution_quantiles_duck(
                "SELECT o_totalprice AS x FROM orders",
                None,
                "x",
                tuple(i / EQUIDEPTH_BUCKETS for i in range(1, EQUIDEPTH_BUCKETS)),
                grain_space=True,
            )})
        ),
        binned AS (
            SELECT CAST(len(list_filter(cs, c -> round(o_totalprice * 100) > c)) AS INTEGER) AS bucket,
                   o_totalprice AS x
            FROM orders, cuts
        )
        SELECT bucket, COUNT(*) AS n,
               ROUND(MIN(x), 2) AS lo, ROUND(MAX(x), 2) AS hi
        FROM binned GROUP BY bucket ORDER BY bucket
    """,
    "numeric_corr_audit": """
        SELECT COUNT(*) AS n,
               ROUND(CORR(l_extendedprice, l_quantity), 6) AS corr_extendedprice_quantity,
               ROUND(CORR(l_extendedprice, l_discount), 6) AS corr_extendedprice_discount,
               ROUND(CORR(l_extendedprice, l_tax), 6) AS corr_extendedprice_tax,
               ROUND(CORR(l_quantity, l_discount), 6) AS corr_quantity_discount,
               ROUND(CORR(l_quantity, l_tax), 6) AS corr_quantity_tax,
               ROUND(CORR(l_discount, l_tax), 6) AS corr_discount_tax
        FROM lineitem
    """,
    "completeness_audit": """
        SELECT COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_custkey,
               CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_orderdate,
               CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_totalprice,
               CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_orderstatus,
               CAST(SUM(CASE WHEN TRIM(o_orderstatus) = '' THEN 1 ELSE 0 END) AS BIGINT) AS blank_status,
               COUNT(DISTINCT o_orderstatus) AS distinct_status,
               COUNT(DISTINCT o_orderpriority) AS distinct_priority,
               COUNT(DISTINCT o_custkey) AS distinct_custkey
        FROM orders
    """,
    "chisq_independence": """
        WITH cells AS (
            SELECT event_type, EXTRACT(dow FROM ts) AS dow_raw, COUNT(*) AS o
            FROM events GROUP BY 1, 2
        ),
        canon AS (
            SELECT event_type, dow_raw + 1 AS dow, o FROM cells
        ),
        row_m AS (SELECT event_type, SUM(o) AS rt FROM canon GROUP BY 1),
        col_m AS (SELECT dow, SUM(o) AS ct FROM canon GROUP BY 1),
        tot AS (SELECT SUM(o) AS n FROM canon)
        SELECT ROUND(SUM(POWER(c.o - (r.rt * cm.ct / t.n), 2)
                         / (r.rt * cm.ct / t.n)), 4) AS chi2,
               (COUNT(DISTINCT c.event_type) - 1) * (COUNT(DISTINCT c.dow) - 1) AS dof,
               COUNT(*) AS n_cells
        FROM canon c
        JOIN row_m r USING (event_type)
        JOIN col_m cm USING (dow)
        CROSS JOIN tot t
    """,
}
