"""Two-sample distribution tests and higher-moment profiling — the
statistical gates a pipeline runs before concluding "these two cohorts
behave differently" (A/B backends, source drift, pre/post migration).

Reference analog: none (SURVEY §2 has no statistics surface). Completes
the inference family next to ``ab_test_welch`` (parametric means),
``chisq_independence`` (categorical), ``price_psi_drift`` /
``price_qq_drift`` (distribution drift scores): Mann-Whitney U is the
nonparametric location test, Kolmogorov-Smirnov the nonparametric
whole-shape test, and the moments audit screens which of the two regimes
(normal-ish ⇒ Welch, heavy-tailed ⇒ rank tests) a column is even in.

Scale shape — the hard part of rank statistics is the GLOBAL cumulative
count, which is exactly the distributed-ranking problem:

- Contract both samples to the integer price grain (round(x·100), exact
  cents) — ONE data-sized shuffle; every later stage lives at the grain
  table's size.
- Global prefix sums WITHOUT a single-partition window: the
  ``distributed_global_rank`` sample-sort shape — grain-space quantile
  cuts split the grains into RANK_BUCKETS monotone buckets (ties never
  straddle: integer grains vs strictly-between-integer interpolated
  cuts), per-bucket subtotals theta-join into offsets over a B-row
  broadcast, and the within-bucket window is PARTITIONED BY bucket.
- Both test statistics then fold the cumulative grain table into one
  row: U from Σ n_a·(2·cumB_before + n_b) kept in INTEGER arithmetic
  until the final division (hash-exact across engines), D from the max
  CDF gap (identical per-grain integer divisions both sides).

The naive ``RANK() OVER (ORDER BY price)`` one-partition form is the
oracle only.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.quantiles import distribution_quantiles
from ..sources.tables import load_table as _t

PRI_A = "1-URGENT"
PRI_B = "5-LOW"
RANK_BUCKETS = 16
KS_C05 = 1.358  # Smirnov critical coefficient at alpha = 0.05


def _two_sample_cum(spark, sf_dir):
    """Grain-level cumulative table for the (PRI_A vs PRI_B) totalprice
    samples: (grain, n_a, n_b, cum_a, cum_b, tot_a, tot_b) with cum_*
    INCLUSIVE of the current grain. Distributed prefix sum — see module
    docstring."""
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(PRI_A, PRI_B)
    )
    sel = o.select(
        (F.col("o_orderpriority") == PRI_A).cast("long").alias("a"),
        (F.round(F.col("o_totalprice") * 100) / F.lit(100.0)).alias("v"),
    )
    # r12 (guide §2.3/§2.4): ONE raw scan + ONE grain contraction for the
    # whole helper. r13 (guide §1.2/§2.4 — one materialization per query,
    # not per stage): the contraction IS the quantile machinery's own
    # grain table now — extra_aggs rides (n_a, n_b) on it and
    # return_grain hands the one materialized copy back, so the helper's
    # second barrier (and the duplicate groupBy exchange) are gone. Cut
    # values are identical: the helper contracts the same raw rows to
    # the same cent grains (round((g/100.0)*100) == g exactly for cent
    # grains — |g| < 2^52, relative double error ~1e-16 << 0.5), so the
    # quantize/cumulate/straddle arithmetic sees the same inputs.
    ps = tuple(i / RANK_BUCKETS for i in range(1, RANK_BUCKETS))
    cuts_df, tagged = distribution_quantiles(
        sel,
        None,
        "v",
        ps,
        grain_space=True,
        extra_aggs={
            "n_a": F.sum("a"),
            "n_b": F.sum(F.lit(1) - F.col("a")),
        },
        return_grain=True,
    )
    cuts = cuts_df.select(
        F.array(*[F.col(f"q{i}") for i in range(len(ps))]).alias("cuts")
    )
    grain = tagged.select(F.col("__c").alias("g"), "n_a", "n_b")
    bucketed = grain.crossJoin(F.broadcast(cuts)).select(
        "g",
        "n_a",
        "n_b",
        # b = number of cuts at-or-below g: ASCENDING-monotone in g
        # (equal grains share a bucket; interpolated cuts sit strictly
        # between integers, so no tie is decided by an ulp)
        F.expr(
            "aggregate(cuts, 0, (acc, c) -> "
            "acc + IF(c <= CAST(g AS DOUBLE), 1, 0))"
        ).alias("b"),
    )
    counts = bucketed.groupBy("b").agg(
        F.sum("n_a").alias("ca"), F.sum("n_b").alias("cb")
    )
    prev = counts.select(
        F.col("b").alias("pb"), F.col("ca").alias("pa"), F.col("cb").alias("pbb")
    )
    offsets = (
        counts.join(F.broadcast(prev), F.col("pb") < F.col("b"), "left")
        .groupBy("b")
        .agg(
            F.coalesce(F.sum("pa"), F.lit(0)).alias("off_a"),
            F.coalesce(F.sum("pbb"), F.lit(0)).alias("off_b"),
        )
    )
    w_cum = W.partitionBy("b").orderBy("g").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    totals = grain.agg(
        F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b")
    )
    return (
        bucketed.join(F.broadcast(offsets), "b")
        .select(
            "g",
            "n_a",
            "n_b",
            (F.col("off_a") + F.sum("n_a").over(w_cum)).alias("cum_a"),
            (F.col("off_b") + F.sum("n_b").over(w_cum)).alias("cum_b"),
        )
        .crossJoin(F.broadcast(totals))
    )


def q_mann_whitney_u(spark, sf_dir):
    """Mann-Whitney U (Wilcoxon rank-sum) between urgent and low-priority
    order totals, with the tie-corrected normal approximation. U is kept
    in integer arithmetic (2U = Σ n_a·(2·cumB_before + n_b)) until the
    final division, so the statistic hash-matches the naive-ranking
    oracle exactly."""
    cum = _two_sample_cum(spark, sf_dir)
    folded = cum.agg(
        F.max("tot_a").alias("na"),
        F.max("tot_b").alias("nb"),
        F.sum(
            F.col("n_a") * (2 * (F.col("cum_b") - F.col("n_b")) + F.col("n_b"))
        ).alias("u2"),
        F.sum(
            (F.col("n_a") + F.col("n_b")) * (F.col("n_a") + F.col("n_b"))
            * (F.col("n_a") + F.col("n_b"))
            - (F.col("n_a") + F.col("n_b"))
        ).alias("ties"),
    )
    n = F.col("na") + F.col("nb")
    var = (F.col("na") * F.col("nb") / F.lit(12.0)) * (
        (n + 1) - F.col("ties") / (n * (n - F.lit(1.0)))
    )
    return folded.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        (F.col("u2") / F.lit(2.0)).alias("u_stat"),
        F.round(
            (F.col("u2") / F.lit(2.0) - F.col("na") * F.col("nb") / F.lit(2.0))
            / F.sqrt(var),
            6,
        ).alias("z_score"),
    )


def q_ks_two_sample(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov: the max gap between the two
    empirical CDFs of urgent vs low-priority order totals, with the
    alpha=0.05 Smirnov critical value and the reject flag. CDF gaps are
    evaluated at every observed grain (sufficient: the sup is attained
    at a jump point)."""
    cum = _two_sample_cum(spark, sf_dir)
    gap = F.abs(
        F.col("cum_a") / F.col("tot_a") - F.col("cum_b") / F.col("tot_b")
    )
    folded = cum.agg(
        F.max("tot_a").alias("na"),
        F.max("tot_b").alias("nb"),
        F.max(gap).alias("d"),
    )
    crit = F.lit(KS_C05) * F.sqrt(
        (F.col("na") + F.col("nb")) / (F.col("na") * F.col("nb") / F.lit(1.0))
    )
    return folded.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round(F.col("d"), 6).alias("ks_d"),
        F.round(crit, 6).alias("ks_crit_05"),
        (F.col("d") > crit).alias("reject_05"),
    )


def q_distribution_shape_audit(spark, sf_dir):
    """Per-priority higher-moment profile of order totals: skewness,
    excess kurtosis, and the Jarque-Bera normality statistic — the
    screen that decides Welch-vs-rank-test applicability. Moments come
    from raw power sums written IDENTICALLY in both engines (never the
    built-ins, whose sample-correction conventions differ); one
    aggregation with map-side partials, output bounded by the priority
    domain."""
    o = _t(spark, sf_dir, "orders")
    # Exact integer power sums at the cent grain (Spark DECIMAL(38,0) /
    # DuckDB HUGEINT): distributed double sums drift with partition
    # order, integer sums cannot. g^4 ≈ 9e30 and its sum fit 38 digits
    # through sf1-scale fixtures; skew/kurtosis are scale-invariant so
    # the moment algebra runs in grain space, only mean/stddev rescale.
    g = F.round(F.col("o_totalprice") * 100).cast("decimal(20,0)")
    o = o.select("o_orderpriority", (g * g).alias("g2"), g.alias("g"))
    sums = o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum("g").cast("double").alias("s1"),
        F.sum("g2").cast("double").alias("s2"),
        F.sum(F.col("g2") * F.col("g")).cast("double").alias("s3"),
        F.sum(F.col("g2") * F.col("g2")).cast("double").alias("s4"),
    )
    n = F.col("n")
    mean = F.col("s1") / n
    m2 = F.col("s2") / n - mean * mean
    m3 = F.col("s3") / n - 3 * mean * (F.col("s2") / n) + 2 * mean * mean * mean
    m4 = (
        F.col("s4") / n
        - 4 * mean * (F.col("s3") / n)
        + 6 * mean * mean * (F.col("s2") / n)
        - 3 * mean * mean * mean * mean
    )
    skew = m3 / F.sqrt(m2 * m2 * m2)
    exkurt = m4 / (m2 * m2) - 3
    jb = n / F.lit(6.0) * (skew * skew + exkurt * exkurt / F.lit(4.0))
    return sums.select(
        F.col("o_orderpriority").alias("priority"),
        "n",
        F.round(mean / 100, 4).alias("mean"),
        F.round(F.sqrt(m2) / 100, 4).alias("stddev_pop"),
        F.round(skew, 5).alias("skewness"),
        F.round(exkurt, 5).alias("excess_kurtosis"),
        F.round(jb, 3).alias("jarque_bera"),
    )


def _avg_rank2(df, value_col: str, out_col: str):
    """Per-grain DOUBLED average rank (2·avg_rank is an exact integer
    even under midpoint tie-averaging) for ``value_col`` over ``df`` —
    the same sample-sort bucket shape as ``_two_sample_cum``: grain
    contraction, quantile-cut buckets, per-bucket windows + an offset
    broadcast. Returns (g, r2) keyed by the integer cent grain."""
    sel = df.select(
        F.round(F.col(value_col) * 100).cast("bigint").alias("g"),
        F.col(value_col).alias("v"),
    )
    grain = sel.groupBy("g").agg(F.count("*").alias("cnt"))
    ps = tuple(i / RANK_BUCKETS for i in range(1, RANK_BUCKETS))
    cuts = distribution_quantiles(sel, None, "v", ps, grain_space=True).select(
        F.array(*[F.col(f"q{i}") for i in range(len(ps))]).alias("cuts")
    )
    bucketed = grain.crossJoin(F.broadcast(cuts)).select(
        "g",
        "cnt",
        F.expr(
            "aggregate(cuts, 0, (acc, c) -> "
            "acc + IF(c <= CAST(g AS DOUBLE), 1, 0))"
        ).alias("b"),
    )
    counts = bucketed.groupBy("b").agg(F.sum("cnt").alias("bc"))
    prev = counts.select(F.col("b").alias("pb"), F.col("bc").alias("pc"))
    offsets = (
        counts.join(F.broadcast(prev), F.col("pb") < F.col("b"), "left")
        .groupBy("b")
        .agg(F.coalesce(F.sum("pc"), F.lit(0)).alias("off"))
    )
    w_cum = W.partitionBy("b").orderBy("g").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        bucketed.join(F.broadcast(offsets), "b")
        .select(
            "g",
            "cnt",
            (F.col("off") + F.sum("cnt").over(w_cum)).alias("cum"),
        )
        # 2·avg_rank of a tie group ending at cum with cnt members:
        # ranks are cum-cnt+1 .. cum, average (2·cum - cnt + 1)/2
        .select("g", (2 * F.col("cum") - F.col("cnt") + 1).alias(out_col))
    )


def _avg_rank2_fused(df, col_x: str, col_y: str):
    """BOTH columns' doubled average ranks from ONE tagged cumulative
    pass (VERDICT r10 item 2: running `_avg_rank2` per column executed
    the sample-sort shape twice — twice the stages for identical
    arithmetic). The two value streams union into a (__rtag, v) table
    with an INTEGER literal tag (0 = x, 1 = y; a 2-value domain —
    `tests/test_plan_lint.py` carries the witness), and the ONE
    raw-data-sized stage is the (tag, grain) contraction. The cumulative
    then uses the sample-sort shape DIRECTLY (the same two-phase pattern
    functions/quantiles runs internally): range-partition the grain
    table on (tag, grain), per-partition totals become starting offsets
    via a window over the tiny P×2 table, and the within-partition
    running sum is a window PARTITIONED BY (__pid, __rtag). This drops
    the whole quantile-cut detour of the r10 per-column form (cuts only
    ever decided which bucket a grain sorted in; the range exchange
    decides that straight from its sampled boundaries). Ties are exact
    by construction: each (tag, grain) is ONE row after the contraction,
    so no tie group can straddle a partition boundary. The x/y consumers
    each re-run the (cheap) offset+window tail from the pinned
    checkpoint — measured cheaper than checkpointing the rank table too
    (2.9 s vs 4.4 s at sf0.1), and __pid-deterministic either way.
    Returns (__rtag, g, r2)."""
    spark = df.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # NOTE (r13, measured): do NOT inline()-mirror this union — the two
    # branches are cheap parallel column scans, and generator-doubling
    # the raw rows measured ~30% SLOWER at the sf1 soak (15.3 vs 11.7 s
    # warm; per-row struct-array allocation costs more than the saved
    # scan). inline() pays off only where it removes a barrier or
    # dedups an expensive subtree — see _knn_scored_pairs.
    tagged = df.select(
        F.lit(0).alias("__rtag"), F.col(col_x).alias("v")
    ).unionAll(df.select(F.lit(1).alias("__rtag"), F.col(col_y).alias("v")))
    # ONE materialization: contraction shuffle -> range exchange -> pid
    # tag. The range exchange samples boundaries nondeterministically and
    # __pid depends on them; the lazy localCheckpoint pins one assignment
    # for the two consumers (ptot and the cum join) — the same pinning
    # rule functions/quantiles documents for its internal __pid.
    part = (
        tagged.select(
            "__rtag", F.round(F.col("v") * 100).cast("bigint").alias("g")
        )
        .groupBy("__rtag", "g")
        .agg(F.count("*").alias("cnt"))
        .repartitionByRange(nparts, "__rtag", "g")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    ptot = part.groupBy("__pid", "__rtag").agg(F.sum("cnt").alias("pc"))
    wo = W.partitionBy("__rtag").orderBy("__pid")
    offs = ptot.select(
        "__pid", "__rtag", (F.sum("pc").over(wo) - F.col("pc")).alias("off")
    )
    wp = W.partitionBy("__pid", "__rtag").orderBy("g").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        part.join(F.broadcast(offs), ["__pid", "__rtag"])
        .select(
            "__rtag",
            "g",
            "cnt",
            (F.col("off") + F.sum("cnt").over(wp)).alias("cum"),
        )
        .select(
            "__rtag", "g", (2 * F.col("cum") - F.col("cnt") + 1).alias("r2")
        )
    )


def q_spearman_corr(spark, sf_dir):
    """Distributed Spearman rank correlation between lineitem extended
    price and quantity — the monotone-association complement of the
    Pearson screen in numeric_corr_audit (Spearman is Pearson on
    midpoint-tie-averaged ranks, robust to the heavy right tail Pearson
    over-weights).

    Scale + exactness: BOTH columns' average ranks come from ONE fused
    sample-sort cumulative over a tag-unioned stream (`_avg_rank2_fused`
    — no one-partition window, half the stages of the per-column form);
    DOUBLED ranks are exact integers, the two rank joins are
    grain-keyed equi-joins back to the row set, and all five power sums
    accumulate as DECIMAL(38,0)/HUGEINT — so the statistic is a ratio
    of exact integers and hash-matches the naive RANK() oracle
    bit-for-bit."""
    li = _t(spark, sf_dir, "lineitem").select("l_extendedprice", "l_quantity")
    rows = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("gx"),
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("gy"),
    )
    ranks = _avg_rank2_fused(li, "l_extendedprice", "l_quantity")
    rx = ranks.filter(F.col("__rtag") == 0).select(
        F.col("g").alias("gx"), F.col("r2").alias("r2x")
    )
    ry = ranks.filter(F.col("__rtag") == 1).select(
        F.col("g").alias("gy"), F.col("r2").alias("r2y")
    )
    ranked = rows.join(rx, "gx").join(ry, "gy")
    d = lambda c: F.col(c).cast("decimal(38,0)")
    sums = ranked.agg(
        F.count("*").alias("n"),
        F.sum(d("r2x")).cast("double").alias("sx"),
        F.sum(d("r2y")).cast("double").alias("sy"),
        F.sum(d("r2x") * d("r2x")).cast("double").alias("sxx"),
        F.sum(d("r2y") * d("r2y")).cast("double").alias("syy"),
        F.sum(d("r2x") * d("r2y")).cast("double").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    rho = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (nd * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return sums.select("n", F.round(rho, 6).alias("spearman_rho"))


MI_BINS = 20


def q_mutual_information_binned(spark, sf_dir):
    """Equi-width-binned mutual information (plus marginal entropies and
    the normalized MI) between lineitem extended price and quantity —
    the nonlinear-dependence screen that catches what Pearson/Spearman
    (linear/monotone) miss. Completes the dependence family with
    chisq_independence (categorical).

    Scale shape: ONE contraction of the rows to the MI_BINS² cell grid
    (bin indices are exact integer arithmetic over the cent grains, with
    the min/max bounds a 1-row broadcast), then margins and the Σ p·ln
    folds are constant-size. Every count is an exact integer; only the
    final ≤B² ln-fold is float."""
    li = _t(spark, sf_dir, "lineitem")
    rows = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("gx"),
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("gy"),
    )
    bounds = rows.agg(
        F.min("gx").alias("x0"),
        F.max("gx").alias("x1"),
        F.min("gy").alias("y0"),
        F.max("gy").alias("y1"),
    )
    bx = F.floor(
        (F.col("gx") - F.col("x0")) * MI_BINS / (F.col("x1") - F.col("x0") + 1)
    )
    by = F.floor(
        (F.col("gy") - F.col("y0")) * MI_BINS / (F.col("y1") - F.col("y0") + 1)
    )
    cells = (
        rows.crossJoin(F.broadcast(bounds))
        .select(bx.alias("bx"), by.alias("by"))
        .groupBy("bx", "by")
        .agg(F.count("*").alias("c"))
    )
    rx = cells.groupBy("bx").agg(F.sum("c").alias("cx"))
    ry = cells.groupBy("by").agg(F.sum("c").alias("cy"))
    tot = cells.agg(F.sum("c").alias("n"))
    joined = (
        cells.join(F.broadcast(rx), "bx")
        .join(F.broadcast(ry), "by")
        .crossJoin(F.broadcast(tot))
    )
    nd = F.col("n").cast("double")
    p = F.col("c") / nd
    mi_term = p * F.log(
        (F.col("c").cast("double") * nd)
        / (F.col("cx").cast("double") * F.col("cy").cast("double"))
    )
    # marginal entropies folded over the SAME joined cells, weighting
    # each marginal term by its cell share so the fold stays one pass:
    # Σ_cells (c/n)·ln(cx/n) = Σ_x (cx/n)·ln(cx/n)
    hx_term = -p * F.log(F.col("cx").cast("double") / nd)
    hy_term = -p * F.log(F.col("cy").cast("double") / nd)
    folded = joined.agg(
        F.max("n").alias("n"),
        F.sum(mi_term).alias("mi"),
        F.sum(hx_term).alias("hx"),
        F.sum(hy_term).alias("hy"),
    )
    return folded.select(
        "n",
        F.round(F.col("mi"), 6).alias("mi_nats"),
        F.round(F.col("hx"), 6).alias("h_price"),
        F.round(F.col("hy"), 6).alias("h_quantity"),
        F.round(F.col("mi") / F.sqrt(F.col("hx") * F.col("hy")), 6).alias("nmi"),
    )


# Naive-ranking oracle CTE: global window cumulative over the same grain.
_CUM_SQL = f"""
    s AS (
        SELECT CASE WHEN o_orderpriority = '{PRI_A}' THEN 1 ELSE 0 END AS a,
               CAST(round(o_totalprice * 100) AS BIGINT) AS g
        FROM orders
        WHERE o_orderpriority IN ('{PRI_A}', '{PRI_B}')
    ),
    grain AS (
        SELECT g, SUM(a) AS n_a, SUM(1 - a) AS n_b FROM s GROUP BY g
    ),
    cum AS (
        SELECT g, n_a, n_b,
               SUM(n_a) OVER (ORDER BY g) AS cum_a,
               SUM(n_b) OVER (ORDER BY g) AS cum_b,
               SUM(n_a) OVER () AS tot_a,
               SUM(n_b) OVER () AS tot_b
        FROM grain
    )
"""

QUERIES = {
    "mutual_information_binned": q_mutual_information_binned,
    "spearman_corr": q_spearman_corr,
    "mann_whitney_u": q_mann_whitney_u,
    "ks_two_sample": q_ks_two_sample,
    "distribution_shape_audit": q_distribution_shape_audit,
}

ORACLES = {
    "mutual_information_binned": f"""
        WITH rows_g AS (
            SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS gx,
                   CAST(round(l_quantity * 100) AS BIGINT) AS gy
            FROM lineitem
        ),
        bounds AS (
            SELECT MIN(gx) AS x0, MAX(gx) AS x1,
                   MIN(gy) AS y0, MAX(gy) AS y1
            FROM rows_g
        ),
        cells AS (
            SELECT FLOOR((gx - x0) * {MI_BINS} / (x1 - x0 + 1)) AS bx,
                   FLOOR((gy - y0) * {MI_BINS} / (y1 - y0 + 1)) AS by,
                   COUNT(*) AS c
            FROM rows_g, bounds
            GROUP BY 1, 2
        ),
        rx AS (SELECT bx, SUM(c) AS cx FROM cells GROUP BY 1),
        ry AS (SELECT by, SUM(c) AS cy FROM cells GROUP BY 1),
        tot AS (SELECT SUM(c) AS n FROM cells),
        folded AS (
            SELECT MAX(n) AS n,
                   SUM((c / CAST(n AS DOUBLE))
                       * LN((CAST(c AS DOUBLE) * CAST(n AS DOUBLE))
                            / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))))
                     AS mi,
                   SUM(-(c / CAST(n AS DOUBLE))
                       * LN(CAST(cx AS DOUBLE) / CAST(n AS DOUBLE))) AS hx,
                   SUM(-(c / CAST(n AS DOUBLE))
                       * LN(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE))) AS hy
            FROM cells
            JOIN rx USING (bx)
            JOIN ry USING (by)
            CROSS JOIN tot
        )
        SELECT CAST(n AS BIGINT) AS n,
               ROUND(mi, 6) AS mi_nats,
               ROUND(hx, 6) AS h_price,
               ROUND(hy, 6) AS h_quantity,
               ROUND(mi / SQRT(hx * hy), 6) AS nmi
        FROM folded
    """,
    "spearman_corr": """
        WITH rows_g AS (
            SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS gx,
                   CAST(round(l_quantity * 100) AS BIGINT) AS gy
            FROM lineitem
        ),
        gxt AS (SELECT gx AS g, COUNT(*) AS cnt FROM rows_g GROUP BY 1),
        cx AS (SELECT g, 2 * SUM(cnt) OVER (ORDER BY g) - cnt + 1 AS r2x
               FROM gxt),
        gyt AS (SELECT gy AS g, COUNT(*) AS cnt FROM rows_g GROUP BY 1),
        cy AS (SELECT g, 2 * SUM(cnt) OVER (ORDER BY g) - cnt + 1 AS r2y
               FROM gyt),
        ranked AS (
            SELECT r2x, r2y
            FROM rows_g r
            JOIN cx ON r.gx = cx.g
            JOIN cy ON r.gy = cy.g
        ),
        sums AS (
            SELECT COUNT(*) AS n,
                   CAST(SUM(CAST(r2x AS HUGEINT)) AS DOUBLE) AS sx,
                   CAST(SUM(CAST(r2y AS HUGEINT)) AS DOUBLE) AS sy,
                   CAST(SUM(CAST(r2x AS HUGEINT) * CAST(r2x AS HUGEINT))
                        AS DOUBLE) AS sxx,
                   CAST(SUM(CAST(r2y AS HUGEINT) * CAST(r2y AS HUGEINT))
                        AS DOUBLE) AS syy,
                   CAST(SUM(CAST(r2x AS HUGEINT) * CAST(r2y AS HUGEINT))
                        AS DOUBLE) AS sxy
            FROM ranked
        )
        SELECT CAST(n AS BIGINT) AS n,
               ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                     / SQRT((CAST(n AS DOUBLE) * sxx - sx * sx)
                            * (CAST(n AS DOUBLE) * syy - sy * sy)), 6)
                 AS spearman_rho
        FROM sums
    """,
    "mann_whitney_u": f"""
        WITH {_CUM_SQL},
        folded AS (
            SELECT MAX(tot_a) AS na, MAX(tot_b) AS nb,
                   SUM(n_a * (2 * (cum_b - n_b) + n_b)) AS u2,
                   SUM((n_a + n_b) * (n_a + n_b) * (n_a + n_b)
                       - (n_a + n_b)) AS ties
            FROM cum
        )
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               u2 / 2.0 AS u_stat,
               ROUND((u2 / 2.0 - na * nb / 2.0)
                     / SQRT((na * nb / 12.0)
                            * ((na + nb + 1)
                               - ties / ((na + nb) * (na + nb - 1.0)))),
                     6) AS z_score
        FROM folded
    """,
    "ks_two_sample": f"""
        WITH {_CUM_SQL},
        folded AS (
            SELECT MAX(tot_a) AS na, MAX(tot_b) AS nb,
                   MAX(ABS(cum_a / CAST(tot_a AS DOUBLE)
                           - cum_b / CAST(tot_b AS DOUBLE))) AS d
            FROM cum
        )
        SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
               ROUND(d, 6) AS ks_d,
               ROUND({KS_C05} * SQRT((na + nb) / (na * nb / 1.0)), 6)
                 AS ks_crit_05,
               d > {KS_C05} * SQRT((na + nb) / (na * nb / 1.0)) AS reject_05
        FROM folded
    """,
    "distribution_shape_audit": """
        WITH q AS (
            SELECT o_orderpriority,
                   CAST(round(o_totalprice * 100) AS HUGEINT) AS g
            FROM orders
        ),
        sums AS (
            SELECT o_orderpriority,
                   COUNT(*) AS n,
                   CAST(SUM(g) AS DOUBLE) AS s1,
                   CAST(SUM(g * g) AS DOUBLE) AS s2,
                   CAST(SUM(g * g * g) AS DOUBLE) AS s3,
                   CAST(SUM((g * g) * (g * g)) AS DOUBLE) AS s4
            FROM q GROUP BY 1
        ),
        m AS (
            SELECT o_orderpriority, n,
                   s1 / n AS mean,
                   s2 / n - (s1 / n) * (s1 / n) AS m2,
                   s3 / n - 3 * (s1 / n) * (s2 / n)
                     + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
                   s4 / n - 4 * (s1 / n) * (s3 / n)
                     + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                     - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
            FROM sums
        )
        SELECT o_orderpriority AS priority, CAST(n AS BIGINT) AS n,
               ROUND(mean / 100, 4) AS mean,
               ROUND(SQRT(m2) / 100, 4) AS stddev_pop,
               ROUND(m3 / SQRT(m2 * m2 * m2), 5) AS skewness,
               ROUND(m4 / (m2 * m2) - 3, 5) AS excess_kurtosis,
               ROUND(n / 6.0 * ((m3 / SQRT(m2 * m2 * m2))
                                * (m3 / SQRT(m2 * m2 * m2))
                                + (m4 / (m2 * m2) - 3)
                                  * (m4 / (m2 * m2) - 3) / 4.0), 3)
                 AS jarque_bera
        FROM m
    """,
}
