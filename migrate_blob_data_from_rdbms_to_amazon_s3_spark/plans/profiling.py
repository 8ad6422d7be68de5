"""Data-profiling and pipeline-maintenance operators: equi-width
histograms, join-key skew audits, Bloom-prefilter semi-joins, A/B
experiment tests, exact rolling distinct users, incremental aggregate
maintenance, Pareto frontiers, weighted reservoir sampling, and the
monitoring family (CUSUM change-points, EWMA smoothing, Theil-Sen
trends, PSI drift, Benford audits, time-weighted averages) — SURVEY §7
M2/M4 breadth: the profiling pass every large ingest runs before
choosing partitioning and join strategy, and the drift monitors it runs
forever after.

Scale notes (100 TB):
- Every query here is scan → (broadcast 1-row bounds) → one keyed shuffle.
  Global scalars (min/max, totals) are 1-row aggregates attached through
  ``crossJoin(broadcast(...))`` — a BroadcastNestedLoopJoin over one row,
  never a real cartesian.
- ``key_skew_audit`` aggregates at the key grain first (combiner-side
  partial counts), then reduces the counts table — the second pass touches
  |distinct keys| rows, not |rows|.
- ``rolling_active_users`` inflates by exactly the window length (7×) at
  the (user, day) grain — bounded, unlike a range self-join whose fan-out
  is data-dependent. The sketch twin for unbounded windows is
  ``hll_multigrain_rollup``.
- ``incremental_agg_merge`` is the materialized-view maintenance pattern:
  merge algebraic partial states (count/sum) instead of rescanning the
  base table — at 100 TB the delta scan is the whole job.
- ``pareto_frontier`` never compares point pairs: an equi-width bucketing
  of x (monotone, so bucket order ⇒ x order) reduces cross-bucket
  dominance to a B-row prefix-min table, and intra-bucket dominance to a
  window PARTITIONED BY bucket — the O(n²) NOT EXISTS is the oracle only.
- ``weighted_sample_topk`` is one pass + per-group top-k (Efraimidis-
  Spirakis A-Res keys); no global sort, no rejection loop.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.quantiles import distribution_quantiles_duck
from ..sources.tables import load_table as _t

HIST_BINS = 20
SKEW_KEY = "l_suppkey"
ROLL_DAYS = 7  # rolling window length in days (inclusive of the target day)
INC_CUTOFF = "1997-01-01"  # materialized state covers orders strictly before
WSAMPLE_K = 5  # docs kept per source by the weighted sampler
_MD5_RANGE = float(1 << 60)  # 15 hex digits of md5 → [0, 2^60)


# --- equi-width histogram --------------------------------------------------------------
def q_histogram_equiwidth(spark, sf_dir):
    """Equi-width histogram of order totals: HIST_BINS fixed-width bins
    between the global min and max. The bounds are a 1-row aggregate
    broadcast to the scan; bin assignment is pure arithmetic (identical
    IEEE ops in both engines), so the whole profile is two passes with one
    tiny shuffle. The classic first query of any profiling pass."""
    o = _t(spark, sf_dir, "orders").select(F.col("o_totalprice").alias("x"))
    bounds = o.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / HIST_BINS
    binned = o.crossJoin(F.broadcast(bounds)).select(
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("x") - F.col("lo")) / width),
                F.lit(HIST_BINS - 1),
            )
        )
        .cast("bigint")
        .alias("bin"),
        F.col("lo"),
        F.col("hi"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.first(F.col("lo") + F.col("bin") * (F.col("hi") - F.col("lo")) / HIST_BINS),
                4,
            ).alias("bin_lo"),
            F.round(
                F.first(F.col("lo") + (F.col("bin") + 1) * (F.col("hi") - F.col("lo")) / HIST_BINS),
                4,
            ).alias("bin_hi"),
        )
        .orderBy("bin")
    )


# --- Z-order layout pruning audit ------------------------------------------------------
ZORDER_CELL_BITS = 8   # scale each column to an 8-bit grid
ZORDER_GRID_BITS = 3   # interleave the top 3 bits per dim → 8×8 = 64 z-buckets
ZORDER_PRED_LO = 224   # box predicate: scaled coordinate in the top 1/8


def q_zorder_pruning_audit(spark, sf_dir):
    """What a Z-order (Morton-curve) file layout buys at scan time,
    measured: bucket lineitem two ways — by the interleaved top bits of
    (l_quantity, l_extendedprice) (the layout ``operators/layout.zorder_write``
    produces, quantized to a deterministic fixed grid so the audit is
    value-oracle-able) and by the top bits of l_quantity alone (a plain
    1-D sort layout) — then replay parquet min/max pruning for a box
    predicate on EACH dimension: a bucket is scanned iff its max scaled
    coordinate reaches the predicate's lower bound. Output per
    (layout, pred_dim): buckets scanned, rows scanned, true matches —
    the numbers showing the 1-D layout prunes only its sort column while
    Z-order prunes both. Morton order per Orenstein & Merrett (1984);
    same min/max data-skipping model as parquet row-group stats /
    Delta-style file stats.

    Scale: one 1-row bounds aggregate broadcast to the scan, one keyed
    shuffle to the ≤128-bucket grain, then arithmetic on ≤256 rows.
    Everything after the first aggregation is constant-size."""
    m = 1 << ZORDER_CELL_BITS
    top = ZORDER_CELL_BITS - ZORDER_GRID_BITS
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("x"),
        F.col("l_extendedprice").cast("double").alias("y"),
    )
    bounds = li.agg(
        F.min("x").alias("xlo"),
        F.max("x").alias("xhi"),
        F.min("y").alias("ylo"),
        F.max("y").alias("yhi"),
    )

    def scaled(col: str, lo: str, hi: str):
        raw = F.floor((F.col(col) - F.col(lo)) / (F.col(hi) - F.col(lo)) * m)
        return (
            F.when(F.col(hi) == F.col(lo), F.lit(0))
            .otherwise(F.least(F.lit(m - 1), F.greatest(F.lit(0), raw)))
            .cast("bigint")
        )

    zb_expr = " + ".join(
        [f"shiftleft(shiftright(sx, {top + i}) & 1, {2 * i})" for i in range(ZORDER_GRID_BITS)]
        + [f"shiftleft(shiftright(sy, {top + i}) & 1, {2 * i + 1})" for i in range(ZORDER_GRID_BITS)]
    )
    cells = (
        li.crossJoin(F.broadcast(bounds))
        .select(
            scaled("x", "xlo", "xhi").alias("sx"),
            scaled("y", "ylo", "yhi").alias("sy"),
        )
        .select(
            "sx",
            "sy",
            F.expr(zb_expr).alias("zb"),
            F.shiftright("sx", ZORDER_CELL_BITS - 2 * ZORDER_GRID_BITS).alias("xb"),
        )
    )

    one_if = lambda c: F.sum(F.when(c, F.lit(1)).otherwise(F.lit(0)))

    def per_bucket(col: str, layout: str):
        return (
            cells.groupBy(F.col(col).alias("bucket"))
            .agg(
                F.count("*").alias("n_rows"),
                F.max("sx").alias("mx"),
                F.max("sy").alias("my"),
                one_if(F.col("sx") >= ZORDER_PRED_LO).alias("match_x"),
                one_if(F.col("sy") >= ZORDER_PRED_LO).alias("match_y"),
            )
            .withColumn("layout", F.lit(layout))
        )

    pb = per_bucket("zb", "zorder").unionByName(per_bucket("xb", "xsort"))
    melted = pb.select(
        "layout",
        "n_rows",
        F.explode(
            F.array(
                F.struct(
                    F.lit("x").alias("pred_dim"),
                    (F.col("mx") >= ZORDER_PRED_LO).alias("scanned"),
                    F.col("match_x").alias("matching"),
                ),
                F.struct(
                    F.lit("y").alias("pred_dim"),
                    (F.col("my") >= ZORDER_PRED_LO).alias("scanned"),
                    F.col("match_y").alias("matching"),
                ),
            )
        ).alias("p"),
    )
    return (
        melted.groupBy("layout", F.col("p.pred_dim").alias("pred_dim"))
        .agg(
            F.count("*").alias("n_buckets"),
            one_if(F.col("p.scanned")).alias("n_buckets_scanned"),
            F.sum(F.when(F.col("p.scanned"), F.col("n_rows")).otherwise(F.lit(0))).alias(
                "rows_scanned"
            ),
            F.sum("n_rows").alias("rows_total"),
            F.sum("p.matching").alias("rows_matching"),
        )
        .withColumn(
            "scan_frac", F.round(F.try_divide(F.col("rows_scanned"), F.col("rows_total")), 4)
        )
    )


# --- join-key skew audit ---------------------------------------------------------------
def q_key_skew_audit(spark, sf_dir):
    """Skew profile of a join key (lineitem.l_suppkey): distinct keys,
    top-1 key share, coefficient of variation, and normalized Shannon
    entropy of the key distribution. This is the audit that decides
    between a plain shuffle join, AQE skew handling, and manual salting
    (cf. salted_hot_key_agg) BEFORE the 100 TB join runs. Two-level
    aggregation: per-key counts (map-side partials), then a single
    reduction over the counts table."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy(SKEW_KEY).agg(F.count("*").alias("cnt"))
    tot = counts.agg(F.sum("cnt").alias("total"), F.count("*").alias("nk"))
    p = F.col("cnt") / F.col("total")
    return counts.crossJoin(F.broadcast(tot)).agg(
        F.first("nk").alias("n_keys"),
        F.first("total").alias("n_rows"),
        F.round(F.max("cnt") / F.first("total"), 6).alias("top1_share"),
        F.round(F.stddev_pop("cnt") / F.avg("cnt"), 6).alias("cv"),
        F.round((-F.sum(p * F.log(p))) / F.log(F.first("nk")), 6).alias("entropy_norm"),
    )


# --- A/B experiment: Welch t-test ------------------------------------------------------
def q_ab_test_welch(spark, sf_dir):
    """A/B experiment readout: users are deterministically assigned to
    variant A/B by md5(user_id) parity, the per-user metric is the mean
    event value, and the variants are compared with a Welch t-test
    (unequal variances). One pass to the user grain, one 2-row variant
    aggregate, driver-free scalar math via a self-pivot — the experiment
    analysis every growth pipeline runs, expressed as pure aggregation."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.avg("value").alias("metric"))
    variant = (
        F.expr("CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 2")
    ).alias("variant")
    stats = (
        per_user.select(variant, "metric")
        .groupBy("variant")
        .agg(
            F.count("*").alias("n"),
            F.avg("metric").alias("mean"),
            F.var_samp("metric").alias("var"),
        )
    )
    a = stats.filter(F.col("variant") == 0).select(
        F.col("n").alias("n_a"), F.col("mean").alias("mean_a"), F.col("var").alias("var_a")
    )
    b = stats.filter(F.col("variant") == 1).select(
        F.col("n").alias("n_b"), F.col("mean").alias("mean_b"), F.col("var").alias("var_b")
    )
    se = F.sqrt(F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b"))
    return a.crossJoin(F.broadcast(b)).select(
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round((F.col("mean_a") - F.col("mean_b")) / se, 4).alias("t_stat"),
    )


AB_CONV_MIN_PURCHASES = 14  # ~median purchases/user: a real 50/50 split


def q_ab_test_proportions(spark, sf_dir):
    """A/B conversion readout: the two-proportion pooled z-test on
    purchase conversion (>= AB_CONV_MIN_PURCHASES purchases, the
    fixture's median split), the
    categorical-outcome complement of q_ab_test_welch's means test. Same
    deterministic md5-parity assignment; every input to the z is an
    exact integer (user and converter counts), so the statistic is
    hash-exact cross-engine. One pass to the user grain, a 2-row variant
    aggregate, then the same self-pivot fold."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        (
            F.sum((F.col("event_type") == "purchase").cast("int"))
            >= AB_CONV_MIN_PURCHASES
        ).cast("int").alias("conv")
    )
    variant = (
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) "
            "AS BIGINT) % 2"
        )
    ).alias("variant")
    stats = (
        per_user.select(variant, "conv")
        .groupBy("variant")
        .agg(F.count("*").alias("n"), F.sum("conv").alias("c"))
    )
    a = stats.filter(F.col("variant") == 0).select(
        F.col("n").alias("n_a"), F.col("c").alias("conv_a")
    )
    b = stats.filter(F.col("variant") == 1).select(
        F.col("n").alias("n_b"), F.col("c").alias("conv_b")
    )
    p_a = F.col("conv_a") / F.col("n_a")
    p_b = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(
        pool * (F.lit(1.0) - pool)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return a.crossJoin(F.broadcast(b)).select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round(F.try_divide(p_a - p_b, se), 4).alias("z_stat"),
    )


# --- exact rolling distinct users ------------------------------------------------------
def q_rolling_active_users(spark, sf_dir):
    """Exact rolling 7-day active users per day. Spark windows cannot
    express COUNT(DISTINCT) over a range frame, so the (user, day) grain
    is exploded to the ROLL_DAYS target days each activity contributes to
    — a fixed 7× inflation of the deduplicated grain, then one
    count-distinct shuffle per day. Trailing days beyond the data's edge
    carry partial windows by construction (both engines agree). For
    unbounded window lengths use the mergeable-sketch twin
    (hll_multigrain_rollup) instead of exact expansion."""
    ev = _t(spark, sf_dir, "events")
    ud = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    return (
        ud.select(
            F.explode(
                F.expr(f"sequence(d, date_add(d, {ROLL_DAYS - 1}), interval 1 day)")
            ).alias("day"),
            "user_id",
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy("day")
    )


# --- incremental aggregate maintenance -------------------------------------------------
def q_incremental_agg_merge(spark, sf_dir):
    """Materialized-view maintenance: a monthly revenue aggregate is kept
    as algebraic partial state (count, sum) for orders before INC_CUTOFF;
    the new batch (orders on/after the cutoff) is aggregated alone and
    MERGED into the state — counts add, sums add, avg derives from the
    merged pair. The result provably equals the full recompute (the
    oracle), which is the whole point: at 100 TB you scan the delta, not
    the base. Non-algebraic metrics (distinct, percentiles) use the
    mergeable-sketch twins (hll_partial_merge, approx percentiles)."""
    orders = _t(spark, sf_dir, "orders")
    month = F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("month")
    cutoff = F.lit(INC_CUTOFF).cast("timestamp")

    def partial(df):
        return df.groupBy(month).agg(
            F.count("*").alias("cnt"), F.sum("o_totalprice").alias("s")
        )

    state = partial(orders.filter(F.col("o_orderdate") < cutoff))
    delta = partial(orders.filter(F.col("o_orderdate") >= cutoff))
    return (
        state.unionByName(delta)
        .groupBy("month")
        .agg(F.sum("cnt").alias("n_orders"), F.sum("s").alias("s"))
        .select(
            "month",
            "n_orders",
            F.round("s", 2).alias("sum_price"),
            F.round(F.col("s") / F.col("n_orders"), 4).alias("avg_price"),
        )
        .drop("s")
    )


# --- Pareto frontier (2-D skyline) -----------------------------------------------------
PARETO_BUCKETS = 32


def q_pareto_frontier(spark, sf_dir):
    """2-D Pareto frontier (skyline) of parts minimizing (p_retailprice,
    p_size): the parts no other part beats on both axes. Never compares
    point pairs. x (price) is cut into PARETO_BUCKETS equi-width buckets
    (monotone binning ⇒ bucket order respects x order), so a dominator
    is either (a) in a strictly earlier bucket — handled by a B-row
    bucket-prefix-min table (tiny non-equi self-join, broadcast), or
    (b) in the same bucket — handled by a window PARTITIONED BY bucket
    over the distinct-x grain (strict-x prefix min via lag of the running
    min). The O(n²) NOT EXISTS exists only as the DuckDB oracle."""
    pts = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("x"),
        F.col("p_size").cast("double").alias("y"),
    )
    bounds = pts.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / PARETO_BUCKETS
    pb = pts.crossJoin(F.broadcast(bounds)).select(
        "p_partkey",
        "x",
        "y",
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(F.floor((F.col("x") - F.col("lo")) / width), F.lit(PARETO_BUCKETS - 1))
        )
        .cast("bigint")
        .alias("b"),
    )
    # (a) cross-bucket: min y of every strictly earlier bucket (B rows).
    bmin = pb.groupBy("b").agg(F.min("y").alias("bmin_y"))
    prev = bmin.select(F.col("b").alias("pb"), F.col("bmin_y").alias("py"))
    prefix = (
        bmin.join(F.broadcast(prev), F.col("pb") < F.col("b"), "left")
        .groupBy("b")
        .agg(F.min("py").alias("prefix_min_y"))
    )
    # (b) intra-bucket, on the distinct-x grain: strict-x prefix min.
    xg = pb.groupBy("b", "x").agg(F.min("y").alias("gy"))
    w = Window.partitionBy("b").orderBy("x")
    xg = xg.withColumn(
        "strict_min_y", F.lag(F.min("gy").over(w.rowsBetween(Window.unboundedPreceding, 0))).over(w)
    )
    dominated = (
        F.least(
            F.coalesce(F.col("strict_min_y"), F.lit(float("inf"))),
            F.coalesce(F.col("prefix_min_y"), F.lit(float("inf"))),
        )
        <= F.col("y")
    ) | (F.col("gy") < F.col("y"))
    return (
        pb.join(xg, ["b", "x"])
        .join(F.broadcast(prefix), "b")
        .filter(~dominated)
        .select("p_partkey", F.round("x", 2).alias("price"), F.col("y").cast("int").alias("size"))
        .orderBy("price", "size", "p_partkey")
    )


# --- weighted reservoir sampling (Efraimidis-Spirakis) ---------------------------------
def q_weighted_sample_topk(spark, sf_dir):
    """Weighted sampling without replacement, per source: Efraimidis-
    Spirakis A-Res — each doc draws u ∈ (0,1] from a deterministic md5
    coin and gets key ln(u)/w (w = n_chars); the top-K keys per source
    are exactly a weighted sample without replacement. One scan + one
    per-group top-k window; no global sort, no rejection loop, and the
    md5 coin makes the draw reproducible across engines and reruns (the
    importance_sample / dataset_split discipline)."""
    docs = _t(spark, sf_dir, "documents")
    h = F.expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)")
    u = (h + 1) / F.lit(_MD5_RANGE)  # (0, 1]
    keyed = docs.select(
        "source",
        "doc_id",
        "n_chars",
        (F.log(u) / F.col("n_chars")).alias("k"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("k"), "doc_id")
    return (
        keyed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= WSAMPLE_K)
        .select("source", "rk", "doc_id", "n_chars", F.round("k", 8).alias("sample_key"))
        .orderBy("source", "rk")
    )


# --- distributed Bloom-filter semi-join prefilter --------------------------------------
BLOOM_BITS = 1 << 16  # m: filter size in bits (2048 32-bit words; shifts stay sign-safe)
BLOOM_K = 4  # probes per key
BLOOM_SEGMENT = "AUTOMOBILE"  # build side: customers in this segment


def q_bloom_prefilter_semijoin(spark, sf_dir):
    """Distributed Bloom-filter semi-join prefilter — the runtime-filter
    pattern that cuts a 100 TB probe scan before the real join: build a
    Bloom filter over the small side's keys (customers in one segment),
    ship it as a 2048-row word table (bit_or per 32-bit word — mergeable,
    combiner-friendly), and probe every distinct order custkey with
    BLOOM_K double-hashed bits. Reports the measured false-positive rate
    against the exact semi-join. No false negatives by construction; the
    md5 double-hash (h1 + i·h2 mod m) makes the filter bit-identical in
    both engines. At scale the word table replaces shuffling the whole
    probe side into a join that drops most of it."""
    cust = _t(spark, sf_dir, "customer")
    build = cust.filter(F.col("c_mktsegment") == BLOOM_SEGMENT).select(
        F.col("c_custkey").alias("key")
    )
    h1 = F.expr("CAST(conv(substring(md5(CAST(key AS STRING)), 1, 8), 16, 10) AS BIGINT)")
    h2 = F.expr("CAST(conv(substring(md5(CAST(key AS STRING)), 9, 8), 16, 10) AS BIGINT)")

    def probe_bits(df):
        return (
            df.select("key", h1.alias("h1"), h2.alias("h2"))
            .select(
                "key",
                F.explode(
                    F.expr(
                        f"transform(sequence(0, {BLOOM_K - 1}),"
                        f" i -> pmod(h1 + i * h2, {BLOOM_BITS}))"
                    )
                ).alias("bit"),
            )
            .select(
                "key",
                (F.col("bit") / 32).cast("bigint").alias("word"),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 32 AS INT))").alias("mask"),
            )
        )

    words = probe_bits(build).groupBy("word").agg(F.bit_or("mask").alias("w"))
    probe_keys = (
        _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("key")).distinct()
    )
    member = (
        probe_bits(probe_keys)
        .join(F.broadcast(words), "word", "left")
        .groupBy("key")
        .agg(
            F.min(
                (F.coalesce(F.col("w"), F.lit(0)).bitwiseAND(F.col("mask")) == F.col("mask"))
                .cast("int")
            ).alias("pass_all")
        )
    )
    exact = build.distinct().select("key", F.lit(1).alias("is_true"))
    # no broadcast hint on `exact`: the build side is a segment of
    # customer, which grows with SF (round-7 fix) — AQE decides
    joined = member.join(exact, "key", "left").select(
        "pass_all", F.coalesce("is_true", F.lit(0)).alias("is_true")
    )
    return joined.agg(
        F.count("*").alias("n_probe_keys"),
        F.sum("pass_all").alias("n_bloom_pass"),
        F.sum("is_true").alias("n_true_members"),
        F.sum(F.col("pass_all") * (1 - F.col("is_true"))).alias("n_false_pos"),
        F.round(
            F.sum(F.col("pass_all") * (1 - F.col("is_true")))
            / F.sum(1 - F.col("is_true")),
            6,
        ).alias("fpr"),
    )


# --- CUSUM change-point detection ------------------------------------------------------
def q_events_cusum_changepoint(spark, sf_dir):
    """CUSUM change-point detection on the daily event-count series, per
    event type: the running sum of deviations from the series mean peaks
    (in absolute value) at the most likely level-shift day. The series is
    first reduced to the (type, day) grain — tiny — so the windows
    (running sum, arg-max) partition by event_type over at most
    |types|×|days| rows regardless of raw event volume. The monitoring
    pass that catches an ingest-rate regime change."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    means = daily.groupBy("event_type").agg(F.avg("n").alias("mu"))
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cusum = (
        daily.join(means, "event_type")
        .withColumn("cusum", F.sum(F.col("n") - F.col("mu")).over(w_run))
    )
    w_pick = Window.partitionBy("event_type").orderBy(F.desc(F.abs(F.col("cusum"))), "day")
    return (
        cusum.withColumn("rk", F.row_number().over(w_pick))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("changepoint_day"),
            F.round("mu", 4).alias("daily_mean"),
            F.round(F.abs(F.col("cusum")), 4).alias("max_cusum_dev"),
        )
        .orderBy("event_type")
    )


# --- time-weighted average -------------------------------------------------------------
def q_events_time_weighted_avg(spark, sf_dir):
    """Per-user time-weighted average of the event value: each reading
    holds until the user's next event (step interpolation), so the mean
    weights each value by its holding duration — the TWAP/telemetry
    aggregation a last-value-carried-forward pipeline needs. One window
    (lead ts, PARTITIONED BY user) + one keyed aggregation; durations are
    exact integer milliseconds (no float time math); users with a single
    event have no holding interval and drop out in both engines."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis("ts")
    held = ev.select(
        "user_id",
        "value",
        (F.lead(ms).over(w) - ms).alias("dt"),
    ).filter(F.col("dt").isNotNull())
    return (
        held.groupBy("user_id")
        .agg(
            F.count("*").alias("n_intervals"),
            F.round(F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 6).alias("twa_value"),
            F.round(F.avg("value"), 6).alias("plain_avg"),
        )
        .orderBy("user_id")
    )


# --- EWMA smoothing --------------------------------------------------------------------
EWMA_ALPHA = 0.3
# Safe series-length ceiling for the closed form: (1-α)^(-rn) overflows
# double to inf around rn ≈ 2070 at α=0.3 (and loses relative precision
# well before). Series longer than this must fail LOUD, not smear
# inf/NaN into the output (ADVICE r4); the guard fires inline in both
# engines. Unbounded series belong to the stateful streaming twin.
EWMA_MAX_SERIES = 1500


def q_events_ewma(spark, sf_dir):
    """Exponentially-weighted moving average of the daily event count,
    per event type — the smoothing/forecast baseline next to the CUSUM
    detector. The recursive definition ewma_t = α·x_t + (1−α)·ewma_{t−1}
    is closed-form over a running sum: ewma_t = α(1−α)^t·Σ_{s≤t}
    x_s(1−α)^{−s} + (1−α)^t·x_1, so one window (PARTITIONED BY type)
    computes the whole series with no recursion. The (1−α)^{−s} factor
    grows with series length — exact for bounded reporting windows like
    this daily grain, and ENFORCED bounded: any series longer than
    EWMA_MAX_SERIES raises (raise_error / DuckDB error()) instead of
    overflowing to inf/NaN. Unbounded streams use the stateful streaming
    twin (streaming/ewma.py: applyInPandasWithState keeps ewma as one
    double of state per key — tests/test_streaming_ewma.py proves
    stream == recursion == this closed form)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    staged = daily.withColumn("rn", F.row_number().over(w)).withColumn(
        "term", F.col("n") * F.pow(F.lit(1 - EWMA_ALPHA), -F.col("rn"))
    )
    decay = F.pow(F.lit(1 - EWMA_ALPHA), F.col("rn"))
    s_run = F.sum("term").over(w_run)
    first_x = F.first("n").over(w_run)
    ewma = F.round(F.lit(EWMA_ALPHA) * decay * s_run + decay * first_x, 4)
    guarded = F.when(
        F.col("rn") > EWMA_MAX_SERIES,
        F.expr(
            "raise_error('events_ewma: series exceeds "
            f"{EWMA_MAX_SERIES} points - closed form would overflow; "
            "use the stateful streaming twin or a bounded reporting "
            "window') IS NULL"
        ).cast("double"),
    ).otherwise(ewma)
    return staged.select(
        "event_type",
        "day",
        "n",
        guarded.alias("ewma"),
    ).orderBy("event_type", "day")


# --- Theil-Sen robust trend ------------------------------------------------------------
SLOPE_SCALE = 1_000_000  # slope quantization grain (1e-6 = reported precision)
def q_events_trend_theilsen(spark, sf_dir):
    """Theil-Sen robust trend of daily event volume per type: the median
    of all pairwise slopes (y_j − y_i)/(day_j − day_i) — immune to the
    outlier days that wreck least squares. The pair join is keyed on
    event_type over the DAILY grain (|days|² pairs per type, bounded by
    the reporting window, never raw-event-sized). Output: slope per type
    plus the OLS slope for comparison.

    Round 8 (closing the float-percentile scale gap): the slope median
    uses the COUNT-DISTRIBUTION method over slopes QUANTIZED to the
    1e-6 reporting grain (SLOPE_SCALE — the previous form rounded the
    exact median to 6 dp anyway, so the stated grain matches the
    reported precision). |days|² pairs per type is window-bounded, but
    a long retention window times a hot type made the one-buffer-per-
    group ``percentile`` the last non-anchor buffering aggregate in the
    fleet; the distribution pass buffers nothing per group. The median
    is emitted as grain/1e-6 with NO final round: grain cuts at p=0.5
    are exact integer-or-half doubles, so both engines produce the
    bit-identical quotient and a ROUND decimal-tie can never flip."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n")
    )
    a = daily.select("event_type", F.col("day").alias("d1"), F.col("n").alias("y1"))
    b = daily.select("event_type", F.col("day").alias("d2"), F.col("n").alias("y2"))
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("d1") < F.col("d2"))
        .select(
            "event_type",
            ((F.col("y2") - F.col("y1")) / F.datediff("d2", "d1")).alias("slope"),
        )
    )
    from ..functions.quantiles import distribution_quantiles

    ts = distribution_quantiles(
        slopes, "event_type", "slope", (0.5,), scale=SLOPE_SCALE, grain_space=True
    ).select(
        "event_type",
        (F.col("q0") / F.lit(float(SLOPE_SCALE))).alias("theilsen_slope"),
        F.col("n_rows").alias("n_pairs"),
    )
    ols = daily.groupBy("event_type").agg(
        F.round(
            F.covar_pop(F.datediff("day", F.lit("2024-01-01").cast("date")), "n")
            / F.var_pop(F.datediff("day", F.lit("2024-01-01").cast("date"))),
            6,
        ).alias("ols_slope")
    )
    return ts.join(ols, "event_type").orderBy("event_type")


# --- population stability index --------------------------------------------------------
PSI_BINS = 10
PSI_YEAR_P, PSI_YEAR_Q = 1996, 1997


def q_price_psi_drift(spark, sf_dir):
    """Population Stability Index of the order-total distribution between
    two periods (1996 vs 1997) — the drift metric scoring models and
    ingest monitors alarm on (rule of thumb: <0.1 stable, >0.25 shifted).
    Global equi-width bins from a broadcast 1-row bounds aggregate;
    Laplace-smoothed shares ((c+1)/(n+B)) so empty bins never divide by
    zero; PSI = Σ (p−q)·ln(p/q) over the B-row bin table. Three scans of
    the filtered column, one tiny shuffle."""
    o = _t(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"), F.col("o_totalprice").alias("x")
    ).filter(F.col("yr").isin(PSI_YEAR_P, PSI_YEAR_Q))
    bounds = o.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / PSI_BINS
    binned = o.crossJoin(F.broadcast(bounds)).select(
        "yr",
        F.least(F.floor((F.col("x") - F.col("lo")) / width), F.lit(PSI_BINS - 1))
        .cast("bigint")
        .alias("bin"),
    )
    per = (
        binned.groupBy("bin")
        .agg(
            F.sum((F.col("yr") == PSI_YEAR_P).cast("int")).alias("c_p"),
            F.sum((F.col("yr") == PSI_YEAR_Q).cast("int")).alias("c_q"),
        )
    )
    tot = per.agg(F.sum("c_p").alias("n_p"), F.sum("c_q").alias("n_q"))
    p = (F.col("c_p") + 1) / (F.col("n_p") + PSI_BINS)
    q = (F.col("c_q") + 1) / (F.col("n_q") + PSI_BINS)
    return per.crossJoin(F.broadcast(tot)).agg(
        F.first("n_p").alias("n_p"),
        F.first("n_q").alias("n_q"),
        F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"),
    )


# --- Benford first-digit audit ---------------------------------------------------------
def q_benford_audit(spark, sf_dir):
    """Benford's-law audit of order totals: observed first-significant-
    digit shares vs the log10(1+1/d) expectation, with each digit's
    chi-square contribution — the data-quality screen for fabricated or
    truncated numeric columns. The first digit comes from the DECIMAL
    string rendering (exact in both engines; floor(log10(x)) is NOT used
    because libm rounding at exact powers of ten flips the digit). One
    scan, one 9-row aggregate."""
    o = _t(spark, sf_dir, "orders")
    digit = F.substring(
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1
    ).cast("int")
    per = o.select(digit.alias("digit")).groupBy("digit").agg(F.count("*").alias("n_obs"))
    tot = per.agg(F.sum("n_obs").alias("n"))
    expected = F.log10(1 + 1 / F.col("digit"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_obs",
            F.round(F.col("n_obs") / F.col("n"), 6).alias("obs_share"),
            F.round(expected, 6).alias("benford_share"),
            F.round(
                F.pow(F.col("n_obs") - F.col("n") * expected, 2) / (F.col("n") * expected),
                4,
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


# --- consistent-hashing rebalance audit ------------------------------------------------
CH_BUCKETS = 8  # shard count before scale-out (after: CH_BUCKETS + 1)


def q_consistent_hash_rebalance(spark, sf_dir):
    """Shard-rebalance audit: when a cluster grows from N to N+1 shards,
    what fraction of keys move under (a) modulo placement (~N/(N+1) — a
    full reshuffle) vs (b) HRW/rendezvous hashing (~1/(N+1) — only the
    keys the new shard claims)? Computed exactly over the distinct order
    custkeys with the deterministic md5 coin. Per key the HRW winner is
    an argmax over a BOUNDED bucket list (explode ≤ N+1 rows per key,
    then one per-key window) — the placement lesson behind every shuffle
    partitioner and the engine's own bucketing (operators/bucketing.py).
    Output: one row with both movement shares; modulo's reshuffle cost
    is the reason bucket counts are chosen once and kept."""
    keys = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key")
    ).distinct()
    kh = "CAST(conv(substring(md5(CAST(key AS STRING)), 1, 15), 16, 10) AS BIGINT)"
    mod = keys.select(
        "key",
        F.expr(f"{kh} % {CH_BUCKETS}").alias("before"),
        F.expr(f"{kh} % {CH_BUCKETS + 1}").alias("after"),
    )

    def hrw(n):
        # per-(key, bucket) weight; argmax bucket wins the key
        return (
            keys.select(
                "key",
                F.explode(F.expr(f"sequence(0, {n - 1})")).alias("b"),
            )
            .withColumn(
                "w",
                F.expr(
                    "CAST(conv(substring(md5(concat(CAST(key AS STRING), '#', "
                    "CAST(b AS STRING))), 1, 15), 16, 10) AS BIGINT)"
                ),
            )
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("key").orderBy(F.desc("w"), "b")
                ),
            )
            .filter(F.col("rk") == 1)
            .select("key", F.col("b").alias("bucket"))
        )

    h_before = hrw(CH_BUCKETS).withColumnRenamed("bucket", "hb")
    h_after = hrw(CH_BUCKETS + 1).withColumnRenamed("bucket", "ha")
    joined = (
        mod.join(h_before, "key")
        .join(h_after, "key")
        .select(
            (F.col("before") != F.col("after")).cast("int").alias("moved_mod"),
            (F.col("hb") != F.col("ha")).cast("int").alias("moved_hrw"),
        )
    )
    return joined.agg(
        F.count("*").alias("n_keys"),
        F.round(F.avg("moved_mod"), 4).alias("moved_mod_share"),
        F.round(F.avg("moved_hrw"), 4).alias("moved_hrw_share"),
    )


QUERIES = {
    "histogram_equiwidth": q_histogram_equiwidth,
    "consistent_hash_rebalance": q_consistent_hash_rebalance,
    "bloom_prefilter_semijoin": q_bloom_prefilter_semijoin,
    "events_ewma": q_events_ewma,
    "events_trend_theilsen": q_events_trend_theilsen,
    "price_psi_drift": q_price_psi_drift,
    "benford_audit": q_benford_audit,
    "events_cusum_changepoint": q_events_cusum_changepoint,
    "events_time_weighted_avg": q_events_time_weighted_avg,
    "key_skew_audit": q_key_skew_audit,
    "zorder_pruning_audit": q_zorder_pruning_audit,
    "ab_test_welch": q_ab_test_welch,
    "ab_test_proportions": q_ab_test_proportions,
    "rolling_active_users": q_rolling_active_users,
    "incremental_agg_merge": q_incremental_agg_merge,
    "pareto_frontier": q_pareto_frontier,
    "weighted_sample_topk": q_weighted_sample_topk,
}

_ZB_DUCK = " + ".join(
    [
        f"(((sx >> {(ZORDER_CELL_BITS - ZORDER_GRID_BITS) + i}) & 1) << {2 * i})"
        for i in range(ZORDER_GRID_BITS)
    ]
    + [
        f"(((sy >> {(ZORDER_CELL_BITS - ZORDER_GRID_BITS) + i}) & 1) << {2 * i + 1})"
        for i in range(ZORDER_GRID_BITS)
    ]
)

ORACLES = {
    "zorder_pruning_audit": f"""
        WITH bounds AS (
            SELECT MIN(l_quantity) AS xlo, MAX(l_quantity) AS xhi,
                   MIN(l_extendedprice) AS ylo, MAX(l_extendedprice) AS yhi
            FROM lineitem
        ),
        cells0 AS (
            SELECT
                CASE WHEN xhi = xlo THEN 0 ELSE
                    LEAST({(1 << ZORDER_CELL_BITS) - 1}, GREATEST(0, CAST(FLOOR(
                        (l_quantity - xlo) / (xhi - xlo) * {1 << ZORDER_CELL_BITS}
                    ) AS BIGINT))) END AS sx,
                CASE WHEN yhi = ylo THEN 0 ELSE
                    LEAST({(1 << ZORDER_CELL_BITS) - 1}, GREATEST(0, CAST(FLOOR(
                        (l_extendedprice - ylo) / (yhi - ylo) * {1 << ZORDER_CELL_BITS}
                    ) AS BIGINT))) END AS sy
            FROM lineitem CROSS JOIN bounds
        ),
        cells AS (
            SELECT sx, sy, {_ZB_DUCK} AS zb,
                   (sx >> {ZORDER_CELL_BITS - 2 * ZORDER_GRID_BITS}) AS xb
            FROM cells0
        ),
        pb AS (
            SELECT 'zorder' AS layout, zb AS bucket, COUNT(*) AS n_rows,
                   MAX(sx) AS mx, MAX(sy) AS my,
                   SUM(CASE WHEN sx >= {ZORDER_PRED_LO} THEN 1 ELSE 0 END) AS match_x,
                   SUM(CASE WHEN sy >= {ZORDER_PRED_LO} THEN 1 ELSE 0 END) AS match_y
            FROM cells GROUP BY 2
            UNION ALL
            SELECT 'xsort', xb, COUNT(*),
                   MAX(sx), MAX(sy),
                   SUM(CASE WHEN sx >= {ZORDER_PRED_LO} THEN 1 ELSE 0 END),
                   SUM(CASE WHEN sy >= {ZORDER_PRED_LO} THEN 1 ELSE 0 END)
            FROM cells GROUP BY 2
        ),
        melted AS (
            SELECT layout, 'x' AS pred_dim, n_rows,
                   (mx >= {ZORDER_PRED_LO}) AS scanned, match_x AS matching
            FROM pb
            UNION ALL
            SELECT layout, 'y', n_rows, (my >= {ZORDER_PRED_LO}), match_y FROM pb
        )
        SELECT layout, pred_dim,
               COUNT(*) AS n_buckets,
               SUM(CASE WHEN scanned THEN 1 ELSE 0 END) AS n_buckets_scanned,
               SUM(CASE WHEN scanned THEN n_rows ELSE 0 END) AS rows_scanned,
               SUM(n_rows) AS rows_total,
               SUM(matching) AS rows_matching,
               ROUND(SUM(CASE WHEN scanned THEN n_rows ELSE 0 END)
                     / SUM(n_rows), 4) AS scan_frac
        FROM melted GROUP BY 1, 2
    """,
    "histogram_equiwidth": f"""
        WITH bounds AS (
            SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
        ),
        binned AS (
            SELECT CASE WHEN hi = lo THEN 0
                        ELSE LEAST(CAST(FLOOR((o_totalprice - lo) / ((hi - lo) / {HIST_BINS}))
                                        AS BIGINT), {HIST_BINS - 1}) END AS bin,
                   lo, hi
            FROM orders, bounds
        )
        SELECT bin, COUNT(*) AS n,
               ROUND(MIN(lo + bin * (hi - lo) / {HIST_BINS}), 4) AS bin_lo,
               ROUND(MIN(lo + (bin + 1) * (hi - lo) / {HIST_BINS}), 4) AS bin_hi
        FROM binned GROUP BY bin ORDER BY bin
    """,
    "consistent_hash_rebalance": f"""
        WITH keys AS (SELECT DISTINCT o_custkey AS key FROM orders),
        mod AS (
            SELECT key,
                   CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15) AS BIGINT)
                     % {CH_BUCKETS} AS before,
                   CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15) AS BIGINT)
                     % {CH_BUCKETS + 1} AS after
            FROM keys
        ),
        wb AS (
            SELECT key, b,
                   CAST('0x' || substr(md5(CAST(key AS VARCHAR) || '#'
                                           || CAST(b AS VARCHAR)), 1, 15) AS BIGINT) AS w
            FROM keys, (SELECT UNNEST(generate_series(0, {CH_BUCKETS})) AS b)
        ),
        hb AS (
            SELECT key, b AS hb FROM (
                SELECT key, b, ROW_NUMBER() OVER (PARTITION BY key
                                                  ORDER BY w DESC, b) AS rk
                FROM wb WHERE b < {CH_BUCKETS}
            ) WHERE rk = 1
        ),
        ha AS (
            SELECT key, b AS ha FROM (
                SELECT key, b, ROW_NUMBER() OVER (PARTITION BY key
                                                  ORDER BY w DESC, b) AS rk
                FROM wb
            ) WHERE rk = 1
        )
        SELECT COUNT(*) AS n_keys,
               ROUND(AVG(CASE WHEN m.before != m.after THEN 1 ELSE 0 END), 4)
                 AS moved_mod_share,
               ROUND(AVG(CASE WHEN hb.hb != ha.ha THEN 1 ELSE 0 END), 4)
                 AS moved_hrw_share
        FROM mod m JOIN hb USING (key) JOIN ha USING (key)
    """,
    "bloom_prefilter_semijoin": f"""
        WITH build AS (
            SELECT c_custkey AS key FROM customer WHERE c_mktsegment = '{BLOOM_SEGMENT}'
        ),
        build_bits AS (
            SELECT key,
                   (CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 8) AS BIGINT)
                    + i * CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 9, 8) AS BIGINT))
                   % {BLOOM_BITS} AS bit
            FROM build, (SELECT UNNEST(generate_series(0, {BLOOM_K - 1})) AS i)
        ),
        words AS (
            SELECT (bit // 32) AS word,
                   BIT_OR(CAST(1 AS BIGINT) << CAST(bit % 32 AS INTEGER)) AS w
            FROM build_bits GROUP BY 1
        ),
        probe AS (SELECT DISTINCT o_custkey AS key FROM orders),
        probe_bits AS (
            SELECT key,
                   (CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 8) AS BIGINT)
                    + i * CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 9, 8) AS BIGINT))
                   % {BLOOM_BITS} AS bit
            FROM probe, (SELECT UNNEST(generate_series(0, {BLOOM_K - 1})) AS i)
        ),
        member AS (
            SELECT pb.key,
                   MIN(CASE WHEN (COALESCE(wd.w, 0)
                                  & (CAST(1 AS BIGINT) << CAST(pb.bit % 32 AS INTEGER)))
                                 = (CAST(1 AS BIGINT) << CAST(pb.bit % 32 AS INTEGER))
                            THEN 1 ELSE 0 END) AS pass_all
            FROM probe_bits pb
            LEFT JOIN words wd ON wd.word = (pb.bit // 32)
            GROUP BY pb.key
        ),
        joined AS (
            SELECT m.pass_all,
                   CASE WHEN b.key IS NULL THEN 0 ELSE 1 END AS is_true
            FROM member m LEFT JOIN (SELECT DISTINCT key FROM build) b USING (key)
        )
        SELECT COUNT(*) AS n_probe_keys,
               CAST(SUM(pass_all) AS BIGINT) AS n_bloom_pass,
               CAST(SUM(is_true) AS BIGINT) AS n_true_members,
               CAST(SUM(pass_all * (1 - is_true)) AS BIGINT) AS n_false_pos,
               ROUND(SUM(pass_all * (1 - is_true)) / SUM(1 - is_true), 6) AS fpr
        FROM joined
    """,
    "events_ewma": f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        staged AS (
            SELECT event_type, day, n,
                   ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
            FROM daily
        ),
        runs AS (
            SELECT event_type, day, n, rn,
                   SUM(n * POWER({1 - EWMA_ALPHA}, -rn))
                     OVER (PARTITION BY event_type ORDER BY day
                           ROWS UNBOUNDED PRECEDING) AS s_run,
                   FIRST_VALUE(n) OVER (PARTITION BY event_type ORDER BY day
                                        ROWS UNBOUNDED PRECEDING) AS first_x
            FROM staged
        )
        SELECT event_type, day, n,
               CASE WHEN rn > {EWMA_MAX_SERIES}
                    THEN error('events_ewma: series exceeds safe closed-form length')
                    ELSE ROUND({EWMA_ALPHA} * POWER({1 - EWMA_ALPHA}, rn) * s_run
                               + POWER({1 - EWMA_ALPHA}, rn) * first_x, 4) END AS ewma
        FROM runs ORDER BY event_type, day
    """,
    "events_trend_theilsen": f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        slopes AS (
            SELECT a.event_type,
                   (b.n - a.n) / CAST(b.day - a.day AS DOUBLE) AS slope
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND a.day < b.day
        ),
        ts AS (
            SELECT event_type,
                   q0 / {float(SLOPE_SCALE)!r} AS theilsen_slope,
                   n_rows AS n_pairs
            FROM ({distribution_quantiles_duck(
                "SELECT event_type, slope FROM slopes",
                "event_type",
                "slope",
                (0.5,),
                scale=SLOPE_SCALE,
                grain_space=True,
            )})
        ),
        ols AS (
            SELECT event_type,
                   ROUND(COVAR_POP(day - DATE '2024-01-01', n)
                         / VAR_POP(day - DATE '2024-01-01'), 6) AS ols_slope
            FROM daily GROUP BY 1
        )
        SELECT ts.event_type, ts.theilsen_slope, ts.n_pairs, ols.ols_slope
        FROM ts JOIN ols USING (event_type) ORDER BY ts.event_type
    """,
    "price_psi_drift": f"""
        WITH o AS (
            SELECT EXTRACT(year FROM o_orderdate) AS yr, o_totalprice AS x
            FROM orders
            WHERE EXTRACT(year FROM o_orderdate) IN ({PSI_YEAR_P}, {PSI_YEAR_Q})
        ),
        bounds AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM o),
        binned AS (
            SELECT yr,
                   LEAST(CAST(FLOOR((x - lo) / ((hi - lo) / {PSI_BINS})) AS BIGINT),
                         {PSI_BINS - 1}) AS bin
            FROM o, bounds
        ),
        per AS (
            SELECT bin,
                   CAST(SUM(CASE WHEN yr = {PSI_YEAR_P} THEN 1 ELSE 0 END) AS BIGINT) AS c_p,
                   CAST(SUM(CASE WHEN yr = {PSI_YEAR_Q} THEN 1 ELSE 0 END) AS BIGINT) AS c_q
            FROM binned GROUP BY bin
        ),
        tot AS (
            SELECT CAST(SUM(c_p) AS BIGINT) AS n_p, CAST(SUM(c_q) AS BIGINT) AS n_q
            FROM per
        )
        SELECT MIN(n_p) AS n_p, MIN(n_q) AS n_q,
               ROUND(SUM(((c_p + 1.0) / (n_p + {PSI_BINS}) - (c_q + 1.0) / (n_q + {PSI_BINS}))
                         * LN(((c_p + 1.0) / (n_p + {PSI_BINS}))
                              / ((c_q + 1.0) / (n_q + {PSI_BINS})))), 6) AS psi
        FROM per, tot
    """,
    "benford_audit": """
        WITH per AS (
            SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
                        AS INTEGER) AS digit,
                   COUNT(*) AS n_obs
            FROM orders GROUP BY 1
        ),
        tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM per)
        SELECT digit, n_obs,
               ROUND(n_obs / CAST(n AS DOUBLE), 6) AS obs_share,
               ROUND(LOG10(1 + 1.0 / digit), 6) AS benford_share,
               ROUND(POWER(n_obs - n * LOG10(1 + 1.0 / digit), 2)
                     / (n * LOG10(1 + 1.0 / digit)), 4) AS chi2_term
        FROM per, tot ORDER BY digit
    """,
    "events_cusum_changepoint": """
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        ),
        means AS (
            SELECT event_type, AVG(n) AS mu FROM daily GROUP BY 1
        ),
        cusum AS (
            SELECT d.event_type, d.day, m.mu,
                   SUM(d.n - m.mu) OVER (PARTITION BY d.event_type ORDER BY d.day
                                         ROWS UNBOUNDED PRECEDING) AS c
            FROM daily d JOIN means m USING (event_type)
        ),
        picked AS (
            SELECT event_type, day, mu, ABS(c) AS dev,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY ABS(c) DESC, day) AS rk
            FROM cusum
        )
        SELECT event_type, day AS changepoint_day,
               ROUND(mu, 4) AS daily_mean, ROUND(dev, 4) AS max_cusum_dev
        FROM picked WHERE rk = 1 ORDER BY event_type
    """,
    "events_time_weighted_avg": """
        WITH held AS (
            SELECT user_id, value,
                   LEAD(epoch_ms(ts)) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                     - epoch_ms(ts) AS dt
            FROM events
        )
        SELECT user_id,
               COUNT(*) AS n_intervals,
               ROUND(SUM(value * dt) / SUM(dt), 6) AS twa_value,
               ROUND(AVG(value), 6) AS plain_avg
        FROM held WHERE dt IS NOT NULL
        GROUP BY user_id ORDER BY user_id
    """,
    "key_skew_audit": f"""
        WITH counts AS (
            SELECT {SKEW_KEY} AS k, COUNT(*) AS cnt FROM lineitem GROUP BY 1
        ),
        tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS nk FROM counts)
        SELECT MIN(nk) AS n_keys,
               MIN(total) AS n_rows,
               ROUND(MAX(cnt) / MIN(total), 6) AS top1_share,
               ROUND(STDDEV_POP(cnt) / AVG(cnt), 6) AS cv,
               ROUND((-SUM((cnt / total) * LN(cnt / total))) / LN(MIN(nk)), 6)
                 AS entropy_norm
        FROM counts, tot
    """,
    "ab_test_welch": """
        WITH per_user AS (
            SELECT user_id, AVG(value) AS metric FROM events GROUP BY user_id
        ),
        stats AS (
            SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % 2
                     AS variant,
                   COUNT(*) AS n, AVG(metric) AS mean, VAR_SAMP(metric) AS var
            FROM per_user GROUP BY 1
        )
        SELECT a.n AS n_a, b.n AS n_b,
               ROUND(a.mean, 6) AS mean_a, ROUND(b.mean, 6) AS mean_b,
               ROUND((a.mean - b.mean) / SQRT(a.var / a.n + b.var / b.n), 4) AS t_stat
        FROM (SELECT * FROM stats WHERE variant = 0) a,
             (SELECT * FROM stats WHERE variant = 1) b
    """,
    "ab_test_proportions": f"""
        WITH per_user AS (
            SELECT user_id,
                   CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                                    THEN 1 ELSE 0 END) >= {AB_CONV_MIN_PURCHASES}
                        THEN 1 ELSE 0 END AS conv
            FROM events GROUP BY user_id
        ),
        stats AS (
            SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % 2 AS variant,
                   COUNT(*) AS n, SUM(conv) AS c
            FROM per_user GROUP BY 1
        )
        SELECT CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
               CAST(a.c AS BIGINT) AS conv_a, CAST(b.c AS BIGINT) AS conv_b,
               ROUND(a.c / CAST(a.n AS DOUBLE), 6) AS p_a,
               ROUND(b.c / CAST(b.n AS DOUBLE), 6) AS p_b,
               ROUND((a.c / CAST(a.n AS DOUBLE) - b.c / CAST(b.n AS DOUBLE))
                     / NULLIF(SQRT(((a.c + b.c) / CAST(a.n + b.n AS DOUBLE))
                            * (1.0 - (a.c + b.c) / CAST(a.n + b.n AS DOUBLE))
                            * (1.0 / a.n + 1.0 / b.n)), 0), 4) AS z_stat
        FROM (SELECT * FROM stats WHERE variant = 0) a,
             (SELECT * FROM stats WHERE variant = 1) b
    """,
    "rolling_active_users": f"""
        WITH ud AS (
            SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
        ),
        expanded AS (
            SELECT CAST(UNNEST(generate_series(d, d + INTERVAL {ROLL_DAYS - 1} DAY,
                                               INTERVAL 1 DAY)) AS DATE) AS day,
                   user_id
            FROM ud
        )
        SELECT day, COUNT(DISTINCT user_id) AS active_users
        FROM expanded GROUP BY day ORDER BY day
    """,
    "incremental_agg_merge": """
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price,
               ROUND(SUM(o_totalprice) / COUNT(*), 4) AS avg_price
        FROM orders GROUP BY 1
    """,
    "pareto_frontier": """
        SELECT p.p_partkey, ROUND(p.p_retailprice, 2) AS price, p.p_size AS size
        FROM part p
        WHERE NOT EXISTS (
            SELECT 1 FROM part q
            WHERE q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
              AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
        )
        ORDER BY price, size, p.p_partkey
    """,
    "weighted_sample_topk": f"""
        WITH keyed AS (
            SELECT source, doc_id, n_chars,
                   LN((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) + 1)
                      / {_MD5_RANGE}) / n_chars AS k
            FROM documents
        ),
        ranked AS (
            SELECT source, doc_id, n_chars, k,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY k DESC, doc_id) AS rk
            FROM keyed
        )
        SELECT source, rk, doc_id, n_chars, ROUND(k, 8) AS sample_key
        FROM ranked WHERE rk <= {WSAMPLE_K} ORDER BY source, rk
    """,
}
