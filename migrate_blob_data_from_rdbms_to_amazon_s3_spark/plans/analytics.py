"""Analytics generalization — SURVEY.md §7 M2 / BASELINE.json north star.

The reference has no JOIN/GROUP BY/window surface (SURVEY §2 C-D: verified
absent), so beyond parity the engine exposes standard Spark analytics over
the TPC-H-shaped fixtures. Shapes follow TPC-H Q1/Q3/Q5 adapted to the
fixture columns.

Scale notes (100 TB):
- `region`/`nation` are tiny dims → explicit ``broadcast`` hints; the
  customer⋈orders⋈lineitem chain shuffles on its join keys and AQE handles
  skew/strategy switches at runtime.
- Aggregations are expressed as ``groupBy().agg()`` so Catalyst plans
  partial (map-side) aggregation before the exchange.
- All double aggregates are rounded in BOTH engines (driver hash-compares
  values; cross-engine float summation order differs in the last ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.quantiles import distribution_quantiles_duck
from ..sources.tables import load_table as _t_impl


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _t_impl(spark, sf_dir, name)


# --- TPC-H Q1: pricing summary report ---------------------------------------
def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --- TPC-H Q3: shipping priority (3-way join + agg + top-k) -------------------
def q3_shipping_priority(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# --- TPC-H Q5: local supplier volume (6-way join, broadcast dims) --------------
def q5_local_supplier_volume(spark, sf_dir):
    region = F.broadcast(
        _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    supplier = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supplier,
            (li.l_suppkey == supplier.s_suppkey)
            & (cust.c_nationkey == supplier.s_nationkey),
        )
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# --- top-k with deterministic tiebreak ------------------------------------------
def q_top_orders(spark, sf_dir):
    """Top-k = sort + limit; Catalyst plans TakeOrdered (per-partition heap +
    single merge), no global sort materialization."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(10)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
    )


# --- window: rank within group -----------------------------------------------------
def q_window_rank(spark, sf_dir):
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        _t(spark, sf_dir, "customer")
        .withColumn("bal_rank", F.row_number().over(w))
        .filter(F.col("bal_rank") <= 3)
        .select(
            "c_nationkey",
            "c_custkey",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "bal_rank",
        )
    )


# --- window: running sum (frame) -----------------------------------------------------
def q_window_running_sum(spark, sf_dir):
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


# --- window: time-range frame ----------------------------------------------------------
def q_window_time_range_avg(spark, sf_dir):
    """Moving 30-day spend per customer — a RANGE window frame over event
    time (all orders within the 30 days ending at this row's date, peers
    included), vs the ROWS frame of window_running_sum. The frame bound
    is epoch-seconds arithmetic so both engines see the identical
    fixed-width window (UTC session, no DST drift). The rolling metric is
    SUM (+ count; avg = sum/count for the reader): 2-decimal prices sum
    on the cent grid so ROUND(...,2) never sits on a boundary, while an
    AVG of two orders lands EXACTLY on a half-cent and flips between the
    engines' rounding paths (observed on this fixture)."""
    # fixture dates are TIMESTAMP_NTZ; NTZ -> TZ -> long is exact under the
    # UTC session (NTZ has no direct bigint cast)
    epoch = F.col("o_orderdate").cast("timestamp").cast("long")
    w = Window.partitionBy("o_custkey").orderBy(epoch).rangeBetween(-30 * 86400, 0)
    return _t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("sum_30d_price"),
        F.count("*").over(w).alias("n_orders_30d"),
    )


# --- rollup (hierarchical aggregate) ---------------------------------------------------
def q_rollup_sales(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n_items"),
        )
    )


# --- distinct / exact cardinalities ------------------------------------------------------
def q_distinct_counts(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.count("*").alias("n_orders"),
    )


def q_approx_distinct(spark, sf_dir):
    """HLL++ sketch distinct (one pass, mergeable, no distinct-shuffle —
    the 100 TB path where exact countDistinct is a full re-shuffle).

    The raw sketch estimate is engine-specific, so the value-checkable
    contract is: exact count, total rows, and a boolean asserting the
    HLL++ estimate (rsd 0.01) lands within 5x the requested error of the
    exact count. HLL++ is deterministic for a fixed dataset, so the
    boolean is stable; the DuckDB twin computes the same exact count and
    expects TRUE — every column hash-matches while the sketch still runs
    (tests/test_analytics_extras.py additionally bounds the raw
    estimate)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("n_customers_exact"),
        F.count("*").alias("n_orders"),
        (
            F.abs(
                F.approx_count_distinct("o_custkey", rsd=0.01)
                - F.countDistinct("o_custkey")
            )
            <= F.countDistinct("o_custkey") * 0.05
        ).alias("estimate_within_5pct"),
    )


def q_hll_partial_merge(spark, sf_dir):
    """Mergeable-sketch aggregation (Apache DataSketches HLL): build one
    customer-set sketch PER ORDER STATUS, then union the partials into
    the global estimate — the pre-aggregation architecture every 100 TB
    rollup runs (sketch per partition/day at ingest, merge at query time,
    never re-scan raw data; unlike approx_count_distinct's final number,
    the sketch column itself is storable and re-mergeable). Value
    contract as approx_distinct: exact global count plus deterministic
    booleans asserting the union estimate AND every per-status partial
    land within 5% of exact."""
    orders = _t(spark, sf_dir, "orders")
    per = orders.groupBy("o_orderstatus").agg(
        F.expr("hll_sketch_agg(o_custkey)").alias("sk"),
        F.countDistinct("o_custkey").alias("ex"),
    )
    merged = per.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("g_est"),
        F.max(
            F.abs(F.expr("hll_sketch_estimate(sk)") - F.col("ex"))
            / F.col("ex")
        ).alias("max_partial_rel_err"),
        F.count("*").alias("n_statuses"),
    )
    exact = orders.agg(F.countDistinct("o_custkey").alias("n_customers_exact"))
    return exact.crossJoin(F.broadcast(merged)).select(
        "n_customers_exact",
        "n_statuses",
        (
            F.abs(F.col("g_est") - F.col("n_customers_exact"))
            <= F.col("n_customers_exact") * 0.05
        ).alias("union_estimate_within_5pct"),
        (F.col("max_partial_rel_err") <= 0.05).alias("partials_within_5pct"),
    )


# --- robust outliers: median / MAD -----------------------------------------------------
MAD_K = 1.4826  # consistency constant: MAD*K estimates sigma under normality


def q_grouped_mad_outliers(spark, sf_dir):
    """Robust per-group outlier audit: median and MAD (median absolute
    deviation) are 50%-breakdown statistics, so one corrupt ingest batch
    can't drag the fence the way it drags mean/stddev (the z-score
    kernel's failure mode). Three passes, each a tiny-key shuffle plus a
    broadcast of the per-group stats — the canonical exact-MAD plan:
    median per group; MAD over |x - median|; fence count at
    |x - median| > 3 * 1.4826 * MAD.

    SCALE CUTOVER RULE: exact percentile buffers every group value in one
    aggregation buffer — safe here only because the grain is ~5 known
    event types whose group sizes are bounded. For unbounded or hot
    groups use q_grouped_mad_outliers_approx (GK sketch, O(accuracy)
    memory) — that twin is the 100 TB production plan; this exact form is
    the oracle anchor."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    med = (
        ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("med"))
        .localCheckpoint(eager=False)
    )
    # ^ `dev` feeds both the MAD aggregate and the fence pass; without the
    # checkpoint each branch re-runs the median shuffle. The re-scan of
    # the raw table per pass is inherent to exact MAD; re-deriving the
    # group-count-sized stats is not.
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    fenced = dev.join(F.broadcast(mad), "event_type")
    return fenced.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.first("med"), 4).alias("median_value"),
        F.round(F.first("mad"), 4).alias("mad"),
        F.sum(
            (F.col("adev") > 3 * MAD_K * F.col("mad")).cast("int")
        ).alias("n_outliers"),
    )


def q_grouped_mad_outliers_approx(spark, sf_dir):
    """Scale-safe twin of q_grouped_mad_outliers: both percentile passes
    (median, MAD) run on ``approx_percentile`` — a one-pass mergeable GK
    sketch with O(accuracy) per-group memory — instead of exact
    ``percentile``'s buffer-every-value aggregation, which OOMs on a hot
    group at 100 TB. Same three-pass shape (stats → deviations → fence),
    same tiny-key shuffles and broadcasts; only the aggregation kernel
    changes. This is the production plan for unbounded group sizes; the
    exact twin stays as the oracle anchor (cutover rule in its docstring).

    Oracle strategy: exact stats anchor the value hash; booleans assert
    the approx median/MAD landed within 5% of the group's value spread
    and the approx fence count stays within max(10, 2%) of the exact
    count. At the oracle SF the sketch accuracy exceeds group sizes, so
    all three are deterministically TRUE."""
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    stats = (
        ev.groupBy("event_type")
        .agg(
            F.expr("approx_percentile(value, 0.5, 10000)").alias("med_a"),
            F.expr("percentile(value, 0.5)").alias("med_e"),
            (F.max("value") - F.min("value")).alias("spread"),
        )
        .localCheckpoint(eager=False)
    )
    dev = (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("adev_a", F.abs(F.col("value") - F.col("med_a")))
        .withColumn("adev_e", F.abs(F.col("value") - F.col("med_e")))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("approx_percentile(adev_a, 0.5, 10000)").alias("mad_a"),
        F.expr("percentile(adev_e, 0.5)").alias("mad_e"),
    )
    fenced = dev.join(F.broadcast(mad), "event_type")
    agg = fenced.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.first("med_e").alias("med_e"),
        F.first("med_a").alias("med_a"),
        F.first("mad_e").alias("mad_e"),
        F.first("mad_a").alias("mad_a"),
        F.first("spread").alias("spread"),
        F.sum(
            (F.col("adev_a") > 3 * MAD_K * F.col("mad_a")).cast("int")
        ).alias("n_out_a"),
        F.sum(
            (F.col("adev_e") > 3 * MAD_K * F.col("mad_e")).cast("int")
        ).alias("n_out_e"),
    )
    return agg.select(
        "event_type",
        "n_events",
        F.round("med_e", 4).alias("median_value"),
        (F.abs(F.col("med_a") - F.col("med_e")) <= F.col("spread") * 0.05).alias(
            "approx_median_within_bound"
        ),
        (F.abs(F.col("mad_a") - F.col("mad_e")) <= F.col("spread") * 0.05).alias(
            "approx_mad_within_bound"
        ),
        (
            F.abs(F.col("n_out_a") - F.col("n_out_e"))
            <= F.greatest(F.lit(10.0), F.col("n_events") * 0.02)
        ).alias("outlier_count_stable"),
    )


# --- conversion attribution ------------------------------------------------------------
def q_events_attribution(spark, sf_dir):
    """First-touch / last-touch attribution: for every purchase, which
    event type opened the user's journey and which one immediately
    preceded the conversion. ONE user-partitioned window pass serves both
    touches (first/last over the same strictly-before frame, IGNORE
    NULLS to skip earlier purchases) — no self-join, no as-of join, one
    shuffle on user_id; report is the (first_touch, last_touch) matrix
    with purchase counts and attributed revenue. Purchases with no prior
    event attribute to NULL (kept: untracked conversions are a real
    segment, and both engines agree on them)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    return (
        ev.withColumn("first_touch", F.first(touch, ignorenulls=True).over(w))
        .withColumn("last_touch", F.last(touch, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .groupBy("first_touch", "last_touch")
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("attributed_value"),
        )
    )


# --- count-min sketch: mergeable frequency pre-aggregation ---------------------------
CMS_DEPTH, CMS_WIDTH = 4, 512


def _cms_bucket_spark(j: int, key: str) -> str:
    """Row-``j`` bucket index: md5-derived 32-bit hash mod width — the
    same engine-independent hash family as the dedup operators."""
    return (
        f"CAST(conv(substring(md5(concat('cms-{j}-', {key})), 1, 8), 16, 10) AS BIGINT)"
        f" % {CMS_WIDTH}"
    )


def q_cms_frequency(spark, sf_dir):
    """Count-min sketch frequency estimation, completing the mergeable-
    sketch family (HLL = cardinality, percentile = quantiles, CMS = point
    frequencies). The sketch is built as per-event-type PARTIALS then
    merged by element-wise sum — the pre-aggregation architecture a
    100 TB rollup runs: the d x w counter grid (4 x 512 here) is a
    bounded-size, storable, re-mergeable column no matter how much data
    flowed in, and the merged grid is broadcast to the probe side (the
    scale-correct direction: the sketch is O(d*w), the probe set is not).

    Probes are the exact top-10 heaviest users; output carries the exact
    count, the CMS estimate (min over the d rows), and the overcount —
    the hash family is md5-derived so BOTH engines build bit-identical
    grids and every column value-checks (no trust-me bound flags; the
    est >= exact CMS guarantee is asserted in tests)."""
    ev = _t(spark, sf_dir, "events")
    key = "CAST(user_id AS STRING)"
    jb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    F.expr(_cms_bucket_spark(j, key)).alias("b"),
                )
                for j in range(CMS_DEPTH)
            ]
        )
    ).alias("jb")
    # partial sketch per event_type shard, then merge = element-wise sum
    shard = (
        ev.select("event_type", jb)
        .select("event_type", "jb.j", "jb.b")
        .groupBy("event_type", "j", "b")
        .agg(F.count("*").alias("pcnt"))
    )
    sketch = shard.groupBy("j", "b").agg(F.sum("pcnt").alias("cnt"))
    exact = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.desc("exact_n"), "user_id")
        .limit(10)
    )
    probes = exact.select("user_id", "exact_n", jb).select(
        "user_id", "exact_n", "jb.j", "jb.b"
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "b"])
        .groupBy("user_id", "exact_n")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            "user_id",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
        )
    )


def q_hll_multigrain_rollup(spark, sf_dir):
    """Sketch once, roll up many: HLL partials built at the FINE grain
    (status x priority) serve every coarser grain by re-union — per-status
    estimates AND the global estimate come from the same stored partials,
    never from re-scanning raw data. This is the cube/rollup economics of
    sketches at 100 TB: an exact DISTINCT at k grains costs k shuffles of
    the raw keys; sketch partials cost one, then each rollup moves only
    k_fine sketch blobs. Value contract as hll_partial_merge: exact count
    per output grain plus a deterministic within-5% assertion on the
    estimate (lgK=12 HLL is ~1.6% rse; both engines agree on the flags)."""
    orders = _t(spark, sf_dir, "orders")
    part = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.expr("hll_sketch_agg(o_custkey)").alias("sk")
    )
    by_status = part.groupBy("o_orderstatus").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    )
    overall = part.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est")
    ).select(F.lit("ALL").alias("o_orderstatus"), "est")
    exact_status = orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers_exact")
    )
    exact_all = orders.agg(
        F.countDistinct("o_custkey").alias("n_customers_exact")
    ).select(F.lit("ALL").alias("o_orderstatus"), "n_customers_exact")
    est = by_status.unionByName(overall)
    exact = exact_status.unionByName(exact_all)
    return est.join(exact, "o_orderstatus").select(
        F.col("o_orderstatus").alias("grain"),
        "n_customers_exact",
        (
            F.abs(F.col("est") - F.col("n_customers_exact"))
            <= F.col("n_customers_exact") * 0.05
        ).alias("estimate_within_5pct"),
    )


def q_user_event_profile(spark, sf_dir):
    """Per-user activity profile as a JSON map {event_type: count} — the
    aggregate-to-document shape that feeds feature stores and API
    caches. Two combiner-friendly shuffles ((user, type) then user); the
    map is built from a SORTED entry array so the serialized JSON is
    byte-deterministic cross-engine (map iteration order is not a
    contract anywhere — sorting is what makes this hashable)."""
    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    return per.groupBy("user_id").agg(
        F.to_json(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("event_type", "n")))
            )
        ).alias("profile"),
        F.sum("n").alias("n_events"),
    )


# --- set operations -------------------------------------------------------------------------
def q_set_ops(spark, sf_dir):
    """INTERSECT/EXCEPT over customer key sets: big spenders vs BUILDING
    segment. Result: keys in both, minus a suppressed subset."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big_spenders = (
        orders.filter(F.col("o_totalprice") > 300000).select("o_custkey").distinct()
    )
    building = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("o_custkey"))
    )
    suppressed = orders.filter(F.col("o_custkey") % 7 == 0).select("o_custkey")
    return big_spenders.intersect(building).exceptAll(suppressed.distinct()).select(
        F.col("o_custkey").alias("custkey")
    )


# --- union of reshaped sources ----------------------------------------------------------------
def q_union_all_sources(spark, sf_dir):
    """unionByName over heterogeneous sources projected to a common shape
    (the engine's multi-source ingest pattern)."""
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("entity_id"),
        F.lit("order").alias("kind"),
        F.round("o_totalprice", 2).alias("weight"),
    )
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.lit("customer").alias("kind"),
        F.round("c_acctbal", 2).alias("weight"),
    )
    return orders.unionByName(cust)


# --- events: salted two-phase aggregation -------------------------------------------------------
def q_salted_hot_key_agg(spark, sf_dir):
    """Two-phase (salted) aggregation — the hot-key shape: phase 1
    aggregates (user_id, salt), spreading any single hot user over 16
    reducers; phase 2 merges the partials. Result is identical to the
    direct groupBy (the oracle IS the direct groupBy); only the shuffle
    distribution changes. The aggregation twin of operators/skew.
    salted_join — for when one key is 10% of a 100 TB fact and the
    per-key aggregation state is too heavy for a single reducer (high-
    cardinality state like collect_list/percentile, where map-side
    combine can't help). Salt is derived from event_id, not rand(), so
    the plan stays deterministic."""
    ev = _t(spark, sf_dir, "events")
    partial = (
        ev.select("user_id", (F.col("event_id") % 16).alias("_salt"), "value")
        .groupBy("user_id", "_salt")
        .agg(F.count("*").alias("pc"), F.sum("value").alias("pv"))
    )
    return partial.groupBy("user_id").agg(
        F.sum("pc").alias("n_events"),
        F.round(F.sum("pv"), 2).alias("sum_value"),
    )


# --- events: conversion funnel ------------------------------------------------------------------
def q_events_conversion_funnel(spark, sf_dir):
    """Ordered conversion funnel: view → click-after-view →
    purchase-after-click, per user, reported as funnel stage counts.
    One scan, one shuffle: the three stage thresholds are cascading
    conditional-min WINDOWS over the same user_id partitioning (no
    orderBy → no sort, and Spark plans a single Exchange feeding all
    three Window ops), then one user-grain aggregation that the existing
    hash distribution already satisfies, then a singleton roll-up. The
    previous shape scanned events four times and re-planned each stage's
    aggregation subtree for its count — 10 planned shuffles; this is 2.
    Strict > on event time gives the ORDERED funnel (a purchase before
    any click doesn't count; NULL comparisons make missing prior stages
    propagate as unconverted, matching the inner-join formulation the
    oracle uses)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "t_view",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "t_click",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t_purchase",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t_click")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.count("t_view").alias("n_viewed"),
        F.count("t_click").alias("n_clicked_after_view"),
        F.count("t_purchase").alias("n_purchased_after_click"),
    )


# --- events: cohort retention -------------------------------------------------------------------
def q_events_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen week, counted
    per weeks-since-cohort of activity — the table behind every retention
    curve. Two aggregations over the user-hash partitioning (first-seen
    week per user, then distinct user-weeks), joined on user_id; both
    week keys are date_trunc('week') so the offset is an exact multiple
    of 7 days and the int division is lossless."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_w")
    )
    act = ev.select("user_id", F.date_trunc("week", "ts").alias("act_w")).distinct()
    j = act.join(first, "user_id")
    return (
        j.select(
            F.date_format("cohort_w", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("act_w", "cohort_w") / 7).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


# --- customers: RFM segmentation ----------------------------------------------------------------
def _quartile_bucket(col, cuts, ascending):
    """CASE-bucket a value against exact p25/p50/p75 cut-points.

    ``ascending=True`` means smaller is better (recency): values <= p25
    land in quartile 1. ``ascending=False`` means larger is better
    (frequency, monetary): values >= p75 land in quartile 1. Ties at a
    cut-point land in the better quartile in BOTH engines (<=/>= is
    mirrored in the DuckDB twin), so the bucketing is deterministic
    without any per-row tiebreak."""
    p25, p50, p75 = cuts
    if ascending:
        return (
            F.when(col <= p25, 1).when(col <= p50, 2).when(col <= p75, 3).otherwise(4)
        )
    return F.when(col >= p75, 1).when(col >= p50, 2).when(col >= p25, 3).otherwise(4)


def q_customer_rfm_segments(spark, sf_dir):
    """RFM segmentation: recency/frequency/monetary quartiles per
    customer, reported as per-segment counts + value. One orders shuffle
    to the customer grain; then ONE distribution-quantile pass computes
    all nine quartile cut-points (3 melted metrics x p25/p50/p75, no
    per-group value buffering — functions/quantiles), the 1-row
    cut-point table is broadcast, and quartile assignment is a map-side
    CASE — no global sort anywhere in the plan (the r2 version ran
    three unpartitioned ntile windows, an all-data-to-one-partition
    sort; guarded now by test_plan_shapes.test_rfm_no_global_
    sort_window). Exact interpolated percentiles (identical
    distribution arithmetic in both engines) keep the DuckDB twin
    hash-green at any scale.
    Quartile semantics are threshold-based (ties share a bucket), the
    scale-sane definition — equal-count ntile would force a total order.
    """
    orders = _t(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("anchor"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count("*").alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("anchor", "last_order").alias("recency_days"),
            "frequency",
            "monetary",
        )
        # two consumers (the melted cut-point pass and the scoring pass)
        # — materialize the customer grain once instead of re-running
        # the orders groupBy per branch (round 8 scan sharing)
        .localCheckpoint(eager=False)
    )
    # Cut-points via the COUNT-DISTRIBUTION method (functions/quantiles;
    # round 7): the previous triple ``percentile()`` buffered the whole
    # customer grain three times in one aggregation buffer — the shape
    # that OOMs at an unbounded customer count. The three metrics melt
    # (stack) into (metric, v) rows so ONE distribution pass computes
    # all nine cut-points. GRAIN SPACE (round 8): the quartile CASEs
    # compare round(v*100) integer grains against grain-space cuts — the
    # revenue_concentration / revenue_gini discipline. Comparing the raw
    # ``monetary`` double (an order-dependent float SUM with ~1e-9
    # engine-dependent residual) against a reconstructed cut can flip a
    # boundary customer's bucket between engines when a cut lands on a
    # data grain (h=0, common); grain-vs-grain comparison cannot — the
    # grain is an exact integer and an interpolated cut sits strictly
    # between integers. recency/frequency are integer-exact either way.
    from ..functions.quantiles import distribution_quantiles

    melted = per_cust.selectExpr(
        "stack(3, 'r', CAST(recency_days AS DOUBLE), "
        "'f', CAST(frequency AS DOUBLE), 'm', monetary) AS (metric, v)"
    )
    cut_rows = distribution_quantiles(
        melted, "metric", "v", (0.25, 0.5, 0.75), grain_space=True
    )
    cuts = cut_rows.groupBy().agg(
        *[
            F.max(F.when(F.col("metric") == m, F.col(f"q{i}"))).alias(f"{m}_cut{i}")
            for m in ("r", "f", "m")
            for i in range(3)
        ]
    )
    scored = per_cust.crossJoin(F.broadcast(cuts)).select(
        "o_custkey",
        "monetary",
        _quartile_bucket(
            F.round(F.col("recency_days") * 100).cast("double"),
            [F.col(f"r_cut{i}") for i in range(3)],
            ascending=True,
        ).alias("r_q"),
        _quartile_bucket(
            F.round(F.col("frequency") * 100).cast("double"),
            [F.col(f"f_cut{i}") for i in range(3)],
            ascending=False,
        ).alias("f_q"),
        _quartile_bucket(
            F.round(F.col("monetary") * 100).cast("double"),
            [F.col(f"m_cut{i}") for i in range(3)],
            ascending=False,
        ).alias("m_q"),
    )
    return scored.groupBy("r_q", "f_q", "m_q").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("monetary"), 2).alias("segment_value"),
    )


# --- events: latest state per entity ------------------------------------------------------------
def q_events_latest_state(spark, sf_dir):
    """Latest event per user (the "current state" materialization every
    event-sourced system derives): row_number over (user, ts DESC,
    event_id DESC) — event_id tiebreak makes same-timestamp rows
    deterministic. One hash exchange on user_id; at 100 TB this is the
    compaction query a changelog table runs to seed its snapshot."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
            F.col("event_type").alias("last_type"),
        )
    )


# --- events: tumbling window aggregation --------------------------------------------------------
def q_events_tumbling(spark, sf_dir):
    """5-minute tumbling windows over the event stream (batch form; the
    streaming twin with watermarks is streaming/events.py). ``F.window``
    buckets are epoch-aligned, matching floor(epoch/300)*300."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# --- events: native session_window sessionization -----------------------------------------------
def q_events_session_window(spark, sf_dir):
    """Gap sessionization via Spark's NATIVE ``session_window`` — the
    built-in twin of the lag/cumsum sessionize below (and of the
    applyInPandasWithState streaming sessionizer): one aggregation, no
    window functions, and the same operator works under watermarks in
    streaming. Session semantics: an event extends its session while the
    gap to the previous event is < 30 min (a gap of exactly 30 min starts
    a new session — mirrored with >= in the oracle's cumsum); the
    session's end is last_event_ts + gap, per the session_window
    contract."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("sw.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


# --- events: approx percentile with bound audit --------------------------------------------------
def q_approx_percentiles_bounded(spark, sf_dir):
    """Per-type median via ``approx_percentile`` (one-pass mergeable
    sketch — the 100 TB path the exact-percentile docstrings point to),
    value-checked the same way as approx_distinct: the output carries the
    EXACT median plus a boolean asserting the sketch landed within 5% of
    the group's value range. Both sketches are deterministic for fixed
    data, so every column hash-matches the DuckDB twin (which computes
    the exact stats and expects TRUE)."""
    ev = _t(spark, sf_dir, "events")
    exact = F.expr("percentile(value, 0.5)")
    approx = F.expr("approx_percentile(value, 0.5, 10000)")
    spread = F.max("value") - F.min("value")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(exact, 4).alias("p50_exact"),
        (F.abs(approx - exact) <= spread * 0.05).alias("estimate_within_bound"),
    )


# --- events: sessionization (gap > 30 min) --------------------------------------------------------
def q_events_sessionize(spark, sf_dir):
    """Gap-based sessionization via window functions: a new session starts
    when the gap to the previous event of the same user exceeds 30 minutes.
    (Streaming twin: applyInPandasWithState / session window.)"""
    ev = _t(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag(F.col("ts").cast("double")).over(by_user)
    is_new = F.when(
        prev_ts.isNull() | ((F.col("ts").cast("double") - prev_ts) > 1800), 1
    ).otherwise(0)
    sessioned = ev.withColumn("session_seq", F.sum(is_new).over(by_user))
    return (
        sessioned.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )


# --- window-function breadth: lead/lag/ntile/percent_rank -------------------------------------------
def q_window_navigation(spark, sf_dir):
    """Navigation + distribution windows over each customer's order
    history: previous/next order gap and price quartile within customer.
    One shuffle on the partition key serves all four functions."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev_dt = F.lag("o_orderdate").over(w)
    return (
        orders.filter(F.col("o_custkey") < 200)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.datediff("o_orderdate", prev_dt).alias("days_since_prev"),
            F.lead("o_orderkey").over(w).alias("next_orderkey"),
            F.ntile(4).over(
                Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
            ).alias("price_quartile"),
            F.round(
                F.percent_rank().over(
                    Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
                ),
                4,
            ).alias("price_pct_rank"),
        )
    )


def q_window_cume_nth(spark, sf_dir):
    """Distribution + positional windows: cumulative distribution of each
    order's price within its (priority, year) cohort, plus the cohort's
    cheapest order (nth_value 1 over the full frame) — completes the
    window family next to window_navigation's rank/ntile/percent_rank.
    Cohort partitioning keeps every window group bounded (priority ×
    year), never a global ordering."""
    orders = _t(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.year("o_orderdate").alias("yr"),
        "o_totalprice",
    ).filter(F.col("o_orderkey") < 2000)
    w = Window.partitionBy("o_orderpriority", "yr").orderBy(
        "o_totalprice", "o_orderkey"
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return base.select(
        "o_orderkey",
        "o_orderpriority",
        "yr",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.round(F.cume_dist().over(w), 4).alias("price_cume_dist"),
        F.round(F.nth_value("o_totalprice", 1).over(w_full), 2).alias("cohort_min_price"),
    ).orderBy("o_orderkey")


# --- top-k per group ------------------------------------------------------------------------------
def q_top3_orders_per_segment(spark, sf_dir):
    """Top-3 orders by price within each market segment: rank window +
    filter. One shuffle on the group key; the per-group heap stays small."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "c_mktsegment",
            F.col("rk").alias("rank_in_segment"),
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


# --- grouped stats (median/stddev) ---------------------------------------------------------------
def q_events_stats(spark, sf_dir):
    """Per-type summary stats. The median uses the COUNT-DISTRIBUTION
    method (functions/quantiles; values are cents-exact in any
    ledger-derived metric): the previous ``percentile`` buffered every
    group value in one aggregation buffer — event types are few but a
    hot type's group is corpus-sized, the shape that OOMs at 100 TB
    (round 8, closing the last undocumented buffering call site; the
    remaining exact ``percentile`` calls are the documented oracle
    anchors of approx twins)."""
    from ..functions.quantiles import distribution_quantiles

    ev = _t(spark, sf_dir, "events")
    base = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.stddev_samp("value"), 4).alias("sd_value"),
        F.round(F.min("value"), 4).alias("min_value"),
        F.round(F.max("value"), 4).alias("max_value"),
    )
    med = distribution_quantiles(ev, "event_type", "value", (0.5,)).select(
        "event_type", F.round("q0", 4).alias("median_value")
    )
    return base.join(med, "event_type").select(
        "event_type",
        "n",
        "avg_value",
        "sd_value",
        "median_value",
        "min_value",
        "max_value",
    )


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "top_orders": q_top_orders,
    "window_rank": q_window_rank,
    "window_running_sum": q_window_running_sum,
    "window_time_range_avg": q_window_time_range_avg,
    "window_navigation": q_window_navigation,
    "window_cume_nth": q_window_cume_nth,
    "top3_orders_per_segment": q_top3_orders_per_segment,
    "rollup_sales": q_rollup_sales,
    "distinct_counts": q_distinct_counts,
    "approx_distinct": q_approx_distinct,
    "hll_partial_merge": q_hll_partial_merge,
    "cms_frequency": q_cms_frequency,
    "events_attribution": q_events_attribution,
    "hll_multigrain_rollup": q_hll_multigrain_rollup,
    "grouped_mad_outliers": q_grouped_mad_outliers,
    "grouped_mad_outliers_approx": q_grouped_mad_outliers_approx,
    "user_event_profile": q_user_event_profile,
    "set_ops": q_set_ops,
    "union_all_sources": q_union_all_sources,
    "events_tumbling": q_events_tumbling,
    "salted_hot_key_agg": q_salted_hot_key_agg,
    "events_conversion_funnel": q_events_conversion_funnel,
    "events_cohort_retention": q_events_cohort_retention,
    "customer_rfm_segments": q_customer_rfm_segments,
    "events_latest_state": q_events_latest_state,
    "events_sessionize": q_events_sessionize,
    "events_session_window": q_events_session_window,
    "approx_percentiles_bounded": q_approx_percentiles_bounded,
    "events_stats": q_events_stats,
}

ORACLES = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_priority": """
        SELECT l_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "q5_local_supplier_volume": """
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
    """,
    "top_orders": """
        SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
    "window_rank": """
        SELECT c_nationkey, c_custkey, ROUND(c_acctbal, 2) AS c_acctbal, bal_rank
        FROM (
            SELECT c_nationkey, c_custkey, c_acctbal,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY c_nationkey
                       ORDER BY c_acctbal DESC, c_custkey) AS INT) AS bal_rank
            FROM customer
        )
        WHERE bal_rank <= 3
    """,
    "top3_orders_per_segment": """
        SELECT c_mktsegment, CAST(rk AS INT) AS rank_in_segment,
               o_orderkey, ROUND(o_totalprice, 2) AS totalprice
        FROM (
            SELECT c_mktsegment, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rk
            FROM orders JOIN customer ON o_custkey = c_custkey
        ) WHERE rk <= 3
    """,
    "window_cume_nth": """
        SELECT o_orderkey, o_orderpriority,
               CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
               ROUND(o_totalprice, 2) AS totalprice,
               ROUND(CUME_DIST() OVER (PARTITION BY o_orderpriority,
                                                    EXTRACT(year FROM o_orderdate)
                                       ORDER BY o_totalprice, o_orderkey), 4)
                 AS price_cume_dist,
               ROUND(MIN(o_totalprice) OVER (PARTITION BY o_orderpriority,
                                                          EXTRACT(year FROM o_orderdate)), 2)
                 AS cohort_min_price
        FROM orders
        WHERE o_orderkey < 2000
        ORDER BY o_orderkey
    """,
    "window_navigation": """
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               CAST(date_diff('day',
                    LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                           ORDER BY o_orderdate, o_orderkey),
                    o_orderdate) AS INT) AS days_since_prev,
               LEAD(o_orderkey) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS next_orderkey,
               CAST(NTILE(4) OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice, o_orderkey) AS INT) AS price_quartile,
               ROUND(PERCENT_RANK() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice, o_orderkey), 4) AS price_pct_rank
        FROM orders
        WHERE o_custkey < 200
    """,
    "window_running_sum": """
        SELECT o_custkey, o_orderkey,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        FROM orders
    """,
    "window_time_range_avg": """
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               ROUND(SUM(o_totalprice) OVER w, 2) AS sum_30d_price,
               COUNT(*) OVER w AS n_orders_30d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY epoch(o_orderdate)
                     RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
    """,
    "rollup_sales": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               COUNT(*) AS n_items
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "distinct_counts": """
        SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
               COUNT(*) AS n_orders
        FROM orders
    """,
    "approx_distinct": """
        SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers_exact,
               COUNT(*) AS n_orders,
               TRUE AS estimate_within_5pct
        FROM orders
    """,
    "hll_partial_merge": """
        SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers_exact,
               CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
               TRUE AS union_estimate_within_5pct,
               TRUE AS partials_within_5pct
        FROM orders
    """,
    "grouped_mad_outliers": f"""
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY 1
        ),
        dev AS (
            SELECT e.event_type, e.value, m.med, ABS(e.value - m.med) AS adev
            FROM events e JOIN med m USING (event_type)
        ),
        mad AS (
            SELECT event_type, quantile_cont(adev, 0.5) AS mad
            FROM dev GROUP BY 1
        )
        SELECT d.event_type, COUNT(*) AS n_events,
               ROUND(ANY_VALUE(d.med), 4) AS median_value,
               ROUND(ANY_VALUE(m.mad), 4) AS mad,
               CAST(SUM(CASE WHEN d.adev > 3 * {MAD_K} * m.mad THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_outliers
        FROM dev d JOIN mad m USING (event_type)
        GROUP BY 1
    """,
    "grouped_mad_outliers_approx": """
        WITH med AS (
            SELECT event_type, quantile_cont(value, 0.5) AS med
            FROM events GROUP BY 1
        )
        SELECT e.event_type, COUNT(*) AS n_events,
               ROUND(ANY_VALUE(m.med), 4) AS median_value,
               TRUE AS approx_median_within_bound,
               TRUE AS approx_mad_within_bound,
               TRUE AS outlier_count_stable
        FROM events e JOIN med m USING (event_type)
        GROUP BY 1
    """,
    "hll_multigrain_rollup": """
        SELECT o_orderstatus AS grain,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers_exact,
               TRUE AS estimate_within_5pct
        FROM orders GROUP BY 1
        UNION ALL
        SELECT 'ALL' AS grain,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers_exact,
               TRUE AS estimate_within_5pct
        FROM orders
    """,
    "events_attribution": """
        WITH touched AS (
            SELECT event_type, value,
                   FIRST_VALUE(CASE WHEN event_type != 'purchase' THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_touch,
                   LAST_VALUE(CASE WHEN event_type != 'purchase' THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
            FROM events
        )
        SELECT first_touch, last_touch, COUNT(*) AS n_purchases,
               ROUND(SUM(value), 2) AS attributed_value
        FROM touched WHERE event_type = 'purchase'
        GROUP BY 1, 2
    """,
    "cms_frequency": f"""
        WITH js AS (SELECT UNNEST([{", ".join(str(j) for j in range(CMS_DEPTH))}]) AS j),
        buckets AS (
            SELECT js.j,
                   CAST('0x' || substr(md5('cms-' || js.j || '-' || e.user_id), 1, 8)
                        AS BIGINT) % {CMS_WIDTH} AS b
            FROM events e CROSS JOIN js
        ),
        sketch AS (SELECT j, b, COUNT(*) AS cnt FROM buckets GROUP BY 1, 2),
        ex AS (
            SELECT user_id, COUNT(*) AS exact_n FROM events GROUP BY 1
            ORDER BY exact_n DESC, user_id LIMIT 10
        ),
        probes AS (
            SELECT ex.user_id, ex.exact_n, js.j,
                   CAST('0x' || substr(md5('cms-' || js.j || '-' || ex.user_id), 1, 8)
                        AS BIGINT) % {CMS_WIDTH} AS b
            FROM ex CROSS JOIN js
        )
        SELECT p.user_id, p.exact_n, MIN(s.cnt) AS cms_est,
               MIN(s.cnt) - p.exact_n AS overcount
        FROM probes p JOIN sketch s USING (j, b)
        GROUP BY 1, 2
    """,
    "user_event_profile": """
        WITH per AS (
            SELECT user_id, event_type, COUNT(*) AS n
            FROM events GROUP BY 1, 2
        )
        SELECT user_id,
               '{' || string_agg('"' || event_type || '":' || n, ','
                                 ORDER BY event_type) || '}' AS profile,
               CAST(SUM(n) AS BIGINT) AS n_events
        FROM per GROUP BY user_id
    """,
    "set_ops": """
        SELECT custkey FROM (
            SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
            INTERSECT
            SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        EXCEPT ALL
        SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_custkey % 7 = 0
    """,
    "union_all_sources": """
        SELECT o_orderkey AS entity_id, 'order' AS kind, ROUND(o_totalprice, 2) AS weight
        FROM orders
        UNION ALL
        SELECT c_custkey AS entity_id, 'customer' AS kind, ROUND(c_acctbal, 2) AS weight
        FROM customer
    """,
    "salted_hot_key_agg": """
        SELECT user_id, COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM events
        GROUP BY user_id
    """,
    "events_latest_state": """
        SELECT user_id, event_id AS last_event_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
               event_type AS last_type
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        ) WHERE rn = 1
    """,
    "customer_rfm_segments": f"""
        WITH per_cust AS (
            SELECT o_custkey,
                   datediff('day', MAX(o_orderdate),
                            (SELECT MAX(o_orderdate) FROM orders)) AS recency_days,
                   COUNT(*) AS frequency,
                   ROUND(SUM(o_totalprice), 2) AS monetary
            FROM orders GROUP BY o_custkey
        ),
        cuts AS (
            SELECT [MAX(CASE WHEN metric = 'r' THEN q0 END),
                    MAX(CASE WHEN metric = 'r' THEN q1 END),
                    MAX(CASE WHEN metric = 'r' THEN q2 END)] AS r_cuts,
                   [MAX(CASE WHEN metric = 'f' THEN q0 END),
                    MAX(CASE WHEN metric = 'f' THEN q1 END),
                    MAX(CASE WHEN metric = 'f' THEN q2 END)] AS f_cuts,
                   [MAX(CASE WHEN metric = 'm' THEN q0 END),
                    MAX(CASE WHEN metric = 'm' THEN q1 END),
                    MAX(CASE WHEN metric = 'm' THEN q2 END)] AS m_cuts
            FROM ({distribution_quantiles_duck(
                "SELECT 'r' AS metric, CAST(recency_days AS DOUBLE) AS v FROM per_cust"
                " UNION ALL SELECT 'f', CAST(frequency AS DOUBLE) FROM per_cust"
                " UNION ALL SELECT 'm', monetary FROM per_cust",
                "metric",
                "v",
                (0.25, 0.5, 0.75),
                grain_space=True,
            )})
        ),
        scored AS (
            SELECT o_custkey, monetary,
                   CASE WHEN round(recency_days * 100) <= r_cuts[1] THEN 1
                        WHEN round(recency_days * 100) <= r_cuts[2] THEN 2
                        WHEN round(recency_days * 100) <= r_cuts[3] THEN 3
                        ELSE 4 END AS r_q,
                   CASE WHEN round(frequency * 100) >= f_cuts[3] THEN 1
                        WHEN round(frequency * 100) >= f_cuts[2] THEN 2
                        WHEN round(frequency * 100) >= f_cuts[1] THEN 3
                        ELSE 4 END AS f_q,
                   CASE WHEN round(monetary * 100) >= m_cuts[3] THEN 1
                        WHEN round(monetary * 100) >= m_cuts[2] THEN 2
                        WHEN round(monetary * 100) >= m_cuts[1] THEN 3
                        ELSE 4 END AS m_q
            FROM per_cust CROSS JOIN cuts
        )
        SELECT r_q, f_q, m_q, COUNT(*) AS n_customers,
               ROUND(SUM(monetary), 2) AS segment_value
        FROM scored GROUP BY 1, 2, 3
    """,
    "events_session_window": """
        WITH seq AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN LAG(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) IS NULL
                             OR date_diff('second',
                                    LAG(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id),
                                    ts) >= 1800
                        THEN 1 ELSE 0 END AS is_new
            FROM events
        ),
        sessions AS (
            SELECT user_id, ts, value,
                   SUM(is_new) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM seq
        )
        SELECT user_id,
               strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM sessions
        GROUP BY user_id, session_seq
    """,
    "approx_percentiles_bounded": """
        SELECT event_type, COUNT(*) AS n_events,
               ROUND(quantile_cont(value, 0.5), 4) AS p50_exact,
               TRUE AS estimate_within_bound
        FROM events
        GROUP BY event_type
    """,
    "events_cohort_retention": """
        WITH first AS (
            SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_w
            FROM events GROUP BY user_id
        ),
        act AS (
            SELECT DISTINCT user_id, date_trunc('week', ts) AS act_w FROM events
        )
        SELECT strftime(cohort_w, '%Y-%m-%d') AS cohort_week,
               CAST(datediff('day', cohort_w, act_w) // 7 AS INT) AS week_offset,
               COUNT(DISTINCT a.user_id) AS n_active
        FROM act a JOIN first f ON a.user_id = f.user_id
        GROUP BY 1, 2
    """,
    "events_conversion_funnel": """
        WITH fv AS (
            SELECT user_id, MIN(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY user_id
        ),
        fc AS (
            SELECT e.user_id, MIN(e.ts) AS t_click
            FROM events e JOIN fv ON e.user_id = fv.user_id
            WHERE e.event_type = 'click' AND e.ts > fv.t_view
            GROUP BY e.user_id
        ),
        fp AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM events e JOIN fc ON e.user_id = fc.user_id
            WHERE e.event_type = 'purchase' AND e.ts > fc.t_click
            GROUP BY e.user_id
        )
        SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
               (SELECT COUNT(*) FROM fv) AS n_viewed,
               (SELECT COUNT(*) FROM fc) AS n_clicked_after_view,
               (SELECT COUNT(*) FROM fp) AS n_purchased_after_click
    """,
    "events_tumbling": """
        SELECT strftime(to_timestamp(CAST(floor(epoch(ts) / 300) * 300 AS BIGINT)),
                        '%Y-%m-%d %H:%M:%S') AS bucket_start,
               event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    "events_sessionize": """
        WITH seq AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN prev_ts IS NULL OR (epoch(ts) - epoch(prev_ts)) > 1800
                        THEN 1 ELSE 0 END AS is_new
            FROM (
                SELECT user_id, event_id, ts, value,
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
                FROM events
            )
        ),
        sessions AS (
            SELECT user_id, event_id, value,
                   SUM(is_new) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
            FROM seq
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 2) AS session_value
        FROM sessions
        GROUP BY user_id, session_seq
    """,
    "events_stats": f"""
        WITH med AS (
            {distribution_quantiles_duck(
                "SELECT event_type, value FROM events", "event_type", "value", (0.5,)
            )}
        )
        SELECT e.event_type,
               COUNT(*) AS n,
               ROUND(AVG(e.value), 4) AS avg_value,
               ROUND(STDDEV_SAMP(e.value), 4) AS sd_value,
               ROUND(MAX(m.q0), 4) AS median_value,
               ROUND(MIN(e.value), 4) AS min_value,
               ROUND(MAX(e.value), 4) AS max_value
        FROM events e JOIN med m USING (event_type)
        GROUP BY e.event_type
    """,
}
