"""Behavioral-path and reconciliation insights: ordered event paths,
hierarchy share-of-parent, order↔lineitem reconciliation, and
near-duplicate order detection (SURVEY §7 M2 — the business-facing
audits a migration validates with and an analyst runs daily).

Scale notes (100 TB):
- ``event_path_topk`` truncates each basket to its first PATH_LEN events
  BEFORE collecting (window rank at the (user, day) grain), so the path
  string is bounded; the frequency count is one shuffle over
  basket-grain rows and the top-k is a TakeOrdered.
- ``hierarchy_share`` aggregates at the nation grain once; the region
  parent totals are a second aggregation OVER THE FIRST (25-row input),
  re-attached by broadcast — no window over raw rows, no re-scan.
- ``order_reconciliation_audit`` is the migration-validation join: both
  sides pre-aggregate to the order grain before the equi-join, and only
  mismatch counts leave the final aggregation.
- ``duplicate_order_detection`` windows PARTITIONED BY the candidate
  identity (custkey, totalprice) — each partition is a handful of rows
  even at 100 TB because the identity itself is selective; a pair
  self-join would square the hot identities instead.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.quantiles import distribution_quantiles_duck
from ..sources.tables import load_table as _t

PATH_LEN = 5
PATH_TOPK = 20
RECON_TOL = 0.05  # relative deviation that flags an order
DUP_WINDOW_DAYS = 90
DUP_BUCKET = 1000  # totals in the same $1000 band count as "the same amount"


def q_event_path_topk(spark, sf_dir):
    """Top-PATH_TOPK ordered behavioral paths: each (user, day) basket's
    first PATH_LEN event types joined with '>', counted across baskets —
    the navigation-pattern mining every product-analytics pipeline runs.
    Deterministic order by (ts, event_id); paths truncate at the window
    rank, never collect unbounded arrays."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", F.to_date("ts")).orderBy("ts", "event_id")
    steps = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PATH_LEN)
        .select("user_id", F.to_date("ts").alias("day"), "rn", "event_type")
    )
    paths = steps.groupBy("user_id", "day").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(rn, event_type))),"
            " s -> s.event_type), '>')"
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_baskets"))
        .orderBy(F.desc("n_baskets"), "path")
        .limit(PATH_TOPK)
    )


def q_hierarchy_share(spark, sf_dir):
    """Share-of-parent rollup: each nation's order revenue as a share of
    its region's total. One customer→orders aggregation to the nation
    grain; the region totals aggregate THAT (25 rows), broadcast back —
    the hierarchy ratio without a window over raw rows."""
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    nat = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.sum("o_totalprice").alias("nat_rev"))
        .join(nation, F.col("c_nationkey") == nation.n_nationkey)
        .join(region, F.col("n_regionkey") == region.r_regionkey)
        .select("r_name", "n_name", "nat_rev")
    )
    reg = nat.groupBy(F.col("r_name").alias("rr")).agg(F.sum("nat_rev").alias("reg_rev"))
    return (
        nat.join(F.broadcast(reg), nat.r_name == reg.rr)
        .select(
            "r_name",
            "n_name",
            F.round("nat_rev", 2).alias("nation_revenue"),
            F.round(F.col("nat_rev") / F.col("reg_rev"), 6).alias("share_of_region"),
        )
        .orderBy("r_name", "n_name")
    )


def q_order_reconciliation_audit(spark, sf_dir):
    """Order↔lineitem reconciliation: per order, the lineitem-derived
    charge Σ price·(1−disc)·(1+tax) vs o_totalprice; report how many
    orders deviate beyond RECON_TOL relative tolerance, how many have no
    lineitems at all, and the worst relative deviation. The validation
    every RDBMS→lake migration runs before cutover (the engine's
    validate_migration counterpart at the business-value grain)."""
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = _t(spark, sf_dir, "lineitem")
    derived = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("derived")
    )
    joined = orders.join(derived, "o_orderkey", "left").select(
        "o_orderkey",
        "o_totalprice",
        "derived",
        F.when(
            F.col("derived").isNotNull(),
            F.abs(F.col("derived") - F.col("o_totalprice")) / F.col("o_totalprice"),
        ).alias("rel_dev"),
    )
    return joined.agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("derived").isNull().cast("int")).alias("n_no_lineitems"),
        F.sum((F.col("rel_dev") > RECON_TOL).cast("int")).alias("n_mismatched"),
        F.round(F.max("rel_dev"), 6).alias("worst_rel_dev"),
        F.round(F.avg("rel_dev"), 6).alias("avg_rel_dev"),
    )


def q_duplicate_order_detection(spark, sf_dir):
    """Near-duplicate order screen: orders by the same customer with a
    similar total (same DUP_BUCKET-dollar band — floor, not round, so
    both engines bucket identically at band edges) within
    DUP_WINDOW_DAYS — the double-submit / double-charge candidates. The
    window partitions by the candidate identity (custkey, price band);
    lag gives the previous occurrence, so each flagged row carries its
    predecessor and the day gap. Output: the flagged pairs, oldest
    first."""
    o = _t(spark, sf_dir, "orders")
    band = F.floor(F.col("o_totalprice") / DUP_BUCKET).alias("band")
    w = Window.partitionBy("o_custkey", "band").orderBy("o_orderdate", "o_orderkey")
    flagged = (
        o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", band)
        .withColumn("prev_key", F.lag("o_orderkey").over(w))
        .withColumn("prev_date", F.lag("o_orderdate").over(w))
        .withColumn("gap_days", F.datediff("o_orderdate", "prev_date"))
        .filter(F.col("prev_key").isNotNull() & (F.col("gap_days") <= DUP_WINDOW_DAYS))
    )
    return flagged.select(
        "o_custkey",
        F.col("prev_key").alias("first_orderkey"),
        F.col("o_orderkey").alias("dup_orderkey"),
        F.col("band").cast("bigint").alias("price_band"),
        F.round("o_totalprice", 2).alias("totalprice"),
        "gap_days",
    ).orderBy("o_custkey", "first_orderkey", "dup_orderkey")


CONC_PCTL = 0.8  # customers at/above this revenue percentile form the "top"


def q_revenue_concentration(spark, sf_dir):
    """Revenue-concentration (Pareto 80/20) audit: what share of total
    revenue comes from the top quintile of customers? Per-customer
    revenue aggregates once; the quintile boundary is ONE exact
    percentile broadcast back as a scalar cut (the rfm/quality-filter
    discipline — a rank formulation would single-partition every
    customer); the report is one more aggregation over the customer
    grain. Ties at the cut land in the top group in both engines (>=).

    Round 7: the cut comes from the COUNT-DISTRIBUTION method
    (functions/quantiles, grain space) — the previous global
    ``percentile`` buffered every customer's revenue in one aggregation
    buffer. The >= comparison runs on integer-grain cents against the
    grain cut, so a tie at the boundary can never be decided by a
    reconstruction or sum-order ulp in either engine."""
    from ..functions.quantiles import distribution_quantiles

    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    cut = distribution_quantiles(
        per_cust, None, "rev", (CONC_PCTL,), grain_space=True
    ).select(F.col("q0").alias("cut"))
    top = F.round(F.col("rev") * 100).cast("double") >= F.col("cut")
    return per_cust.crossJoin(F.broadcast(cut)).agg(
        F.count("*").alias("n_customers"),
        F.sum(top.cast("int")).alias("n_top"),
        F.round(F.sum("rev"), 2).alias("total_revenue"),
        F.round(F.sum(F.when(top, F.col("rev")).otherwise(0.0)) / F.sum("rev"), 6).alias(
            "top_revenue_share"
        ),
        # cut is in grain (cent) units; display in value units
        F.round(F.first("cut") / 100.0, 4).alias("cut_revenue"),
    )


def q_markov_prediction_accuracy(spark, sf_dir):
    """Self-evaluation of the first-order Markov model: train the
    transition matrix on the whole stream (event_transitions' grain),
    predict each next event as the argmax of its source row
    (deterministic alphabetical tie-break), and score accuracy per source
    type — the eval loop that decides whether first-order navigation
    structure exists at all. The model is a ≤|types|² table: training,
    argmax (window over the tiny matrix), and scoring joins all contract
    to the transition grain before touching raw volume."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
    )
    trans = pairs.groupBy("from_type", "to_type").agg(F.count("*").alias("n"))
    pick_w = Window.partitionBy("from_type").orderBy(F.desc("n"), "to_type")
    pred = (
        trans.withColumn("rk", F.row_number().over(pick_w))
        .filter(F.col("rk") == 1)
        .select("from_type", F.col("to_type").alias("predicted"))
    )
    return (
        pairs.join(F.broadcast(pred), "from_type")
        .groupBy("from_type")
        .agg(
            F.first("predicted").alias("predicted"),
            F.count("*").alias("n_transitions"),
            F.round(
                F.avg((F.col("to_type") == F.col("predicted")).cast("int")), 4
            ).alias("accuracy"),
        )
        .orderBy("from_type")
    )


def q_monthly_revenue_growth(spark, sf_dir):
    """Month-over-month revenue growth: the monthly series contracts to
    ≤12 rows per year, so the lag window partitions by year (each
    January's growth is NULL — no cross-partition lag, stated contract)
    — the dashboard query every finance pipeline materializes. Growth =
    (rev − prev) / prev, exact month grain."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").alias("yr"), F.month("o_orderdate").alias("mo")
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.partitionBy("yr").orderBy("mo")
    return (
        monthly.withColumn("prev", F.lag("revenue").over(w))
        .select(
            "yr",
            "mo",
            "revenue",
            F.round(F.try_divide(F.col("revenue") - F.col("prev"), F.col("prev")), 6).alias(
                "mom_growth"
            ),
        )
        .orderBy("yr", "mo")
    )


PAGE_SIZE = 5
SESSION_GAP_SEC = 1800


def q_session_length_stats(spark, sf_dir):
    """Corpus-level session-shape profile: sessions form by the 30-min
    gap rule (the events_sessionize grain), then ONE aggregate over the
    session grain reports count, mean/median/p90 of events-per-session,
    and mean/p90 duration — the distribution a capacity planner and a
    session-window tuner both read. Percentiles come from the
    COUNT-DISTRIBUTION method (functions/quantiles; round 7 — the
    session grain is unbounded at scale, and the previous global
    ``percentile`` buffered every session in one aggregation buffer):
    events-per-session at integer grain, durations at millisecond
    grain."""
    from ..functions.quantiles import distribution_quantiles
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    ms = F.unix_millis("ts")
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag(ms).over(w).isNull() | ((ms - F.lag(ms).over(w)) > SESSION_GAP_SEC * 1000),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sess = (
        seq.withColumn("session_seq", F.sum("is_new").over(w_run))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            ((F.max(ms) - F.min(ms)) / 1000.0).alias("duration_sec"),
        )
        # three consumers (base aggregate + two quantile passes) — one
        # materialization of the session grain
        .localCheckpoint(eager=False)
    )
    base = sess.agg(
        F.count("*").alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("avg_events"),
        F.round(F.avg("duration_sec"), 2).alias("avg_duration_sec"),
    )
    # ONE melted distribution pass for both metrics (round 8, VERDICT r7
    # item 4 — the two separate passes each paid the full prefix-sum
    # machinery): durations pre-scale to the millisecond grain so both
    # metrics share scale=1 ((max-min) ms round-trips /1000*1000 under
    # round() exactly); the ms-space quantile divides back by 1000 at
    # the end, mirrored in the DuckDB twin.
    melted = sess.selectExpr(
        "stack(2, 'e', CAST(n_events AS DOUBLE), "
        "'d', duration_sec * 1000) AS (metric, v)"
    )
    q = distribution_quantiles(melted, "metric", "v", (0.5, 0.9), scale=1)
    qs = q.groupBy().agg(
        F.round(
            F.max(F.when(F.col("metric") == "e", F.col("q0"))), 4
        ).alias("p50_events"),
        F.round(
            F.max(F.when(F.col("metric") == "e", F.col("q1"))), 4
        ).alias("p90_events"),
        F.round(
            F.max(F.when(F.col("metric") == "d", F.col("q1"))) / 1000.0, 2
        ).alias("p90_duration_sec"),
    )
    return base.crossJoin(F.broadcast(qs)).select(
        "n_sessions",
        "avg_events",
        "p50_events",
        "p90_events",
        "avg_duration_sec",
        "p90_duration_sec",
    )


def q_order_frequency_histogram(spark, sf_dir):
    """Frequency-of-frequencies: how many customers placed exactly k
    orders — the engagement histogram behind retention models and the
    sanity check on key-skew assumptions (cf. key_skew_audit). Two
    aggregations, each combiner-friendly; output is ≤ max-k rows."""
    o = _t(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.count("*").alias("k"))
    return (
        per_cust.groupBy("k")
        .agg(F.count("*").alias("n_customers"))
        .orderBy("k")
    )


def q_keyset_page_aggregates(spark, sf_dir):
    """Keyset pagination over a DERIVED table: page 2 of nations ranked
    by revenue, fetched by seeking past page 1's boundary row instead of
    OFFSET-scanning — the parity pagination lesson (operators/
    pagination.keyset_page) applied to aggregate results, where OFFSET
    would recompute and discard the whole prefix. Boundary and pages are
    all TakeOrdered top-k; no global window anywhere. The oracle is the
    OFFSET formulation, equivalent under the (revenue DESC, name) total
    order."""
    nation = F.broadcast(_t(spark, sf_dir, "nation").select("n_nationkey", "n_name"))
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    page1 = rev.orderBy(F.desc("revenue"), "n_name").limit(PAGE_SIZE)
    boundary = page1.orderBy("revenue", F.desc("n_name")).limit(1).select(
        F.col("revenue").alias("b_rev"), F.col("n_name").alias("b_name")
    )
    return (
        rev.crossJoin(F.broadcast(boundary))
        .filter(
            (F.col("revenue") < F.col("b_rev"))
            | ((F.col("revenue") == F.col("b_rev")) & (F.col("n_name") > F.col("b_name")))
        )
        .select("n_name", "revenue")
        .orderBy(F.desc("revenue"), "n_name")
        .limit(PAGE_SIZE)
    )


def q_events_props_stats(spark, sf_dir):
    """Schema-on-read over the semi-structured props column: extract the
    JSON field k per event type with null-tolerant casting, report
    count / missing / range / distinct — the first query anyone runs on
    a landed JSON side-channel before promoting it to a real column.
    Extraction is a JVM-side json path (no Python), one aggregation."""
    ev = _t(spark, sf_dir, "events")
    k = F.expr("try_cast(get_json_object(props, '$.k') AS INT)")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("k").isNull().cast("int")).alias("n_missing"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("distinct_k"),
        )
        .orderBy("event_type")
    )


DIV_YEAR = 1996


def q_relational_division(spark, sf_dir):
    """Relational division ("for all"): suppliers with lineitem activity
    in EVERY month of 1996 — the one relational-algebra operator SQL has
    no keyword for, expressed as the scale-right reduction: contract to
    the (supplier, month) grain first (combiner-friendly distinct), then
    divide via count(distinct month) == 12. Never a 12-way self-join.
    Output: qualifying suppliers and their year revenue."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == DIV_YEAR
    ).select("o_orderkey", F.month("o_orderdate").alias("mo"))
    # no broadcast hint: supplier grows with SF (round-7 fix) — AQE
    # broadcasts while small, shuffle-joins on s_suppkey past that
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    cov = joined.groupBy("l_suppkey").agg(
        F.countDistinct("mo").alias("n_months"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("year_revenue"),
    )
    return (
        cov.filter(F.col("n_months") == 12)
        .join(supp, cov.l_suppkey == supp.s_suppkey)
        .select(F.col("s_suppkey").alias("suppkey"), "s_name", "year_revenue")
        .orderBy("suppkey")
    )


GINI_BUCKETS = 16


def q_revenue_gini(spark, sf_dir):
    """Exact Gini coefficient of customer revenue WITHOUT a global
    window: ascending ranks come from the distributed_global_rank
    machinery (percentile cut buckets + B-row prefix offsets + bucket-
    partitioned row_number), then G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n. The
    single-partition ROW_NUMBER formulation is oracle-only. The
    inequality number every mix/quota audit wants next to
    revenue_concentration's top-share."""
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    # Bucket boundaries via the COUNT-DISTRIBUTION method (round 7 —
    # the previous percentile() buffered every customer's revenue in
    # one aggregation buffer). The cuts only partition work: the global
    # rank i comes from the (rev, custkey) total order, so ANY monotone
    # bucketing yields the identical gini — equal revs always share a
    # bucket (strict > on grains), keeping buckets order-aligned.
    from ..functions.quantiles import distribution_quantiles

    ps = tuple(i / GINI_BUCKETS for i in range(1, GINI_BUCKETS))
    cuts = distribution_quantiles(
        per_cust, None, "rev", ps, grain_space=True
    ).select(F.array(*[F.col(f"q{i}") for i in range(len(ps))]).alias("cuts"))
    bucketed = per_cust.crossJoin(F.broadcast(cuts)).select(
        "o_custkey",
        "rev",
        F.expr(
            "aggregate(cuts, 0, (acc, c) -> "
            "acc + IF(CAST(round(rev * 100) AS DOUBLE) > c, 1, 0))"
        ).alias("b"),
    )
    counts = bucketed.groupBy("b").agg(F.count("*").alias("n"))
    prev = counts.select(F.col("b").alias("pb"), F.col("n").alias("pn"))
    offsets = (
        counts.join(F.broadcast(prev), F.col("pb") < F.col("b"), "left")
        .groupBy("b")
        .agg(F.coalesce(F.sum("pn"), F.lit(0)).alias("offset"))
    )
    w = Window.partitionBy("b").orderBy("rev", "o_custkey")
    ranked = bucketed.join(F.broadcast(offsets), "b").withColumn(
        "i", F.col("offset") + F.row_number().over(w)
    )
    return ranked.agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("rev"), 2).alias("total_revenue"),
        F.round(
            2 * F.sum(F.col("i") * F.col("rev")) / (F.count("*") * F.sum("rev"))
            - (F.count("*") + 1) / F.count("*"),
            6,
        ).alias("gini"),
    )


BACKLOG_TOPK = 10


def q_order_backlog_peaks(spark, sf_dir):
    """Peak order-fulfillment backlog: the BACKLOG_TOPK days with the
    most line items open (ordered but not yet shipped — open on day d
    iff o_orderdate <= d < l_shipdate), via the distributed sweep-line:
    +1/-1 deltas at the day grain, net per day, then a running sum
    WITHOUT a global window — intra-year running sum (window PARTITIONED
    BY year over the bounded day grain) plus per-year prefix offsets
    from the broadcast theta-join trick (the distributed_global_rank
    discipline). The naive SUM() OVER (ORDER BY day) — one partition
    holding every day — is the oracle only.

    Scale shape: one join to attach order dates, one day-grain net
    aggregation (constant-size output: |days|), year-grain offsets over
    a handful of rows, TakeOrdered for the peaks. Raw lineitem volume
    touches exactly two shuffles."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    spans = li.join(
        o, li.l_orderkey == o.o_orderkey
    ).select(
        F.to_date("o_orderdate").alias("start_d"),
        F.to_date("l_shipdate").alias("end_d"),
    )
    # NOTE (r13, measured): do NOT inline()-mirror this union. Each
    # union branch re-runs only the post-shuffle join tail (the heavy
    # exchanges are runtime-reused) and partial-aggregates to the tiny
    # |days| grain immediately — generator-doubling the 6M joined rows
    # into one pipeline measured ~65% SLOWER at the sf1 soak (12.0 vs
    # 7.2 s warm). inline() pays off only where it removes a barrier or
    # dedups an expensive subtree — see _knn_scored_pairs.
    deltas = spans.select(F.col("start_d").alias("day"), F.lit(1).alias("d")).unionAll(
        spans.select(F.col("end_d").alias("day"), F.lit(-1).alias("d"))
    )
    net = deltas.groupBy("day").agg(F.sum("d").alias("net"))
    yr = net.withColumn("y", F.year("day"))
    ynet = yr.groupBy("y").agg(F.sum("net").alias("ynet"))
    prev = ynet.select(F.col("y").alias("py"), F.col("ynet").alias("pn"))
    offsets = (
        ynet.join(F.broadcast(prev), F.col("py") < F.col("y"), "left")
        .groupBy("y")
        .agg(F.coalesce(F.sum("pn"), F.lit(0)).alias("offset"))
    )
    w = Window.partitionBy("y").orderBy("day")
    backlog = (
        yr.join(F.broadcast(offsets), "y")
        .withColumn("open_lines", F.col("offset") + F.sum("net").over(w))
        .select("day", F.col("open_lines").cast("bigint").alias("open_lines"))
    )
    return backlog.orderBy(F.desc("open_lines"), "day").limit(BACKLOG_TOPK)


QUERIES = {
    "order_backlog_peaks": q_order_backlog_peaks,
    "relational_division": q_relational_division,
    "revenue_gini": q_revenue_gini,
    "session_length_stats": q_session_length_stats,
    "order_frequency_histogram": q_order_frequency_histogram,
    "keyset_page_aggregates": q_keyset_page_aggregates,
    "events_props_stats": q_events_props_stats,
    "markov_prediction_accuracy": q_markov_prediction_accuracy,
    "monthly_revenue_growth": q_monthly_revenue_growth,
    "revenue_concentration": q_revenue_concentration,
    "event_path_topk": q_event_path_topk,
    "hierarchy_share": q_hierarchy_share,
    "order_reconciliation_audit": q_order_reconciliation_audit,
    "duplicate_order_detection": q_duplicate_order_detection,
}

ORACLES = {
    "order_backlog_peaks": f"""
        WITH spans AS (
            SELECT CAST(o.o_orderdate AS DATE) AS start_d,
                   CAST(l.l_shipdate AS DATE) AS end_d
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        deltas AS (
            SELECT start_d AS day, 1 AS d FROM spans
            UNION ALL SELECT end_d AS day, -1 AS d FROM spans
        ),
        net AS (SELECT day, SUM(d) AS net FROM deltas GROUP BY day),
        backlog AS (
            SELECT day,
                   CAST(SUM(net) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open_lines
            FROM net
        )
        SELECT day, open_lines FROM backlog
        ORDER BY open_lines DESC, day LIMIT {BACKLOG_TOPK}
    """,
    "relational_division": f"""
        WITH joined AS (
            SELECT l.l_suppkey,
                   EXTRACT(month FROM o.o_orderdate) AS mo,
                   l.l_extendedprice * (1 - l.l_discount) AS rev
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE EXTRACT(year FROM o.o_orderdate) = {DIV_YEAR}
        ),
        cov AS (
            SELECT l_suppkey, COUNT(DISTINCT mo) AS n_months,
                   ROUND(SUM(rev), 2) AS year_revenue
            FROM joined GROUP BY 1
        )
        SELECT s.s_suppkey AS suppkey, s.s_name, cov.year_revenue
        FROM cov JOIN supplier s ON cov.l_suppkey = s.s_suppkey
        WHERE cov.n_months = 12
        ORDER BY suppkey
    """,
    "revenue_gini": """
        WITH per_cust AS (
            SELECT o_custkey, SUM(o_totalprice) AS rev FROM orders GROUP BY 1
        ),
        ranked AS (
            SELECT rev,
                   ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS i
            FROM per_cust
        )
        SELECT COUNT(*) AS n_customers,
               ROUND(SUM(rev), 2) AS total_revenue,
               ROUND(2 * SUM(i * rev) / (COUNT(*) * SUM(rev))
                     - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini
        FROM ranked
    """,
    "session_length_stats": f"""
        WITH seq AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN prev_ms IS NULL
                             OR (epoch_ms(ts) - prev_ms) > {SESSION_GAP_SEC * 1000}
                        THEN 1 ELSE 0 END AS is_new
            FROM (
                SELECT user_id, ts, event_id,
                       LAG(epoch_ms(ts)) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) AS prev_ms
                FROM events
            )
        ),
        sess AS (
            SELECT user_id,
                   SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_seq,
                   epoch_ms(ts) AS ms
            FROM seq
        ),
        grains AS (
            SELECT user_id, session_seq, COUNT(*) AS n_events,
                   (MAX(ms) - MIN(ms)) / 1000.0 AS duration_sec
            FROM sess GROUP BY 1, 2
        ),
        base AS (
            SELECT COUNT(*) AS n_sessions,
                   ROUND(AVG(n_events), 4) AS avg_events,
                   ROUND(AVG(duration_sec), 2) AS avg_duration_sec
            FROM grains
        ),
        melted AS (
            SELECT 'e' AS metric, CAST(n_events AS DOUBLE) AS v FROM grains
            UNION ALL
            SELECT 'd', duration_sec * 1000 FROM grains
        ),
        qs AS (
            SELECT ROUND(MAX(CASE WHEN metric = 'e' THEN q0 END), 4) AS p50_events,
                   ROUND(MAX(CASE WHEN metric = 'e' THEN q1 END), 4) AS p90_events,
                   ROUND(MAX(CASE WHEN metric = 'd' THEN q1 END) / 1000.0, 2)
                       AS p90_duration_sec
            FROM ({distribution_quantiles_duck(
                "SELECT metric, v FROM melted", "metric", "v", (0.5, 0.9),
                scale=1,
            )})
        )
        SELECT n_sessions, avg_events, p50_events, p90_events,
               avg_duration_sec, p90_duration_sec
        FROM base, qs
    """,
    "order_frequency_histogram": """
        WITH per_cust AS (
            SELECT o_custkey, COUNT(*) AS k FROM orders GROUP BY 1
        )
        SELECT k, COUNT(*) AS n_customers FROM per_cust GROUP BY k ORDER BY k
    """,
    "keyset_page_aggregates": f"""
        WITH rev AS (
            SELECT n.n_name, ROUND(SUM(o.o_totalprice), 2) AS revenue
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1
        )
        SELECT n_name, revenue FROM rev
        ORDER BY revenue DESC, n_name
        LIMIT {PAGE_SIZE} OFFSET {PAGE_SIZE}
    """,
    "events_props_stats": """
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
               ROUND(AVG(k), 4) AS avg_k,
               MIN(k) AS min_k,
               MAX(k) AS max_k,
               COUNT(DISTINCT k) AS distinct_k
        FROM (
            SELECT event_type,
                   TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events
        )
        GROUP BY event_type ORDER BY event_type
    """,
    "markov_prediction_accuracy": """
        WITH pairs AS (
            SELECT LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS from_type,
                   event_type AS to_type
            FROM events
            QUALIFY from_type IS NOT NULL
        ),
        trans AS (
            SELECT from_type, to_type, COUNT(*) AS n FROM pairs GROUP BY 1, 2
        ),
        pred AS (
            SELECT from_type, to_type AS predicted FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY from_type
                                             ORDER BY n DESC, to_type) AS rk
                FROM trans
            ) WHERE rk = 1
        )
        SELECT p.from_type, MIN(pr.predicted) AS predicted,
               COUNT(*) AS n_transitions,
               ROUND(AVG(CASE WHEN p.to_type = pr.predicted THEN 1 ELSE 0 END), 4)
                 AS accuracy
        FROM pairs p JOIN pred pr USING (from_type)
        GROUP BY p.from_type ORDER BY p.from_type
    """,
    "monthly_revenue_growth": """
        WITH monthly AS (
            SELECT EXTRACT(year FROM o_orderdate) AS yr,
                   EXTRACT(month FROM o_orderdate) AS mo,
                   ROUND(SUM(o_totalprice), 2) AS revenue
            FROM orders GROUP BY 1, 2
        )
        SELECT yr, mo, revenue,
               ROUND((revenue - LAG(revenue) OVER (PARTITION BY yr ORDER BY mo))
                     / LAG(revenue) OVER (PARTITION BY yr ORDER BY mo), 6)
                 AS mom_growth
        FROM monthly ORDER BY yr, mo
    """,
    "revenue_concentration": f"""
        WITH per_cust AS (
            SELECT o_custkey, SUM(o_totalprice) AS rev FROM orders GROUP BY 1
        ),
        cut AS (
            SELECT q0 AS cut FROM ({distribution_quantiles_duck(
                "SELECT rev FROM per_cust", None, "rev", (CONC_PCTL,),
                grain_space=True,
            )})
        )
        SELECT COUNT(*) AS n_customers,
               CAST(SUM(CASE WHEN round(rev * 100) >= cut THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_top,
               ROUND(SUM(rev), 2) AS total_revenue,
               ROUND(SUM(CASE WHEN round(rev * 100) >= cut THEN rev ELSE 0 END)
                     / SUM(rev), 6) AS top_revenue_share,
               ROUND(MIN(cut) / 100, 4) AS cut_revenue
        FROM per_cust, cut
    """,
    "event_path_topk": f"""
        WITH steps AS (
            SELECT user_id, CAST(ts AS DATE) AS day, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        paths AS (
            SELECT user_id, day,
                   string_agg(event_type, '>' ORDER BY rn) AS path
            FROM steps WHERE rn <= {PATH_LEN}
            GROUP BY user_id, day
        )
        SELECT path, COUNT(*) AS n_baskets
        FROM paths GROUP BY path
        ORDER BY n_baskets DESC, path LIMIT {PATH_TOPK}
    """,
    "hierarchy_share": """
        WITH nat AS (
            SELECT r.r_name, n.n_name, SUM(o.o_totalprice) AS nat_rev
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1, 2
        ),
        reg AS (SELECT r_name, SUM(nat_rev) AS reg_rev FROM nat GROUP BY 1)
        SELECT nat.r_name, nat.n_name,
               ROUND(nat.nat_rev, 2) AS nation_revenue,
               ROUND(nat.nat_rev / reg.reg_rev, 6) AS share_of_region
        FROM nat JOIN reg USING (r_name)
        ORDER BY nat.r_name, nat.n_name
    """,
    "order_reconciliation_audit": f"""
        WITH derived AS (
            SELECT l_orderkey AS o_orderkey,
                   SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS derived
            FROM lineitem GROUP BY 1
        ),
        joined AS (
            SELECT o.o_orderkey, o.o_totalprice, d.derived,
                   CASE WHEN d.derived IS NOT NULL
                        THEN ABS(d.derived - o.o_totalprice) / o.o_totalprice
                   END AS rel_dev
            FROM orders o LEFT JOIN derived d USING (o_orderkey)
        )
        SELECT COUNT(*) AS n_orders,
               CAST(SUM(CASE WHEN derived IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_no_lineitems,
               CAST(SUM(CASE WHEN rel_dev > {RECON_TOL} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_mismatched,
               ROUND(MAX(rel_dev), 6) AS worst_rel_dev,
               ROUND(AVG(rel_dev), 6) AS avg_rel_dev
        FROM joined
    """,
    "duplicate_order_detection": f"""
        WITH banded AS (
            SELECT o_custkey, o_orderkey, o_totalprice, o_orderdate,
                   CAST(FLOOR(o_totalprice / {DUP_BUCKET}) AS BIGINT) AS band
            FROM orders
        ),
        lagged AS (
            SELECT *,
                   LAG(o_orderkey) OVER (PARTITION BY o_custkey, band
                                         ORDER BY o_orderdate, o_orderkey) AS prev_key,
                   LAG(o_orderdate) OVER (PARTITION BY o_custkey, band
                                          ORDER BY o_orderdate, o_orderkey) AS prev_date
            FROM banded
        )
        SELECT o_custkey,
               prev_key AS first_orderkey,
               o_orderkey AS dup_orderkey,
               band AS price_band,
               ROUND(o_totalprice, 2) AS totalprice,
               CAST(date_diff('day', prev_date, o_orderdate) AS INTEGER) AS gap_days
        FROM lagged
        WHERE prev_key IS NOT NULL
          AND date_diff('day', prev_date, o_orderdate) <= {DUP_WINDOW_DAYS}
        ORDER BY o_custkey, first_orderkey, dup_orderkey
    """,
}
