"""Temporal join operators Spark lacks as built-ins: as-of join and
range join, expressed as compositions of existing DataFrame ops (the
SURVEY §7 "custom operators" path (a) — no Python in the hot path).

Reference analog: none (the reference is batch CRUD; SURVEY §2 D records
zero joins). These are the time-series operators a training-data /
event-pipeline engine needs, built scale-first:

- As-of join: union + running last_value over a single shuffle on the
  join key. No range explosion, no per-row probe: cost is one sort-shuffle
  of both inputs — the plan that survives 100 TB of events.
- Range join: epoch bucketing turns the inequality join into an equi-join
  on (key, bucket) with a bounded 2x candidate fan-out, then the exact
  range predicate filters. Never O(n^2); skew on hot users is handled by
  AQE skew-join splitting.

Oracles: DuckDB has native ASOF JOIN and inequality joins, so both are
fully value-checked.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..sources.tables import load_table as _t

RANGE_SECONDS = 300  # range-join lookback window (5 minutes)


def asof_join(left, right, on, ts_col, value_cols):
    """Generic as-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` and equal keys.

    Implementation: tag sides, union, and take a running ``last(...,
    ignorenulls)`` over a window partitioned by the key, ordered by
    ``(ts, side)`` with the right side first so an equal-timestamp right
    row is visible to the left row ("at or before" semantics). One shuffle
    on the key; state per row is O(1).
    """
    lt = left.withColumn("_side", F.lit(1))
    rt = right.withColumn("_side", F.lit(0))
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.filter(F.col("_side") == 1).drop("_side")


def q_asof_join(spark, sf_dir):
    """For every click event, the user's most recent purchase at or before
    the click (event-time as-of). Purchases are pre-aggregated per
    (user, ts) so the match value is deterministic on ties."""
    ev = _t(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 4).alias("purchase_value"))
        .withColumn("purchase_ts", F.col("ts"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        ts_col="ts",
        value_cols=["purchase_ts", "purchase_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "purchase_value",
    )


def q_range_join(spark, sf_dir):
    """For every error event, how many clicks the same user made in the
    5 minutes before it (exclusive). Equi-join on (user, epoch-bucket)
    with 2x candidate fan-out on the build side, exact predicate after."""
    ev = _t(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").cast("double").alias("e_ts")
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").cast("double").alias("c_ts"),
        F.floor(F.col("ts").cast("double") / RANGE_SECONDS).alias("c_bucket"),
    )
    # an in-range click lives in the error's bucket or the one before it
    cand = err.select(
        "event_id",
        "user_id",
        "e_ts",
        F.explode(
            F.array(
                F.floor(F.col("e_ts") / RANGE_SECONDS) - 1,
                F.floor(F.col("e_ts") / RANGE_SECONDS),
            )
        ).alias("c_bucket"),
    )
    joined = cand.join(
        clk,
        (cand.user_id == clk.c_user)
        & (cand.c_bucket == clk.c_bucket)
        & (clk.c_ts >= cand.e_ts - RANGE_SECONDS)
        & (clk.c_ts < cand.e_ts),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("c_ts").alias("n_clicks_before")
    )


def q_click_to_purchase_latency(spark, sf_dir):
    """Time-to-conversion histogram: for every click, the user's NEXT
    purchase at-or-after it (FORWARD as-of), bucketed into latency bands
    — the funnel-latency table product analytics reads. The forward
    direction reuses the backward `asof_join` machinery on NEGATED epoch
    seconds (latest -ts <= -click_ts == earliest ts >= click_ts), so it
    stays the one-shuffle union+window plan; the oracle is the
    straightforward (quadratic-ish) range join + MIN, which DuckDB's
    IEJoin handles at fixture scale."""
    ev = _t(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").cast("timestamp").cast("long").alias("p_epoch"))
        .groupBy("user_id", "p_epoch")
        .agg(F.count("*").alias("_n"))
        .select("user_id", (-F.col("p_epoch")).alias("nts"), F.col("p_epoch"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("c_epoch"),
    ).select("event_id", "user_id", (-F.col("c_epoch")).alias("nts"), "c_epoch")
    joined = asof_join(
        clicks, purchases, on=["user_id"], ts_col="nts", value_cols=["p_epoch"]
    )
    delta = F.col("p_epoch") - F.col("c_epoch")
    bucket = (
        F.when(F.col("p_epoch").isNull(), "never")
        .when(delta < 60, "lt_1m")
        .when(delta < 600, "lt_10m")
        .when(delta < 3600, "lt_1h")
        .otherwise("ge_1h")
    )
    return (
        joined.select(bucket.alias("latency_bucket"))
        .groupBy("latency_bucket")
        .agg(F.count("*").alias("n_clicks"))
    )


def q_events_gap_fill(spark, sf_dir):
    """Time-series gap-filling with forward-fill (the resample/ffill
    primitive Spark lacks as a built-in): each user's event stream is
    down-sampled to a daily grid spanning [their first day, their last
    day]; days with no events are emitted with the LAST observed day's
    value carried forward. Per day the representative value is the
    arg-max event by (ts, event_id) — "last write wins", deterministic
    under timestamp ties.

    Plan: one (user, day)-grain agg (combiner-friendly; the arg-max is
    a constant-state struct max), a per-user span agg, the grid
    explodes from sequence() map-side, and the fill is one per-user
    window (`last value IGNORE NULLS` over rows preceding — O(1) state
    per row). Grid size is span/step per user — bounded by the
    calendar, not the event count — and every stage shuffles on
    user-grain keys, so the plan survives any corpus size; hot users
    cost their span, never their event count, in the window."""
    ev = _t(spark, sf_dir, "events")
    day = F.to_date("ts")
    daily = (
        ev.select(
            "user_id",
            day.alias("day"),
            F.struct("ts", "event_id", "value").alias("s"),
        )
        .groupBy("user_id", "day")
        .agg(F.count("*").alias("n_obs"), F.max("s").alias("last_s"))
        .select(
            "user_id",
            "day",
            "n_obs",
            F.round(F.col("last_s.value"), 4).alias("day_value"),
        )
    )
    span = ev.groupBy("user_id").agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    grid = span.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("n_obs").isNotNull().alias("observed"),
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
            F.last("day_value", ignorenulls=True).over(w).alias("value_filled"),
        )
    )


QUERIES = {
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "click_to_purchase_latency": q_click_to_purchase_latency,
    "events_gap_fill": q_events_gap_fill,
}

ORACLES = {
    "asof_join": """
        WITH p AS (
            SELECT user_id, ts AS purchase_ts,
                   ROUND(MAX(value), 4) AS purchase_value
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id, ts
        ),
        c AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        )
        SELECT c.event_id, c.user_id,
               strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
               strftime(p.purchase_ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
               p.purchase_value
        FROM c ASOF LEFT JOIN p
          ON c.user_id = p.user_id AND c.ts >= p.purchase_ts
    """,
    "range_join": f"""
        SELECT e.event_id, e.user_id, COUNT(c.ts) AS n_clicks_before
        FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
        LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
          ON e.user_id = c.user_id
         AND c.ts >= e.ts - INTERVAL {RANGE_SECONDS} SECOND
         AND c.ts < e.ts
        GROUP BY e.event_id, e.user_id
    """,
    "click_to_purchase_latency": """
        WITH p AS (
            SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'purchase'
        ),
        c AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
        ),
        nxt AS (
            SELECT c.event_id, c.ts AS cts, MIN(p.ts) AS pts
            FROM c LEFT JOIN p
              ON p.user_id = c.user_id AND p.ts >= c.ts
            GROUP BY 1, 2
        )
        SELECT CASE WHEN pts IS NULL THEN 'never'
                    WHEN date_diff('second', cts, pts) < 60 THEN 'lt_1m'
                    WHEN date_diff('second', cts, pts) < 600 THEN 'lt_10m'
                    WHEN date_diff('second', cts, pts) < 3600 THEN 'lt_1h'
                    ELSE 'ge_1h' END AS latency_bucket,
               COUNT(*) AS n_clicks
        FROM nxt
        GROUP BY 1
    """,
    "events_gap_fill": """
        WITH daily AS (
            SELECT user_id, day, n_obs, ROUND(day_value, 4) AS day_value
            FROM (
                SELECT user_id, CAST(ts AS DATE) AS day, value AS day_value,
                       ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                          ORDER BY ts DESC, event_id DESC) AS rn,
                       COUNT(*) OVER (PARTITION BY user_id, CAST(ts AS DATE))
                         AS n_obs
                FROM events
            ) WHERE rn = 1
        ),
        span AS (
            SELECT user_id, MIN(CAST(ts AS DATE)) AS d0,
                   MAX(CAST(ts AS DATE)) AS d1
            FROM events GROUP BY user_id
        ),
        grid AS (
            SELECT user_id, CAST(u.d AS DATE) AS day
            FROM span,
                 LATERAL (SELECT UNNEST(generate_series(d0, d1, INTERVAL 1 DAY))
                                 AS d) u
        ),
        j AS (
            SELECT g.user_id, g.day, d.n_obs, d.day_value
            FROM grid g LEFT JOIN daily d USING (user_id, day)
        )
        SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
               n_obs IS NOT NULL AS observed,
               COALESCE(n_obs, 0) AS n_obs,
               last_value(day_value IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY day
                         ROWS UNBOUNDED PRECEDING) AS value_filled
        FROM j
    """,
}
