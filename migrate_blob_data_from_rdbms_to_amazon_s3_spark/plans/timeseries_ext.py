"""Time-series diagnostics over the event stream: autocorrelation,
day-of-week seasonality, and hopping (overlapping) windows.

Reference analog: none (SURVEY §2 has no time-series surface). These are
the monitoring primitives an event pipeline runs next to the existing
EWMA / CUSUM / Theil-Sen entries: "is this metric periodic, what does
its weekly shape look like, and what are its sliding-window rates".

Scale shapes:

- ``events_autocorr`` contracts raw events to the (type × day) grain
  first — ONE data-sized aggregation with map-side combine; the ACF
  itself is a day-shifted self-equi-join of that tiny grain table (no
  window over raw rows, no range explosion: lag k is an equi-join on
  day+k) crossed with a 7-row literal lag table (bounded ⇒ broadcast).
- ``events_dow_seasonality`` is the same grain contraction followed by
  windows PARTITIONED BY event_type over ≤7 rows per type.
- ``events_hopping`` is the standard hop-explode: size 600 s / hop
  300 s ⇒ each event lands in exactly 2 windows, a constant 2× row
  fan-out BEFORE the keyed aggregation (map-side combine still
  applies), never a range join. The streaming twin of this shape is
  ``stream_tumbling_windows``; hopping shares its state bound.

Oracles: identical grain/arithmetic in DuckDB. Day numbers are integer
days since 1970-01-01 (epoch-day equi-join key, tz-free); weekday is
Monday=0 in both (Spark ``weekday``, DuckDB ``isodow - 1``).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table as _t

ACF_MAX_LAG = 7
HOP_SIZE_S = 600
HOP_STEP_S = 300


def _daily(spark, sf_dir):
    """(event_type, day, cnt): events contracted to the type×day grain;
    day = integer days since 1970-01-01."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias("day"),
    ).agg(F.count("*").alias("cnt"))


def q_events_autocorr(spark, sf_dir):
    """Per-event-type autocorrelation function of the daily count series
    at lags 1..7 — the periodicity screen (a weekly cycle shows as a
    peak at lag 7). Pairs are (day, day+k) both observed; Pearson corr
    per (type, lag) over the contracted grain."""
    daily = _daily(spark, sf_dir)
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    base = daily.select(
        "event_type", "day", F.col("cnt").alias("x")
    ).crossJoin(F.broadcast(lags))
    shifted = daily.select(
        F.col("event_type").alias("s_type"),
        F.col("day").alias("s_day"),
        F.col("cnt").alias("y"),
    )
    pairs = base.join(
        shifted,
        (F.col("event_type") == F.col("s_type"))
        & (F.col("day") + F.col("lag") == F.col("s_day")),
    )
    return pairs.groupBy("event_type", "lag").agg(
        F.count("*").alias("n_pairs"),
        F.round(F.corr("x", "y"), 6).alias("acf"),
    )


def q_events_dow_seasonality(spark, sf_dir):
    """Per-event-type day-of-week profile: mean daily count per weekday
    (Mon=0), the seasonal index (weekday mean ÷ overall daily mean), and
    the weekday's min/max spread — the weekly-shape fingerprint used to
    deseasonalize rate alarms. Windows run over ≤7 rows per type."""
    daily = _daily(spark, sf_dir)
    dow = daily.groupBy(
        "event_type",
        F.weekday(
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("day").cast("int"))
        ).alias("dow"),
    ).agg(
        F.count("*").alias("n_days"),
        F.sum("cnt").alias("n_events"),
        F.min("cnt").alias("min_daily"),
        F.max("cnt").alias("max_daily"),
    )
    per_type = W.partitionBy("event_type")
    overall = F.sum("n_events").over(per_type) / F.sum("n_days").over(per_type)
    return dow.select(
        "event_type",
        "dow",
        "n_days",
        "n_events",
        "min_daily",
        "max_daily",
        F.round(F.col("n_events") / F.col("n_days"), 4).alias("avg_daily"),
        F.round((F.col("n_events") / F.col("n_days")) / overall, 6).alias(
            "seasonal_index"
        ),
    )


def q_events_hopping(spark, sf_dir):
    """Hopping-window rates: 10-minute windows every 5 minutes (each
    event contributes to exactly size/hop = 2 windows). Output per
    (window_start, event_type): event count, distinct users, value sum.
    The 2× fan-out happens map-side before the keyed aggregation."""
    ev = _t(spark, sf_dir, "events")
    k = spark.range(0, HOP_SIZE_S // HOP_STEP_S).select(F.col("id").alias("k"))
    exploded = ev.select(
        "event_type",
        "user_id",
        "value",
        F.floor(F.col("ts").cast("double") / HOP_STEP_S).alias("bucket"),
    ).crossJoin(F.broadcast(k))
    return (
        exploded.select(
            "event_type",
            "user_id",
            "value",
            ((F.col("bucket") - F.col("k")) * HOP_STEP_S)
            .cast("bigint")
            .alias("window_start_sec"),
        )
        .groupBy("window_start_sec", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
    )


_DAILY_SQL = """
    daily AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    )
"""

QUERIES = {
    "events_autocorr": q_events_autocorr,
    "events_dow_seasonality": q_events_dow_seasonality,
    "events_hopping": q_events_hopping,
}

ORACLES = {
    "events_autocorr": f"""
        WITH {_DAILY_SQL}
        SELECT a.event_type, l.lag,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(CORR(a.cnt, b.cnt), 6) AS acf
        FROM daily a
        CROSS JOIN (SELECT UNNEST(range(1, {ACF_MAX_LAG + 1})) AS lag) l
        JOIN daily b
          ON a.event_type = b.event_type AND a.day + l.lag = b.day
        GROUP BY 1, 2
    """,
    "events_dow_seasonality": f"""
        WITH {_DAILY_SQL},
        dow AS (
            SELECT event_type,
                   isodow(DATE '1970-01-01' + CAST(day AS INT)) - 1 AS dow,
                   COUNT(*) AS n_days,
                   SUM(cnt) AS n_events,
                   MIN(cnt) AS min_daily,
                   MAX(cnt) AS max_daily
            FROM daily GROUP BY 1, 2
        )
        SELECT event_type, dow,
               CAST(n_days AS BIGINT) AS n_days,
               CAST(n_events AS BIGINT) AS n_events,
               CAST(min_daily AS BIGINT) AS min_daily,
               CAST(max_daily AS BIGINT) AS max_daily,
               ROUND(n_events / CAST(n_days AS DOUBLE), 4) AS avg_daily,
               ROUND((n_events / CAST(n_days AS DOUBLE)) /
                     (SUM(n_events) OVER (PARTITION BY event_type) /
                      CAST(SUM(n_days) OVER (PARTITION BY event_type)
                           AS DOUBLE)), 6) AS seasonal_index
        FROM dow
    """,
    "events_hopping": f"""
        WITH exploded AS (
            SELECT event_type, user_id, value,
                   CAST((FLOOR(epoch(ts) / {HOP_STEP_S}) - k.k)
                        * {HOP_STEP_S} AS BIGINT) AS window_start_sec
            FROM events
            CROSS JOIN (SELECT UNNEST(range(0, {HOP_SIZE_S // HOP_STEP_S}))
                        AS k) k
        )
        SELECT window_start_sec, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               ROUND(SUM(value), 4) AS value_sum
        FROM exploded
        GROUP BY 1, 2
    """,
}
