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


def q_interarrival_expfit(spark, sf_dir):
    """Per-event-type inter-arrival goodness-of-fit against the
    exponential (Poisson-process) hypothesis: the one-sample KS distance
    between the empirical gap CDF and Exp(λ̂), λ̂ = n/Σgaps — the
    burstiness screen behind rate-anomaly thresholds (a heavy-tailed
    arrival process invalidates a Poisson alarm calibration).

    Exactness: gaps live as INTEGER microseconds (timestamp subtraction
    is exact), so λ̂ and every empirical CDF step are ratios of exact
    integers; the only float transcendental is exp(−λg), identical text
    in both engines. The KS sup is evaluated at both sides of every jump
    (F_emp(g) and F_emp(g⁻)), which attains the sup exactly. Windows are
    PARTITIONED BY event_type over the gap-grain contraction."""
    ev = _t(spark, sf_dir, "events")
    w_seq = W.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = (
        ev.select("event_type", "ts", "event_id")
        .withColumn("prev_ts", F.lag("ts").over(w_seq))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "event_type",
            (
                F.col("ts").cast("double") * 1_000_000
                - F.col("prev_ts").cast("double") * 1_000_000
            )
            .cast("bigint")
            .alias("gap_us"),
        )
    )
    grain = gaps.groupBy("event_type", "gap_us").agg(F.count("*").alias("cnt"))
    w_cum = (
        W.partitionBy("event_type")
        .orderBy("gap_us")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    per_type = W.partitionBy("event_type")
    cum = grain.select(
        "event_type",
        "gap_us",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(per_type).alias("n"),
        F.sum(F.col("gap_us") * F.col("cnt")).over(per_type).alias("sum_us"),
    )
    lam = F.col("n") / (F.col("sum_us") / F.lit(1_000_000.0))  # per second
    f_exp = F.lit(1.0) - F.exp(-lam * (F.col("gap_us") / F.lit(1_000_000.0)))
    d = F.greatest(
        F.abs(F.col("cum") / F.col("n") - f_exp),
        F.abs((F.col("cum") - F.col("cnt")) / F.col("n") - f_exp),
    )
    return cum.groupBy("event_type").agg(
        F.max("n").alias("n_gaps"),
        F.round(F.max(lam) * 3600, 6).alias("lambda_per_hour"),
        F.round(
            F.max(F.col("sum_us")) / F.max("n") / F.lit(1_000_000.0), 6
        ).alias("mean_gap_s"),
        F.round(F.max(d), 5).alias("ks_d"),
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
    "interarrival_expfit": q_interarrival_expfit,
    "events_autocorr": q_events_autocorr,
    "events_dow_seasonality": q_events_dow_seasonality,
    "events_hopping": q_events_hopping,
}

ORACLES = {
    "interarrival_expfit": """
        WITH seq AS (
            SELECT event_type, epoch_us(ts) AS ts_us,
                   LAG(epoch_us(ts)) OVER (PARTITION BY event_type
                                           ORDER BY ts, event_id) AS prev_us
            FROM events
        ),
        gaps AS (
            SELECT event_type, ts_us - prev_us AS gap_us
            FROM seq WHERE prev_us IS NOT NULL
        ),
        grain AS (
            SELECT event_type, gap_us, COUNT(*) AS cnt
            FROM gaps GROUP BY 1, 2
        ),
        cum AS (
            SELECT event_type, gap_us, cnt,
                   SUM(cnt) OVER (PARTITION BY event_type
                                  ORDER BY gap_us) AS cum,
                   SUM(cnt) OVER (PARTITION BY event_type) AS n,
                   SUM(gap_us * cnt) OVER (PARTITION BY event_type) AS sum_us
            FROM grain
        ),
        scored AS (
            SELECT event_type, n, sum_us,
                   GREATEST(
                     ABS(cum / CAST(n AS DOUBLE)
                         - (1.0 - EXP(-(n / (sum_us / 1000000.0))
                                      * (gap_us / 1000000.0)))),
                     ABS((cum - cnt) / CAST(n AS DOUBLE)
                         - (1.0 - EXP(-(n / (sum_us / 1000000.0))
                                      * (gap_us / 1000000.0))))
                   ) AS d
            FROM cum
        )
        SELECT event_type,
               CAST(MAX(n) AS BIGINT) AS n_gaps,
               ROUND(MAX(n / (sum_us / 1000000.0)) * 3600, 6)
                 AS lambda_per_hour,
               ROUND(MAX(sum_us) / MAX(n) / 1000000.0, 6) AS mean_gap_s,
               ROUND(MAX(d), 5) AS ks_d
        FROM scored GROUP BY event_type
    """,
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
