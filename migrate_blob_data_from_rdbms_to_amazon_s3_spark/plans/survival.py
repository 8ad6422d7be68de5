"""Survival analysis over the order stream: Kaplan-Meier
time-to-repeat-purchase with right-censoring (Kaplan & Meier 1958).

Reference analog: none (the reference is batch CRUD; SURVEY §2 records
no analytics). This is the churn / retention-durability estimator a
customer-event pipeline runs — "how long until a first-time buyer
returns, and how does that differ by market segment" — with customers
who never return handled correctly as censored observations instead of
being dropped (the bias the naive avg-gap query has).

Scale shape (the part that must survive 100 TB of orders):

- Pass 1 contracts orders to the customer grain (first order date) —
  one data-sized shuffle with map-side partial min.
- Pass 2 joins orders back to the first-date table on the same key to
  find the second-purchase date — the join reuses the customer-key
  partitioning, and AQE may broadcast the contracted side at small SF;
  no hint (unbounded subtree).
- Everything after lives at the (segment × duration-day) grain —
  bounded by |segments| · observation-window-days, thousands of rows
  regardless of input size. The K-M recurrences (at-risk prefix sum,
  Π(1 − d/n) as exp(Σ ln)) are windows PARTITIONED BY segment over
  that contracted grain — never over raw rows.

Censoring: a customer with no second purchase is censored at the
dataset's observation end (max order date), entering every risk set
they survive through — the Kaplan-Meier estimator's whole point.

Oracles: the identical grain contraction + window algebra in DuckDB
SQL, sharing the CTE text via ``_KM_CURVE_SQL`` so the two registered
queries cannot drift from each other.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table as _t


def _km_curve(spark, sf_dir):
    """(segment, dur_days, at_risk, events, censored, survival, hazard)
    — the Kaplan-Meier product-limit curve of days from first to second
    purchase, censored at the observation end, per market segment."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")

    first = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("first_dt"))
    # horizon = one global 1-row aggregate (bounded by construction)
    horizon = o.agg(F.max("o_orderdate").alias("end_dt"))
    second = (
        o.join(first, "o_custkey")
        .filter(F.col("o_orderdate") > F.col("first_dt"))
        .groupBy("o_custkey")
        .agg(F.min("o_orderdate").alias("second_dt"))
    )
    subjects = (
        first.join(second, "o_custkey", "left")
        .crossJoin(F.broadcast(horizon))
        .join(c, first.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.coalesce(
                F.datediff("second_dt", "first_dt"),
                F.datediff("end_dt", "first_dt"),
            ).alias("dur_days"),
            F.col("second_dt").isNotNull().cast("int").alias("is_event"),
        )
    )
    grain = subjects.groupBy("segment", "dur_days").agg(
        F.sum("is_event").alias("events"),
        F.sum(1 - F.col("is_event")).alias("censored"),
    )
    w_prev = (
        W.partitionBy("segment")
        .orderBy("dur_days")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_cum = (
        W.partitionBy("segment")
        .orderBy("dur_days")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    n0 = W.partitionBy("segment")
    curve = grain.withColumn(
        "at_risk",
        F.sum(F.col("events") + F.col("censored")).over(n0)
        - F.coalesce(F.sum(F.col("events") + F.col("censored")).over(w_prev), F.lit(0)),
    )
    term = F.when(
        F.col("events") < F.col("at_risk"),
        F.log(F.lit(1.0) - F.col("events") / F.col("at_risk")),
    )
    absorbed = F.max((F.col("events") >= F.col("at_risk")).cast("int")).over(w_cum)
    return curve.select(
        "segment",
        "dur_days",
        "at_risk",
        "events",
        "censored",
        F.when(absorbed == 1, F.lit(0.0))
        .otherwise(F.round(F.exp(F.sum(term).over(w_cum)), 6))
        .alias("survival"),
        F.round(F.col("events") / F.col("at_risk"), 6).alias("hazard"),
    )


def q_survival_kaplan_meier(spark, sf_dir):
    """The full per-segment Kaplan-Meier curve: at each observed
    duration (days from a customer's first to second purchase), the risk
    set, event/censor counts, the product-limit survival estimate, and
    the discrete hazard."""
    return _km_curve(spark, sf_dir)


def q_survival_median_ttr(spark, sf_dir):
    """Per-segment summary of the K-M curve: subjects, repeat events,
    median time-to-repeat (first duration where survival ≤ 0.5) and the
    survival probability at 30/60 days — the retention scorecard row.
    Constant-size aggregation over the already-contracted curve."""
    curve = _km_curve(spark, sf_dir)
    return curve.groupBy("segment").agg(
        F.sum(F.col("events") + F.col("censored")).alias("n_subjects"),
        F.sum("events").alias("n_events"),
        F.min(
            F.when(F.col("survival") <= 0.5, F.col("dur_days"))
        ).alias("median_ttr_days"),
        F.min(
            F.when(F.col("dur_days") <= 30, F.col("survival"))
        ).alias("s30"),
        F.min(
            F.when(F.col("dur_days") <= 60, F.col("survival"))
        ).alias("s60"),
    )


# Shared CTE: the same contraction + window algebra, once, for both
# oracles — S(t) via exp(Σ ln(1 − d/n)) with the absorbing-zero guard.
_KM_CURVE_SQL = """
    subjects AS (
        SELECT c.c_mktsegment AS segment,
               COALESCE(
                   date_diff('day', f.first_dt, s.second_dt),
                   date_diff('day', f.first_dt,
                             (SELECT MAX(o_orderdate) FROM orders))
               ) AS dur_days,
               CASE WHEN s.second_dt IS NULL THEN 0 ELSE 1 END AS is_event
        FROM (SELECT o_custkey, MIN(o_orderdate) AS first_dt
              FROM orders GROUP BY 1) f
        LEFT JOIN (SELECT o.o_custkey, MIN(o.o_orderdate) AS second_dt
                   FROM orders o
                   JOIN (SELECT o_custkey, MIN(o_orderdate) AS first_dt
                         FROM orders GROUP BY 1) f2
                     ON o.o_custkey = f2.o_custkey
                   WHERE o.o_orderdate > f2.first_dt
                   GROUP BY 1) s ON f.o_custkey = s.o_custkey
        JOIN customer c ON f.o_custkey = c.c_custkey
    ),
    grain AS (
        SELECT segment, dur_days,
               SUM(is_event) AS events,
               SUM(1 - is_event) AS censored
        FROM subjects GROUP BY 1, 2
    ),
    curve0 AS (
        SELECT segment, dur_days, events, censored,
               SUM(events + censored) OVER (PARTITION BY segment)
               - COALESCE(SUM(events + censored) OVER (
                     PARTITION BY segment ORDER BY dur_days
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS at_risk
        FROM grain
    ),
    curve AS (
        SELECT segment, dur_days, at_risk, events, censored,
               CASE WHEN MAX(CASE WHEN events >= at_risk THEN 1 ELSE 0 END)
                         OVER (PARTITION BY segment ORDER BY dur_days
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) = 1
                    THEN 0.0
                    ELSE ROUND(EXP(SUM(
                        CASE WHEN events < at_risk
                             THEN LN(1.0 - events / CAST(at_risk AS DOUBLE))
                        END) OVER (PARTITION BY segment ORDER BY dur_days
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW)), 6)
               END AS survival,
               ROUND(events / CAST(at_risk AS DOUBLE), 6) AS hazard
        FROM curve0
    )
"""

QUERIES = {
    "survival_kaplan_meier": q_survival_kaplan_meier,
    "survival_median_ttr": q_survival_median_ttr,
}

ORACLES = {
    "survival_kaplan_meier": f"""
        WITH {_KM_CURVE_SQL}
        SELECT segment, dur_days,
               CAST(at_risk AS BIGINT) AS at_risk,
               CAST(events AS BIGINT) AS events,
               CAST(censored AS BIGINT) AS censored,
               survival, hazard
        FROM curve
    """,
    "survival_median_ttr": f"""
        WITH {_KM_CURVE_SQL}
        SELECT segment,
               CAST(SUM(events + censored) AS BIGINT) AS n_subjects,
               CAST(SUM(events) AS BIGINT) AS n_events,
               MIN(CASE WHEN survival <= 0.5 THEN dur_days END)
                 AS median_ttr_days,
               MIN(CASE WHEN dur_days <= 30 THEN survival END) AS s30,
               MIN(CASE WHEN dur_days <= 60 THEN survival END) AS s60
        FROM curve GROUP BY segment
    """,
}
