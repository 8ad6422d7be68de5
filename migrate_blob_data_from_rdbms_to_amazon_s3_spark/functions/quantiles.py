"""Distribution-method exact grouped quantiles.

Spark's ``percentile`` (and its frequency-weighted form) buffers every
value of a group inside ONE aggregation buffer — exact, but O(group)
executor memory, which is the documented cutover-to-approx reason in
``plans/analytics_ext.q_grouped_percentiles``. For FIXED-PRECISION
value domains (prices are cents-exact doubles in the fixtures — max
residual ~1e-9 — and in any ledger-derived table by construction) the
buffering is unnecessary: quantize values to integer grains, aggregate
the (group, grain) COUNT/WEIGHT distribution — bounded by the VALUE
DOMAIN, not the row count — and reproduce ``quantile_cont``'s linear
interpolation from cumulative counts. Exact result, map-side partial
aggregation, no per-group buffering anywhere.

This is the classic counting-distribution quantile (the same shape as
counting sort's histogram pass), generalized to frequency weights: the
expanded sequence x_0..x_{N-1} (each value repeated ``weight`` times,
N = total weight) has x_i = min{v : cumweight(v) >= i + 1}, so rank
r = (N-1)p is straddled by the rows whose running weight first reaches
floor(r)+1 and floor(r)+2, and quantile_cont = vlo + h (vhi - vlo),
h = r - floor(r).

Scale shape: one partial-aggregated groupBy at the (group, grain)
grain, one per-group window over DISTINCT grains, one 2-rows-per-
(group, p) conditional-min aggregation. At 100 TB the window input is
|groups| x |distinct grains| whatever the row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distribution_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    ps: tuple[float, ...],
    weight_col: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """Exact grouped ``quantile_cont`` without per-group buffering.

    Returns one row per group: ``(group_col, n_rows, total_weight,
    q0..q{len(ps)-1})`` with the quantiles as UNROUNDED doubles (callers
    round/alias). ``value_col`` must be exact at the 1/``scale`` grain
    (enforced nowhere — the caller owns the domain knowledge; prices
    are cents). Without ``weight_col`` every row weighs 1 and
    ``total_weight == n_rows``. The arithmetic (cent reconstruction,
    h = (N-1)p - floor((N-1)p), vlo + h (vhi - vlo), all DOUBLE) is
    written identically in the DuckDB oracle twins so the engines can
    never disagree on an interpolation ulp."""
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    dist = (
        df.select(
            group_col,
            F.round(F.col(value_col) * scale).cast("long").alias("__c"),
            w.alias("__w"),
        )
        .groupBy(group_col, "__c")
        .agg(F.count("*").alias("__cnt"), F.sum("__w").alias("__wsum"))
    )
    wc = Window.partitionBy(group_col).orderBy("__c")
    wn = Window.partitionBy(group_col)
    cum = dist.select(
        group_col,
        "__c",
        F.sum("__wsum").over(wc).alias("__cum"),
        F.sum("__wsum").over(wn).alias("__N"),
        F.sum("__cnt").over(wn).alias("__nrows"),
    )
    aggs = [F.max("__N").alias("__N"), F.max("__nrows").alias("__nrows")]
    for idx, p in enumerate(ps):
        for off, tag in ((1, "lo"), (2, "hi")):
            # smallest grain whose running weight covers 0-based index
            # floor((N-1)p) + (off-1); NULL past the last index (N=1)
            i = F.floor((F.col("__N") - 1) * F.lit(p)).cast("long") + off
            aggs.append(
                F.min(F.when(F.col("__cum") >= i, F.col("__c"))).alias(f"__{tag}{idx}")
            )
    agg = cum.groupBy(group_col).agg(*aggs)
    outs = [
        F.col(group_col),
        F.col("__nrows").alias("n_rows"),
        F.col("__N").alias("total_weight"),
    ]
    for idx, p in enumerate(ps):
        vlo = F.col(f"__lo{idx}").cast("double") / F.lit(float(scale))
        vhi = F.coalesce(F.col(f"__hi{idx}"), F.col(f"__lo{idx}")).cast(
            "double"
        ) / F.lit(float(scale))
        h = (F.col("__N") - 1) * F.lit(p) - F.floor((F.col("__N") - 1) * F.lit(p))
        outs.append((vlo + h * (vhi - vlo)).alias(f"q{idx}"))
    return agg.select(*outs)
