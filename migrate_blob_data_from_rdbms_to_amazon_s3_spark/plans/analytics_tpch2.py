"""TPC-H breadth, second tranche: the remaining classic query shapes
(Q2/Q8/Q9/Q12/Q13/Q15/Q16/Q17/Q20/Q21/Q22) adapted to the fixture's
reduced schemas (no partsupp/shipmode/comment columns — each adaptation
keeps the shape's defining plan feature, noted per query).

Scale notes (100 TB):
- nation/region broadcast explicitly (25/5 rows by TPC-H spec — truly
  bounded). part/supplier/customer get NO hint (round-7 fix): they grow
  linearly with SF, and a forced hint on a growing table both risks an
  OOM broadcast at high SF and removes AQE's shuffle-join fallback. AQE
  still broadcasts them whenever the post-filter size fits. The
  lineitem/orders facts shuffle once on their join key, never more.
- Correlated scalar subqueries (Q17's per-part average, Q22's global
  average) are written as plain aggregates + joins so Catalyst plans the
  decorrelated form directly — one pass over the fact per aggregate.
- Exists / not-exists (Q21) become left-semi / left-anti joins: only key
  columns cross the shuffle.
- All money aggregates ROUND(2) and shares ROUND(4) AFTER aggregation, so
  cross-engine float fold order can't flip a hash comparison.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table as _t


def _dim(spark, sf_dir, name):
    """Dimension loader: explicit broadcast ONLY for the spec-bounded
    dims (nation = 25 rows, region = 5 rows, fixed at every SF). Growing
    dims (part/supplier/customer) carry no hint — AQE broadcasts them
    while small and falls back to a shuffle join past the threshold."""
    t = _t(spark, sf_dir, name)
    return F.broadcast(t) if name in ("nation", "region") else t


def _rev():
    # built lazily: a module-scope Column would require an active
    # SparkContext at import time, breaking sessionless oracle_sql() use
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q8_market_share(spark, sf_dir):
    """Q8 shape (national market share): for one region and one part
    type, each supplier-nation's share of yearly revenue. Defining
    feature: conditional numerator over the same aggregated fact —
    share = sum(case) / sum(all) per group."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = _dim(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    sup = _dim(spark, sf_dir, "supplier")
    nat = _dim(spark, sf_dir, "nation")
    reg = _dim(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    j = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(sup.select("s_suppkey", "s_nationkey"), li.l_suppkey == F.col("s_suppkey"))
        .join(nat.select("n_nationkey", "n_name", "n_regionkey"),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg.select("r_regionkey"), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    focal = F.when(F.col("n_name") == "NATION_7", _rev()).otherwise(F.lit(0.0))
    return (
        j.select(F.year("o_orderdate").alias("o_year"), _rev().alias("rev"),
                 focal.alias("focal_rev"))
        .groupBy("o_year")
        .agg(
            F.round(F.sum("focal_rev") / F.sum("rev"), 4).alias("mkt_share"),
            F.round(F.sum("rev"), 2).alias("total_rev"),
        )
    )


def q9_product_profit(spark, sf_dir):
    """Q9 shape (product-type profit): profit per (supplier nation,
    order year) over parts whose name matches a token. Adaptation: no
    partsupp, so profit = discounted revenue (the defining feature — the
    4-way fact-dim join grouped by derived year — is intact)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = _dim(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    sup = _dim(spark, sf_dir, "supplier")
    nat = _dim(spark, sf_dir, "nation")
    j = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(sup.select("s_suppkey", "s_nationkey"), li.l_suppkey == F.col("s_suppkey"))
        .join(nat.select("n_nationkey", "n_name"),
              F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.select(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"), _rev().alias("profit"))
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("profit"), 2).alias("sum_profit"))
    )


def q12_delay_buckets(spark, sf_dir):
    """Q12 shape (shipping-delay severity): lineitems bucketed by how
    long after the order date they shipped, with high/low-priority
    conditional counts per bucket. Adaptation: no shipmode/commitdate —
    the delay bucket replaces shipmode; the defining CASE-aggregation
    over a fact-fact join is intact."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    delay = F.datediff("l_shipdate", "o_orderdate")
    bucket = (
        F.when(delay < 30, "under_30d")
        .when(delay < 60, "30_to_60d")
        .otherwise("over_60d")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.select(bucket.alias("delay_bucket"), high.alias("is_high"))
        .groupBy("delay_bucket")
        .agg(
            F.sum(F.col("is_high").cast("long")).alias("high_line_count"),
            F.sum((~F.col("is_high")).cast("long")).alias("low_line_count"),
        )
    )


def q13_customer_distribution(spark, sf_dir):
    """Q13 shape (customer order-count distribution): LEFT OUTER join so
    zero-order customers survive with count 0, then the distribution of
    customers per order count. Adaptation: the exclusion predicate is on
    priority (no o_comment). Two aggregations, the defining feature."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q15_top_supplier(spark, sf_dir):
    """Q15 shape (top supplier): revenue per supplier over a quarter,
    return the supplier(s) achieving the maximum — the scalar-subquery-
    on-an-aggregate feature. Revenue rounds to 2 BEFORE the max so the
    tie comparison is exact in both engines."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.round(F.sum(_rev()), 2).alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("mx"))
    sup = _dim(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(top), rev.total_revenue == F.col("mx"))
        .join(sup, rev.l_suppkey == sup.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q16_supplier_part_counts(spark, sf_dir):
    """Q16 shape (supplier-count per part attribute): distinct suppliers
    able to supply each (brand, type, size), excluding one brand.
    Adaptation: supply relationships come from lineitem (no partsupp);
    the defining COUNT(DISTINCT) over a dim-filtered join is intact."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = _dim(spark, sf_dir, "part").filter(F.col("p_brand") != "Brand#1")
    return (
        li.join(part.select("p_partkey", "p_brand", "p_type", "p_size"),
                li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q17_small_qty_revenue(spark, sf_dir):
    """Q17 shape (small-quantity order revenue): revenue from lineitems
    whose quantity is below 20% of the part's average quantity — the
    correlated-scalar-subquery-per-group feature, decorrelated as an
    aggregate + rejoin on the part key. The threshold rounds to 4 so the
    comparison is identical cross-engine."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresh = (
        li.groupBy(F.col("l_partkey").alias("t_partkey"))
        .agg(F.round(0.2 * F.avg("l_quantity"), 4).alias("qty_thresh"))
    )
    small = li.join(
        thresh, li.l_partkey == F.col("t_partkey")
    ).filter(F.col("l_quantity") < F.col("qty_thresh"))
    return small.agg(
        F.count("*").alias("n_small_lines"),
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
    )


def q21_waiting_suppliers(spark, sf_dir):
    """Q21 shape (suppliers who kept orders waiting): suppliers with a
    late lineitem on a multi-supplier order where NO other supplier was
    late — the exists + not-exists double correlation, planned as a
    left-semi then left-anti join. Adaptation: late = shipped > 60 days
    after the order date (no commit/receipt dates)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_suppkey",
        (F.datediff("l_shipdate", "o_orderdate") > 60).alias("late"),
    )
    mine_late = j.filter(F.col("late")).select("l_orderkey", "l_suppkey").distinct()
    others = j.select(
        F.col("l_orderkey").alias("o_okey"), F.col("l_suppkey").alias("o_skey"),
        "late",
    )
    # exists: another supplier on the same order (any lateness)
    with_other = mine_late.join(
        others,
        (mine_late.l_orderkey == others.o_okey)
        & (mine_late.l_suppkey != others.o_skey),
        "left_semi",
    )
    # not exists: another supplier on the same order who was ALSO late
    sole_late = with_other.join(
        others.filter(F.col("late")),
        (with_other.l_orderkey == others.o_okey)
        & (with_other.l_suppkey != others.o_skey),
        "left_anti",
    )
    sup = _dim(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(sup, sole_late.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


def q22_dormant_customers(spark, sf_dir):
    """Q22 shape (global sales opportunity): customers with above-average
    balance and no orders, grouped by a key prefix. Defining features:
    scalar average subquery + anti-join. Adaptation: grouping prefix from
    the customer key's last digit (no phone column)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.round(F.avg("c_acctbal"), 2).alias("ab")
    )
    # dormant = no RECENT order (the fixture's customers all have some
    # order; TPC-H's "no orders at all" would be an empty — untested — set)
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("ab")
    )
    dormant = rich.join(orders, rich.c_custkey == orders.o_custkey, "left_anti")
    grp = (F.col("c_custkey") % 10).alias("cust_group")
    return (
        dormant.select(grp, "c_acctbal")
        .groupBy("cust_group")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def q2_min_cost_supplier(spark, sf_dir):
    """Q2 shape (minimum-cost supplier): for each part sold in a region,
    the supplier(s) achieving the minimum unit price — the correlated
    min-subquery-per-part feature, decorrelated to an aggregate + rejoin.
    Adaptation: offer price = the supplier's minimum lineitem
    extendedprice for the part (no partsupp.ps_supplycost); raw column
    values only — no derived arithmetic — so the equality join on the
    floor price is exact in both engines."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey",
                                              "l_extendedprice")
    sup = _dim(spark, sf_dir, "supplier")
    nat = _dim(spark, sf_dir, "nation")
    reg = _dim(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    offers = (
        li.select("l_partkey", "l_suppkey", F.col("l_extendedprice").alias("unit_price"))
        .join(sup.select("s_suppkey", "s_name", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(nat.select("n_nationkey", "n_name", "n_regionkey"),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg.select("r_regionkey"), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("l_partkey", "s_suppkey", "s_name", "n_name")
        .agg(F.min("unit_price").alias("best_offer"))
    )
    floor_ = offers.groupBy(F.col("l_partkey").alias("f_partkey")).agg(
        F.min("best_offer").alias("floor_price")
    )
    return (
        offers.join(
            floor_,
            (offers.l_partkey == floor_.f_partkey)
            & (offers.best_offer == floor_.floor_price),
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_suppkey", "s_name", "n_name",
            F.col("best_offer").alias("min_unit_price"),
        )
    )


def q20_part_share_suppliers(spark, sf_dir):
    """Q20 shape (suppliers holding significant part share): suppliers in
    one nation who supplied more than a 20% share of a part's total quantity for
    some part — the nested semi-join chain (supplier ← qualifying
    (part, supplier) ← per-part totals). Quantities are exact sums of
    fixture integers, so the > comparison is deterministic."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    per_p = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("l_quantity").alias("total_qty")
    )
    qualifying = (
        per_ps.join(per_p, per_ps.l_partkey == per_p.t_partkey)
        .filter(F.col("supp_qty") > 0.2 * F.col("total_qty"))
        .select("l_suppkey")
    )
    sup = _t(spark, sf_dir, "supplier")
    nat = _dim(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    return (
        sup.join(nat.select("n_nationkey"), sup.s_nationkey == F.col("n_nationkey"))
        .join(qualifying, sup.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q20_part_share_suppliers": q20_part_share_suppliers,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q12_delay_buckets": q12_delay_buckets,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q22_dormant_customers": q22_dormant_customers,
}

_REV = "l_extendedprice * (1 - l_discount)"

ORACLES = {
    "q2_min_cost_supplier": """
        WITH offers AS (
            SELECT l_partkey, s_suppkey, s_name, n_name,
                   MIN(l_extendedprice) AS best_offer
            FROM lineitem
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
            GROUP BY 1, 2, 3, 4
        )
        SELECT o.l_partkey AS p_partkey, o.s_suppkey, o.s_name, o.n_name,
               o.best_offer AS min_unit_price
        FROM offers o
        WHERE o.best_offer = (
            SELECT MIN(best_offer) FROM offers i WHERE i.l_partkey = o.l_partkey
        )
    """,
    "q20_part_share_suppliers": """
        WITH per_ps AS (
            SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
            FROM lineitem GROUP BY 1, 2
        ),
        per_p AS (
            SELECT l_partkey, SUM(l_quantity) AS total_qty
            FROM lineitem GROUP BY 1
        )
        SELECT s_suppkey, s_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_7'
        WHERE s_suppkey IN (
            SELECT ps.l_suppkey FROM per_ps ps
            JOIN per_p p ON ps.l_partkey = p.l_partkey
            WHERE ps.supp_qty > 0.2 * p.total_qty
        )
    """,
    "q8_market_share": f"""
        SELECT year(o_orderdate) AS o_year,
               ROUND(SUM(CASE WHEN n_name = 'NATION_7' THEN {_REV} ELSE 0 END)
                     / SUM({_REV}), 4) AS mkt_share,
               ROUND(SUM({_REV}), 2) AS total_rev
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        GROUP BY 1
    """,
    "q9_product_profit": f"""
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               ROUND(SUM({_REV}), 2) AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY 1, 2
    """,
    "q12_delay_buckets": """
        SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) < 30 THEN 'under_30d'
                    WHEN datediff('day', o_orderdate, l_shipdate) < 60 THEN '30_to_60d'
                    ELSE 'over_60d' END AS delay_bucket,
               SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS high_line_count,
               SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """,
    "q13_customer_distribution": """
        SELECT c_count, COUNT(*) AS custdist FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN (
                SELECT o_custkey, o_orderkey FROM orders
                WHERE o_orderpriority != '5-LOW'
            ) o ON c_custkey = o.o_custkey
            GROUP BY c_custkey
        ) GROUP BY c_count
    """,
    "q15_top_supplier": f"""
        WITH rev AS (
            SELECT l_suppkey, ROUND(SUM({_REV}), 2) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    "q16_supplier_part_counts": """
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand != 'Brand#1'
        GROUP BY 1, 2, 3
    """,
    "q17_small_qty_revenue": """
        WITH thresh AS (
            SELECT l_partkey AS t_partkey,
                   ROUND(0.2 * AVG(l_quantity), 4) AS qty_thresh
            FROM lineitem GROUP BY 1
        )
        SELECT COUNT(*) AS n_small_lines,
               ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem JOIN thresh ON l_partkey = t_partkey
        WHERE l_quantity < qty_thresh
    """,
    "q21_waiting_suppliers": """
        WITH j AS (
            SELECT l_orderkey, l_suppkey,
                   datediff('day', o_orderdate, l_shipdate) > 60 AS late
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        mine AS (SELECT DISTINCT l_orderkey, l_suppkey FROM j WHERE late)
        SELECT s_name, COUNT(*) AS numwait
        FROM mine m JOIN supplier ON m.l_suppkey = s_suppkey
        WHERE EXISTS (
            SELECT 1 FROM j o WHERE o.l_orderkey = m.l_orderkey
              AND o.l_suppkey != m.l_suppkey
        )
        AND NOT EXISTS (
            SELECT 1 FROM j o WHERE o.l_orderkey = m.l_orderkey
              AND o.l_suppkey != m.l_suppkey AND o.late
        )
        GROUP BY s_name
    """,
    "q22_dormant_customers": """
        SELECT c_custkey % 10 AS cust_group,
               COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT ROUND(AVG(c_acctbal), 2) FROM customer WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '1999-01-01'
        )
        GROUP BY 1
    """,
}
