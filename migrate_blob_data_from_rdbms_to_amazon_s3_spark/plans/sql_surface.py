"""SQL-API surface: the same engine through ``spark.sql`` over registered
temp views (the reference's "query language" is SQL strings over MySQL —
SURVEY §2 A; here the SQL path is first-class next to the DataFrame API).

Catalyst compiles these to the identical physical plans as the DataFrame
twins — subquery decorrelation turns the correlated scalar subquery into
an aggregate + join, and the IN-subquery into a left-semi join. Verified
with .explain: no per-row subquery execution survives optimization.
"""

from __future__ import annotations

from ..sources.tables import load_table

_VIEWS = ("customer", "nation", "orders", "lineitem")


def _register(spark, sf_dir):
    for name in _VIEWS:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def q_top_customer_per_nation(spark, sf_dir):
    """Correlated scalar subquery (TPC-H Q2 shape): customers holding their
    nation's maximum balance. Catalyst decorrelates to agg + join."""
    _register(spark, sf_dir)
    return spark.sql("""
        SELECT n.n_name AS nation, c.c_name AS customer,
               ROUND(c.c_acctbal, 2) AS acctbal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal = (
            SELECT MAX(c2.c_acctbal) FROM customer c2
            WHERE c2.c_nationkey = c.c_nationkey
        )
    """)


def q_orders_of_rich_customers(spark, sf_dir):
    """IN-subquery -> left-semi join: order counts for customers above a
    balance threshold."""
    _register(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 4000)
        GROUP BY o_orderstatus
    """)


def q_monthly_revenue(spark, sf_dir):
    """Calendar rollup: revenue by (year, month) — date function surface."""
    _register(spark, sf_dir)
    return spark.sql("""
        SELECT YEAR(o_orderdate) AS yr, MONTH(o_orderdate) AS mo,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY YEAR(o_orderdate), MONTH(o_orderdate)
    """)


def q_grouping_sets_orders(spark, sf_dir):
    """Explicit GROUPING SETS with GROUPING() disambiguation: status-only,
    priority-only, and grand-total aggregates in ONE pass (partial agg per
    set, single shuffle) — the OLAP grouping family's third member next to
    cube_orders / rollup_sales, where NULL group slots are told apart from
    genuine NULL data by the grouping flags."""
    _register(spark, sf_dir)
    return spark.sql("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               GROUPING(o_orderstatus) AS g_status,
               GROUPING(o_orderpriority) AS g_priority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority
    """)


def q_unpivot_metrics(spark, sf_dir):
    """UNPIVOT/melt: the lineitem numeric columns reshaped to a long
    (metric, value) table and re-aggregated — the inverse of
    pivot_events, used when a wide table feeds a metric-generic pipeline.
    The stack() generator is a narrow projection (no shuffle until the
    aggregate)."""
    _register(spark, sf_dir)
    return spark.sql("""
        SELECT metric,
               COUNT(*) AS n,
               ROUND(AVG(value), 4) AS avg_value,
               ROUND(MIN(value), 4) AS min_value,
               ROUND(MAX(value), 4) AS max_value
        FROM (
            SELECT stack(3, 'quantity', l_quantity,
                            'price', l_extendedprice,
                            'discount', l_discount) AS (metric, value)
            FROM lineitem
        )
        GROUP BY metric ORDER BY metric
    """)


def q_recursive_calendar(spark, sf_dir):
    """Recursive CTE (Spark 4's WITH RECURSIVE): generate the full
    month calendar between the corpus's first and last order dates, then
    left-join monthly revenue so SILENT GAP MONTHS surface as explicit
    zero rows — the completeness join a reporting pipeline needs and a
    plain GROUP BY can never produce (it only sees months that exist).
    Recursion depth = month span (bounded by the data's own range);
    DuckDB runs the identical recursion."""
    _register(spark, sf_dir)
    return spark.sql("""
        WITH RECURSIVE bounds AS (
            SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
                   CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
            FROM orders
        ),
        months(m) AS (
            SELECT lo FROM bounds
            UNION ALL
            SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months, bounds
            WHERE m < hi
        ),
        rev AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                   ROUND(SUM(o_totalprice), 2) AS revenue,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY 1
        )
        SELECT months.m AS month,
               COALESCE(rev.n_orders, 0) AS n_orders,
               COALESCE(rev.revenue, 0.0) AS revenue,
               CAST(rev.m IS NULL AS BOOLEAN) AS is_gap
        FROM months LEFT JOIN rev ON months.m = rev.m
        ORDER BY month
    """)


QUERIES = {
    "recursive_calendar": q_recursive_calendar,
    "grouping_sets_orders": q_grouping_sets_orders,
    "unpivot_metrics": q_unpivot_metrics,
    "sql_top_customer_per_nation": q_top_customer_per_nation,
    "sql_orders_of_rich_customers": q_orders_of_rich_customers,
    "sql_monthly_revenue": q_monthly_revenue,
}

ORACLES = {
    "recursive_calendar": """
        WITH RECURSIVE bounds AS (
            SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS lo,
                   CAST(date_trunc('month', MAX(o_orderdate)) AS DATE) AS hi
            FROM orders
        ),
        months(m) AS (
            SELECT lo FROM bounds
            UNION ALL
            SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months, bounds
            WHERE m < hi
        ),
        rev AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
                   ROUND(SUM(o_totalprice), 2) AS revenue,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY 1
        )
        SELECT months.m AS month,
               COALESCE(rev.n_orders, 0) AS n_orders,
               COALESCE(rev.revenue, 0.0) AS revenue,
               (rev.m IS NULL) AS is_gap
        FROM months LEFT JOIN rev ON months.m = rev.m
        ORDER BY month
    """,
    "grouping_sets_orders": """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority
    """,
    "unpivot_metrics": """
        WITH long AS (
            SELECT 'quantity' AS metric, l_quantity AS value FROM lineitem
            UNION ALL
            SELECT 'price', l_extendedprice FROM lineitem
            UNION ALL
            SELECT 'discount', l_discount FROM lineitem
        )
        SELECT metric, COUNT(*) AS n,
               ROUND(AVG(value), 4) AS avg_value,
               ROUND(MIN(value), 4) AS min_value,
               ROUND(MAX(value), 4) AS max_value
        FROM long GROUP BY metric ORDER BY metric
    """,
    "sql_top_customer_per_nation": """
        SELECT n.n_name AS nation, c.c_name AS customer,
               ROUND(c.c_acctbal, 2) AS acctbal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal = (
            SELECT MAX(c2.c_acctbal) FROM customer c2
            WHERE c2.c_nationkey = c.c_nationkey
        )
    """,
    "sql_orders_of_rich_customers": """
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS sum_price
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 4000)
        GROUP BY o_orderstatus
    """,
    "sql_monthly_revenue": """
        SELECT CAST(YEAR(o_orderdate) AS INT) AS yr,
               CAST(MONTH(o_orderdate) AS INT) AS mo,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY 1, 2
    """,
}
