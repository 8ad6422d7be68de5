"""Grouped-map (``applyInPandas``) surface: per-group Python kernels over
Arrow batches — the API for group-local algorithms that don't decompose
into SQL aggregates (model scoring per key, per-entity normalization).

The demo kernel is per-customer z-score normalization of order values.
It IS SQL-expressible (window mean/std), which is the point: the DuckDB
oracle value-checks the Python kernel end-to-end, so the grouped-map
plumbing (key slicing, Arrow conversion, schema enforcement) is verified
— then the same harness carries kernels SQL can't express.

Scale: one hash exchange on the group key; each group must fit one
worker's memory (customers' order lists are tiny; for giant groups,
pre-aggregate or switch to window functions).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T

Z_SCHEMA = T.StructType(
    [
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("price_z", T.DoubleType()),
    ]
)


def _zscore_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    prices = pdf["o_totalprice"]
    mu = prices.mean()
    sd = prices.std(ddof=1)  # sample stddev == stddev_samp == DuckDB stddev
    z = (prices - mu) / sd if sd and sd == sd else prices * 0.0
    return pd.DataFrame(
        {
            "o_custkey": pdf["o_custkey"],
            "o_orderkey": pdf["o_orderkey"],
            "price_z": z.round(4),
        }
    )


def q_grouped_zscore(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return orders.groupBy("o_custkey").applyInPandas(_zscore_kernel, Z_SCHEMA)


def q_udtf_tokenize(spark, sf_dir):
    """Python UDTF end-to-end with a VALUE oracle: the lateral tokenize
    table function (functions/udtfs.py) over documents, checked against
    the SQL split twin. Same verification idea as the z-score kernel —
    the UDTF plumbing (lateral join, Arrow row fan-out, schema DDL) is
    value-proven on a kernel SQL can express, then carries kernels SQL
    can't (real BPE, byte offsets)."""
    from pyspark.sql import functions as F

    from ..functions.udtfs import tokenize_udtf

    spark.udtf.register("tokenize", tokenize_udtf())
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.length(F.trim("text")) > 0)
        .select("doc_id", "text")
        .createOrReplaceTempView("__docs_udtf")
    )
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token FROM __docs_udtf d, LATERAL tokenize(d.text) t"
    )


QUERIES = {
    "grouped_zscore": q_grouped_zscore,
    "udtf_tokenize": q_udtf_tokenize,
}

ORACLES = {
    "udtf_tokenize": r"""
        SELECT doc_id, CAST(u.pos - 1 AS INT) AS pos, u.tok AS token
        FROM (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '[ \t\n\r\f]+'),
                               t -> t != '') AS toks
            FROM documents WHERE length(trim(text)) > 0
        ),
        LATERAL (SELECT UNNEST(toks) AS tok,
                        generate_subscripts(toks, 1) AS pos) u
    """,
    # NULLIF guards single-order customers (stddev_samp undefined -> z = 0
    # in the kernel via the sd==sd NaN check; oracle mirrors with COALESCE)
    "grouped_zscore": """
        SELECT o_custkey, o_orderkey,
               COALESCE(
                   ROUND((o_totalprice - AVG(o_totalprice) OVER w)
                         / NULLIF(STDDEV_SAMP(o_totalprice) OVER w, 0), 4),
                   0.0
               ) AS price_z
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey)
    """,
}
