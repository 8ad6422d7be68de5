"""Ordered paginated scans — SURVEY.md §2 A1-A3, E1-E2 and lifecycle §3.1.

The reference's flagship read is ``GET /orders``: count, clamp, then
``SELECT * FROM orders ORDER BY order_id LIMIT ? OFFSET ?``
(order.js:594-640). Two implementations:

- ``page()``        — exact offset/limit parity. A global total order is
  required for stable pages (order.js:621 sorts on the PK); Spark >= 3.4
  has ``DataFrame.offset``, and Catalyst turns sort+limit into a TakeOrdered
  top-k (no full sort materialization) when offset+limit is small.
- ``keyset_page()`` — the 100 TB path. OFFSET N forces computing the first
  N rows everywhere; keyset pagination (``WHERE pk > last_seen ORDER BY pk
  LIMIT n``) is a pushed-down range predicate + top-k, constant cost per
  page regardless of depth. This is what a production migration pipeline
  should drive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import MAX_BATCH_RECORDS


def count_rows(df: DataFrame, pk: str) -> DataFrame:
    """A1 full-table COUNT on the PK (order.js:594-612). Parquet answers
    this from footer row-group metadata — no data pages are read."""
    return df.agg(F.count(pk).alias("orders_count"))


def clamp_page_params(limit: int | str | None, offset: int | str | None, total: int,
                      max_batch: int = MAX_BATCH_RECORDS) -> tuple[int, int]:
    """E2 parameter clamping, driver-side (order.js:62-85, 263-266).

    Mirrors the reference exactly: non-numeric → default, limit accepted only
    in (0, max_batch), offset floored at 0 and capped at the row count.
    """
    try:
        lim = int(limit)  # type: ignore[arg-type]
    except (TypeError, ValueError):
        lim = max_batch
    if not (0 < lim < max_batch):
        lim = max_batch
    try:
        off = int(offset)  # type: ignore[arg-type]
    except (TypeError, ValueError):
        off = 0
    off = max(off, 0)
    off = min(off, total)
    return lim, off


def page(df: DataFrame, pk: str, limit: int, offset: int = 0,
         columns: list[str] | None = None) -> DataFrame:
    """A2/A3 ordered page scan, with optional projection (the reference's
    manual blob-exclusion at order_rdbms_blob.js:474 — Catalyst prunes the
    scan automatically once we ``select``)."""
    out = df.select(*columns) if columns else df
    return out.orderBy(pk).offset(offset).limit(limit)


def keyset_page(df: DataFrame, pk: str, limit: int,
                after: Column | str | int | None = None,
                columns: list[str] | None = None) -> DataFrame:
    """Scale-path pagination: range predicate on the PK (pushed to the
    Parquet/JDBC scan) + top-k. O(page) per page instead of O(offset)."""
    out = df.select(*columns) if columns else df
    if after is not None:
        out = out.filter(F.col(pk) > F.lit(after))
    return out.orderBy(pk).limit(limit)


def page_envelope(df: DataFrame, pk: str, limit: int | str | None,
                  offset: int | str | None) -> dict:
    """Lifecycle §3.1 end-to-end: count → clamp → page → envelope
    ``{orders, limit, offset, ordersCount, pages}`` (order.js:286-299).

    Returns the envelope with ``orders`` left as a DataFrame (callers decide
    whether to collect; the driver contract collects for us).
    """
    total = df.count()
    lim, off = clamp_page_params(limit, offset, total)
    pages = 0 if lim > total else lim // total if total else 0
    return {
        "orders": page(df, pk, lim, off),
        "limit": lim,
        "offset": off,
        "ordersCount": total,
        "pages": pages,
    }
