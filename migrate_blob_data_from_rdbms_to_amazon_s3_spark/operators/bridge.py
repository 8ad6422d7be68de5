"""Bridge reads across old/new stores — SURVEY.md §2 D1/D2.

D1: the reference's migration-period client probes the new (S3) API first
and falls back to the legacy (RDBMS) API (sites/js/app_bridge.js:1-17;
README.md:131-141). As a set operation over whole tables that is a
precedence-coalesce: take every row from ``new``, plus legacy rows whose key
is absent from ``new``.

D2: record↔object linkage — the logical FK from a row to its S3 object key
``orders/<id>/<prefix>`` (order.js:174,273,324) — is an equi-join between
the row table and an object-listing table on the computed key column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import s3_object_key


def bridge_coalesce(new: DataFrame, legacy: DataFrame, pk: str) -> DataFrame:
    """D1 dual-source fallback. Implemented as new ∪ (legacy ⟕̸ new):
    a left-anti union preserves new-side precedence without building the
    full-outer row (cheaper: anti join + union vs full outer + coalesce,
    and both sides stay hash-partitioned on the PK)."""
    common = [c for c in new.columns if c in set(legacy.columns)]
    missing = legacy.select(*common).join(new.select(pk), pk, "left_anti")
    return new.select(*common).unionByName(missing)


def object_linkage(rows: DataFrame, objects: DataFrame, pk: str = "order_id",
                   prefix_col: str = "s3_prefix", key_col: str = "object_key",
                   how: str = "inner") -> DataFrame:
    """D2: join row table to an object listing (e.g. from the binaryFile
    source) on the derived key. ``objects`` must expose ``key_col``."""
    keyed = rows.withColumn(key_col, s3_object_key(pk, prefix_col))
    return keyed.join(objects, key_col, how)
