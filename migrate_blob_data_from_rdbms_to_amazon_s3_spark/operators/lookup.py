"""Point lookups by primary key — SURVEY.md §2 A4/A5.

Reference: ``SELECT * FROM <t> WHERE order_id = ?`` (order.js:648-667) and
the blob-only projection variant (order_rdbms_blob.js:528-548). In Spark an
equality predicate on a sorted/partitioned key is pushed into the Parquet
scan (row-group min/max skipping); at 100 TB the table should additionally
be written partitioned or z-ordered on the PK so pruning skips whole files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_lookup(df: DataFrame, pk: str, key, columns: list[str] | None = None) -> DataFrame:
    """A4: first row matching the PK, or empty DF (the reference's 404
    taxonomy maps absence to an empty result, test/order.test.js:308-314)."""
    out = df.filter(F.col(pk) == F.lit(key))
    if columns:
        out = out.select(*columns)
    return out.limit(1)


def blob_lookup(df: DataFrame, pk: str, key, blob_col: str = "order_blob") -> DataFrame:
    """A5: fetch only the blob column for one key — the projection keeps the
    wide binary column out of every other read path (README.md:16)."""
    return point_lookup(df, pk, key, columns=[pk, blob_col])
