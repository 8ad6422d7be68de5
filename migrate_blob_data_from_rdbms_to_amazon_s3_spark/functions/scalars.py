"""Scalar function layer — SURVEY.md §2 table F, as Catalyst expressions.

Every reference helper compiles to JVM-side built-ins (no Python UDFs in the
hot path). Reference citations are to /root/reference.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference constants (order.js:44, order.js:190-194, order.js:27).
MAX_BATCH_RECORDS = 5
MAX_DESCRIPTION_LEN = 30
TRIM_MARKER = "(TRIM)"
DEFAULT_DESCRIPTION = "Default Description"
DEFAULT_S3_PREFIX = "image.png"
ORDER_S3_PREFIX = "orders"


def trim_description(col: Column | str, max_len: int = MAX_DESCRIPTION_LEN) -> Column:
    """F1 ``trimDescription`` (order.js:409-414; dup order_rdbms_blob.js:362-367).

    If len(description) > max_len: keep the first ``max_len - len("(TRIM)")``
    chars and append the marker, so output length is always <= max_len and
    trimming is visible (tested at test/order.test.js:357-388).
    """
    c = F.col(col) if isinstance(col, str) else col
    keep = max_len - len(TRIM_MARKER)
    return F.when(
        F.length(c) > max_len, F.concat(F.substring(c, 1, keep), F.lit(TRIM_MARKER))
    ).otherwise(c)


def s3_object_key(order_id: Column | str, s3_prefix: Column | str) -> Column:
    """F5 S3 key construction ``"orders/" + orderId + "/" + s3Prefix``
    (order.js:174,273,324; no leading slash — pitfall at order.js:500-506)."""
    oid = F.col(order_id) if isinstance(order_id, str) else order_id
    pfx = F.col(s3_prefix) if isinstance(s3_prefix, str) else s3_prefix
    return F.concat_ws("/", F.lit(ORDER_S3_PREFIX), oid, pfx)


def pages_for(limit: Column, count: Column) -> Column:
    """C2 derived aggregate ``pages`` (order.js:296).

    The reference computes ``limit > count ? 0 : floor(limit / count)`` —
    an odd semantic (limit/count, not count/limit), but it is the published
    compatibility contract, so we reproduce it verbatim. ``try_divide``
    keeps the empty-table (count=0) case null-safe under ANSI mode.
    """
    return (
        F.when(limit > count, F.lit(0))
        .otherwise(F.coalesce(F.floor(F.try_divide(limit, count)), F.lit(0)))
        .cast("int")
    )


def safe_int(col: Column | str, default: int) -> Column:
    """F7 integer parse with NaN guard (order.js:70-84): non-numeric input
    falls back to the default, exactly like ``isNaN(parseInt(x))``.
    ``try_cast`` (not ``cast``) so ANSI mode yields null, not an error."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast("int"), F.lit(default))


def clamp_limit(limit: Column | str, default: int = MAX_BATCH_RECORDS) -> Column:
    """E2 limit clamp (order.js:70-77): accept only ``0 < x < max_batch``,
    otherwise use the default page size."""
    parsed = safe_int(limit, default)
    return F.when((parsed > 0) & (parsed < default), parsed).otherwise(F.lit(default))


def clamp_offset(offset: Column | str, count: Column) -> Column:
    """E2 offset clamp (order.js:79-84, 263-266): negatives/non-numeric → 0,
    then ``offset = min(offset, count)`` so huge offsets return the empty
    last page instead of scanning past the end."""
    parsed = safe_int(offset, 0)
    nonneg = F.when(parsed > 0, parsed).otherwise(F.lit(0))
    return F.least(nonneg, count.cast("int"))


def blob_to_base64(col: Column | str) -> Column:
    """F2 blob → base64 text (order_rdbms_blob.js:170-180).

    Spark's ``base64`` may emit MIME-chunked output (CRLF every 76 chars)
    depending on ``spark.sql.legacy.chunkBase64String.enabled``; the
    reference's ``Buffer.toString('base64')`` never chunks, so normalize
    here rather than depending on session config we don't own.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.base64(c), "[\\r\\n]", "")


def base64_to_blob(col: Column | str) -> Column:
    """F3 base64 text → blob (order_rdbms_blob.js:186-191)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unbase64(c)


def new_order_id() -> Column:
    """F4 UUID v4 PK generation (order.js:25,191). Non-deterministic by
    nature → rows-only correctness check, never oracle-hashed."""
    return F.expr("uuid()")


def strip_s3_arn(col: Column | str) -> Column:
    """F6 ARN → bucket-name strip (order.js:422,512)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, r"^arn:aws:s3:::", "")
