"""Blob externalization pipeline — the reference's core capability as one
batch job (SURVEY §7 M1.5 / README.md:10-36).

Legacy shape  (order_id, description, order_blob LONGBLOB)      [in-row]
      │  externalize()
      ▼
objects       orders/<order_id>/<s3_prefix>                      [store]
pointer table (order_id, description, s3_prefix)                 [Parquet]

Stages:
1. **write objects** — ``foreachPartition``-style batched side-effect: one
   object-store client per partition (the reference's G1 batching lesson:
   credentials/clients per page, not per row). Implemented with
   ``mapInPandas`` so each task also *returns* its manifest (key, n_bytes,
   md5) — giving an auditable write receipt instead of a fire-and-forget.
2. **emit pointer table** — the target shape, written as Parquet.
3. **validate** — existence check per key (A14) + count/checksum
   reconciliation between source blobs and written objects.
4. **cascade delete** (A15) — objects first, rows second; a failed object
   delete aborts the row delete (README.md:125-126 ordering contract).

At 100 TB: the object writes are the bottleneck, and they scale with
partition count — ``repartition`` the legacy table by key range so tasks
are uniform, size partitions so each holds ~128-256 MB of blobs, and let
speculative execution retry stragglers. The pointer-table emit is a narrow
projection of the same scan (no second read of the blobs).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.scalars import DEFAULT_S3_PREFIX, s3_object_key
from ..sources.object_store import make_store

# Ingestion contract: the reference's presigned POST enforces
# content-length-range 0..10485760 (order.js:388) — oversize payloads are
# rejected by the store, so the engine rejects them at externalization time
# (flagged in the manifest, never written).
MAX_OBJECT_BYTES = 10 * 1024 * 1024

WRITE_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType()),
        T.StructField("object_key", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("status", T.StringType()),  # written | rejected_oversize
    ]
)


def externalize_blobs(
    legacy: DataFrame,
    store_url: str,
    pk: str = "order_id",
    blob_col: str = "order_blob",
    s3_prefix: str = DEFAULT_S3_PREFIX,
) -> DataFrame:
    """Stage 1: write every blob to ``orders/<id>/<prefix>`` (key scheme
    order.js:174,273) and return the write manifest. The store client is
    constructed once per Arrow batch stream (= per task), not per row."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        store = make_store(store_url)  # one client per task (G1 batching)
        for pdf in batches:
            out = []
            for oid, blob in zip(pdf[pk], pdf[blob_col]):
                payload = bytes(blob)
                if len(payload) > MAX_OBJECT_BYTES:
                    # order.js:388 content-length-range rejection: flag, skip
                    out.append((oid, None, len(payload), None, "rejected_oversize"))
                    continue
                key = f"orders/{oid}/{s3_prefix}"
                store.put(key, payload)
                out.append(
                    (oid, key, len(payload), hashlib.md5(payload).hexdigest(), "written")
                )
            yield pd.DataFrame(
                out,
                columns=["order_id", "object_key", "n_bytes", "content_md5", "status"],
            )

    return legacy.select(pk, blob_col).mapInPandas(kernel, WRITE_MANIFEST_SCHEMA)


def pointer_table(legacy: DataFrame, pk: str = "order_id",
                  s3_prefix: str = DEFAULT_S3_PREFIX) -> DataFrame:
    """Stage 2: the post-migration target shape (order.sql:2-7) — narrow
    projection, blob column pruned from the scan."""
    return legacy.select(
        F.col(pk).alias("order_id"),
        "description",
        F.lit(s3_prefix).alias("s3_prefix"),
    )


def validate_migration(
    legacy: DataFrame, manifest: DataFrame, store_url: str, pk: str = "order_id",
    blob_col: str = "order_blob",
) -> dict:
    """Stage 3: reconciliation. Re-derive (n_bytes, md5) from the source
    blobs, full-outer join to the manifest, and existence-check every key
    (A14). Both join directions are audited: a source row with no written
    object is a ``missing_write`` (unless deliberately ``rejected``), and a
    manifest row with no source row is an ``orphan_manifest`` (phantom
    write). Mismatch flags are null-safe (``<=>``) so a NULL on either side
    reads as a mismatch, never as a silent pass. All counters except
    ``n_rows`` must be zero for a clean migration."""
    source_sums = legacy.select(
        F.col(pk).alias("order_id"),
        F.length(blob_col).cast("long").alias("src_bytes"),
        F.md5(blob_col).alias("src_md5"),
    )
    rejected = F.col("status") == "rejected_oversize"
    src_present = F.col("src_bytes").isNotNull()
    written = F.col("object_key").isNotNull()
    joined = source_sums.join(manifest, "order_id", "full_outer").select(
        "order_id",
        (written & src_present & ~F.col("src_bytes").eqNullSafe(F.col("n_bytes")))
        .alias("size_mismatch"),
        (written & src_present & ~F.col("src_md5").eqNullSafe(F.col("content_md5")))
        .alias("md5_mismatch"),
        (src_present & ~written & ~F.coalesce(rejected, F.lit(False)))
        .alias("missing_write"),
        (~src_present).alias("orphan_manifest"),
        F.coalesce(src_present & rejected, F.lit(False)).alias("rejected"),
        "object_key",
    )
    exists_schema = T.StructType(
        [T.StructField("order_id", T.StringType()), T.StructField("exists", T.BooleanType())]
    )

    def head_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        store = make_store(store_url)
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "order_id": pdf["order_id"],
                    "exists": [store.head(k) if k else False for k in pdf["object_key"]],
                }
            )

    existence = joined.select("order_id", "object_key").mapInPandas(
        head_kernel, exists_schema
    )
    report = joined.join(existence, "order_id").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("size_mismatch").cast("int")).alias("size_mismatches"),
        F.sum(F.col("md5_mismatch").cast("int")).alias("md5_mismatches"),
        F.sum(F.col("missing_write").cast("int")).alias("missing_writes"),
        F.sum(F.col("orphan_manifest").cast("int")).alias("orphan_manifests"),
        F.sum(F.col("rejected").cast("int")).alias("rejected_oversize"),
        F.sum((F.col("object_key").isNotNull() & ~F.col("exists")).cast("int"))
        .alias("missing_objects"),
    )
    return report.collect()[0].asDict()


def cascade_delete(
    pointers: DataFrame, keys: DataFrame, store_url: str, pk: str = "order_id"
) -> DataFrame:
    """Stage 4 / A15: delete objects FIRST, then drop rows whose object
    delete succeeded (order.js:346-351; ordering contract README.md:126).
    Returns the surviving pointer table."""
    doomed = pointers.join(keys.select(pk), pk, "left_semi").withColumn(
        "object_key", s3_object_key(pk, "s3_prefix")
    )
    schema = T.StructType(
        [T.StructField(pk, T.StringType()), T.StructField("deleted", T.BooleanType())]
    )

    def delete_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        store = make_store(store_url)
        for pdf in batches:
            yield pd.DataFrame(
                {
                    pk: pdf[pk],
                    "deleted": [store.delete(k) for k in pdf["object_key"]],
                }
            )

    results = doomed.select(pk, "object_key").mapInPandas(delete_kernel, schema)
    removable = results.filter(F.col("deleted")).select(pk)
    return pointers.join(removable, pk, "left_anti")
