"""Reference-parity queries — one per operator row in SURVEY.md §2 A-F.

Every entry has a DuckDB oracle twin with identical column aliases (the
driver hash-compares values after sorting columns by name). Reference
citations in each docstring point into /root/reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import scalars as S
from ..functions.local_frame import arrow_local_df
from ..operators import bridge, lookup, mutation, pagination
from ..sources.tables import load_events
from .ref_shapes import (
    REF_BLOB_ORDERS_SQL,
    REF_ORDERS_SQL,
    ref_blob_orders,
    ref_orders,
)

REF = ["order_id", "description", "s3_prefix"]


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


# --- A1: full-table count -------------------------------------------------
def q_count_orders(spark, sf_dir):
    """A1 `SELECT COUNT(order_id) FROM orders` (order.js:594-612)."""
    return pagination.count_rows(_orders(spark, sf_dir), "o_orderkey")


# --- A2/E1/E2: ordered paginated scan, all columns ------------------------
def q_page_scan(spark, sf_dir):
    """A2 `SELECT * ... ORDER BY order_id LIMIT 5 OFFSET 10` (order.js:619-640).
    Runs on the varchar PK so ordering semantics match the reference's
    lexicographic UUID sort."""
    df = ref_orders(spark, sf_dir).select(*REF)
    return pagination.page(df, "order_id", limit=5, offset=10)


# --- A2 scale variant: keyset pagination ----------------------------------
def q_keyset_page(spark, sf_dir):
    """Keyset (seek-method) pagination: `WHERE order_id > ? ORDER BY
    order_id LIMIT 5`. The reference pages by OFFSET (order.js:621), which
    is O(offset) per page; the range predicate pushes to the scan and makes
    every page O(page) — the variant that survives deep pagination at
    100 TB."""
    df = ref_orders(spark, sf_dir).select(*REF)
    return pagination.keyset_page(df, "order_id", limit=5, after="110")


# --- A3: paginated scan with blob-excluding projection --------------------
def q_page_scan_projection(spark, sf_dir):
    """A3 projection that keeps the LONGBLOB out of list queries
    (order_rdbms_blob.js:472-493; rationale README.md:16). Catalyst pushes
    the 2-column projection into the Parquet scan."""
    df = ref_blob_orders(spark, sf_dir)
    return pagination.page(df, "order_id", limit=5, offset=0,
                           columns=["order_id", "description"])


# --- A4: point lookup by PK ------------------------------------------------
def q_point_lookup(spark, sf_dir):
    """A4 `SELECT * WHERE order_id = ?` (order.js:648-667)."""
    df = ref_orders(spark, sf_dir).select(*REF)
    return lookup.point_lookup(df, "order_id", "42")


# --- A5 + F2: blob point lookup, base64-encoded ---------------------------
def q_blob_lookup_b64(spark, sf_dir):
    """A5 `SELECT order_blob WHERE order_id = ?` (order_rdbms_blob.js:528-548)
    + F2 base64 encode at the API boundary (order_rdbms_blob.js:170-180)."""
    df = ref_blob_orders(spark, sf_dir)
    hit = lookup.blob_lookup(df, "order_id", "42")
    return hit.select("order_id", S.blob_to_base64("order_blob").alias("blob_b64"))


# --- F3+F2: base64 round-trip fidelity -------------------------------------
def q_base64_roundtrip(spark, sf_dir):
    """F2/F3 blob↔base64 codec: decode(encode(x)) must be byte-identical
    (the reference's round-trip test, order_rdbms_blob.test.js:376-415).
    Emits a per-row boolean plus the re-encoded payload."""
    df = ref_blob_orders(spark, sf_dir)
    b64 = S.blob_to_base64("order_blob")
    roundtrip = S.blob_to_base64(S.base64_to_blob(b64))
    return df.select(
        "order_id",
        roundtrip.alias("blob_b64"),
        (b64 == roundtrip).alias("roundtrip_ok"),
    )


# --- A6: PK-safe insert (anti-join + append) -------------------------------
def q_insert_append(spark, sf_dir):
    """A6 INSERT with PK safety (order.js:690-701; PRIMARY KEY at
    order.sql:6). New batch contains both genuinely-new keys and keys that
    already exist; the existing ones must be dropped by the anti-join."""
    existing = ref_orders(spark, sf_dir)
    new_rows = existing.filter(F.col("_num_key") % 100 == 0).select(
        F.when(F.col("_num_key") % 200 == 0, F.concat(F.lit("new-"), F.col("order_id")))
        .otherwise(F.col("order_id"))
        .alias("order_id"),
        F.lit(S.DEFAULT_DESCRIPTION).alias("description"),
        F.lit(S.DEFAULT_S3_PREFIX).alias("s3_prefix"),
    )
    return mutation.insert_rows(existing.select(*REF), new_rows, "order_id")


# --- A7: keyed update (join + coalesce) ------------------------------------
def q_keyed_update(spark, sf_dir):
    """A7 `UPDATE orders SET description=?, s3_prefix=? WHERE order_id=?`
    (order.js:707-718) as a left-join + coalesce rewrite over immutable
    Parquet (SURVEY §7 M3)."""
    existing = ref_orders(spark, sf_dir)
    updates = existing.filter(F.col("_num_key") % 100 == 0).select(
        "order_id",
        F.lit("UPDATED DESCRIPTION").alias("description"),
        F.lit("updated.png").alias("s3_prefix"),
    )
    return mutation.update_rows(existing.select(*REF), updates, "order_id")


# --- A9: keyed delete (left-anti) -------------------------------------------
def q_keyed_delete(spark, sf_dir):
    """A9 `DELETE FROM orders WHERE order_id = ?` (order.js:673-684);
    deleting absent keys is a no-op (idempotency, order.test.js:433-445) —
    the key set deliberately includes ids that do not exist."""
    existing = ref_orders(spark, sf_dir)
    keys = existing.filter(F.col("_num_key") % 10 == 0).select("order_id").unionByName(
        arrow_local_df(spark, [("does-not-exist",)], "order_id string")
    )
    return mutation.delete_rows(existing.select(*REF), keys, "order_id")


# --- A7+A6: upsert (merge) ---------------------------------------------------
def q_upsert(spark, sf_dir):
    """MERGE-style upsert: reference write path = UPDATE row if present else
    INSERT (the read-back-after-write contract, order.js:205-208)."""
    existing = ref_orders(spark, sf_dir)
    batch = existing.filter(F.col("_num_key") % 250 == 0).select(
        F.when(F.col("_num_key") % 500 == 0, F.concat(F.lit("up-"), F.col("order_id")))
        .otherwise(F.col("order_id"))
        .alias("order_id"),
        F.lit("UPSERTED").alias("description"),
        F.lit("upsert.png").alias("s3_prefix"),
    )
    return mutation.upsert_rows(existing.select(*REF), batch, "order_id")


# --- B3: envelope rename (snake_case → camelCase) ---------------------------
def q_rename_envelope(spark, sf_dir):
    """B3 rowMapper projection (order.js:731-738)."""
    return ref_orders(spark, sf_dir).select(
        F.col("order_id").alias("orderId"),
        F.col("description").alias("description"),
        F.col("s3_prefix").alias("s3Prefix"),
    )


# --- F1: trim semantics -------------------------------------------------------
def q_trim_description(spark, sf_dir):
    """F1 trimDescription (order.js:409-414): >30 chars → first 24 + "(TRIM)".
    Run over documents.text, which straddles the boundary."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id",
        S.trim_description(F.col("text")).alias("description"),
        F.length(S.trim_description(F.col("text"))).alias("description_len"),
    )


# --- F5: S3 object key construction -------------------------------------------
def q_s3_key(spark, sf_dir):
    """F5 `"orders/" + orderId + "/" + s3Prefix` (order.js:174,273,324)."""
    df = ref_orders(spark, sf_dir)
    return df.select(
        "order_id", S.s3_object_key("order_id", "s3_prefix").alias("object_key")
    )


# --- F6: ARN → bucket strip -----------------------------------------------------
def q_strip_arn(spark, sf_dir):
    """F6 BUCKET.replace('arn:aws:s3:::', '') (order.js:422,512)."""
    df = ref_orders(spark, sf_dir)
    arn = F.concat(F.lit("arn:aws:s3:::bucket-"), F.col("order_id"))
    return df.select("order_id", S.strip_s3_arn(arn).alias("bucket_name"))


# --- F7: int parse with defaults ------------------------------------------------
def q_cast_with_default(spark, sf_dir):
    """F7 parseInt + isNaN guard (order.js:70-84): numeric prefix of
    o_orderpriority parses; a non-numeric probe column falls back."""
    df = _orders(spark, sf_dir)
    return df.select(
        "o_orderkey",
        S.safe_int(F.split("o_orderpriority", "-").getItem(0), -1).alias("priority_num"),
        S.safe_int(F.lit("1dscx"), 0).alias("bad_offset"),  # the suite's probe value
    )


# --- E2+C2: pagination envelope ---------------------------------------------------
def q_pages_envelope(spark, sf_dir):
    """E2 clamps + C2 quirky `pages = limit > count ? 0 : floor(limit/count)`
    (order.js:263-266,296). Single-row envelope for limit='3', offset='1dscx'."""
    df = _orders(spark, sf_dir)
    counted = df.agg(F.count("o_orderkey").alias("orders_count"))
    lim = S.clamp_limit(F.lit("3"))
    off = S.clamp_offset(F.lit("1dscx"), F.col("orders_count"))
    return counted.select(
        F.col("orders_count"),
        lim.alias("page_limit"),
        off.alias("page_offset"),
        S.pages_for(lim, F.col("orders_count")).alias("pages"),
    )


# --- C3: page key collection --------------------------------------------------------
def q_collect_page_keys(spark, sf_dir):
    """C3 fold the page's S3 keys into the batched-STS key list
    (order.js:269-273) — exploded to rows for oracle comparison; the
    array form is `F.collect_list` over the same expression."""
    df = ref_orders(spark, sf_dir).select(*REF)
    first_page = pagination.page(df, "order_id", limit=5, offset=0)
    return first_page.select(
        S.s3_object_key("order_id", "s3_prefix").alias("s3_key")
    )


# --- D1: bridge coalesce ---------------------------------------------------------------
def q_bridge_coalesce(spark, sf_dir):
    """D1 dual-source fallback read (app_bridge.js:1-17): rows present in the
    new store win; legacy-only rows fall through. Splits the fixture into
    overlapping 'new' and 'legacy' views to exercise all three cases."""
    base = ref_orders(spark, sf_dir)
    new = base.filter(F.col("_num_key") % 3 != 0).select(*REF)
    legacy = (
        base.filter(F.col("_num_key") % 3 != 1)
        .select(
            "order_id",
            F.concat(F.lit("legacy:"), F.col("description")).alias("description"),
            F.col("s3_prefix"),
        )
    )
    return bridge.bridge_coalesce(new, legacy, "order_id")


# --- D2: record ↔ object linkage join -----------------------------------------------------
def q_object_linkage(spark, sf_dir):
    """D2 logical FK row → S3 object key (order.js:174,273; consumed
    app.js:542-545): equi-join table rows to a derived object listing."""
    rows = ref_orders(spark, sf_dir).select(*REF)
    objects = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.concat_ws(
            "/", F.lit("orders"), F.col("doc_id").cast("string"), F.lit("image.png")
        ).alias("object_key"),
        F.col("n_chars").alias("size_bytes"),
    )
    return bridge.object_linkage(rows, objects, "order_id", "s3_prefix")


# --- F9: JSON extraction (read path) ---------------------------------------------------------
def q_json_extract(spark, sf_dir):
    """F9 JSON.parse on request bodies (order.js:92,133,199): typed
    extraction from the events props JSON column."""
    ev = load_events(spark, sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("int").alias("k"),
    )


# --- F9: JSON envelope (write path) ------------------------------------------------------------
def q_json_envelope(spark, sf_dir):
    """F9 JSON.stringify response envelope (order.js:213,286-299): compact
    struct → JSON string, string/int fields only (cross-engine stable)."""
    df = ref_orders(spark, sf_dir).select(*REF)
    return df.select(
        "order_id",
        F.to_json(F.struct("order_id", "description", "s3_prefix")).alias("envelope"),
    )


QUERIES = {
    "count_orders": q_count_orders,
    "page_scan": q_page_scan,
    "keyset_page": q_keyset_page,
    "page_scan_projection": q_page_scan_projection,
    "point_lookup": q_point_lookup,
    "blob_lookup_b64": q_blob_lookup_b64,
    "base64_roundtrip": q_base64_roundtrip,
    "insert_append": q_insert_append,
    "keyed_update": q_keyed_update,
    "keyed_delete": q_keyed_delete,
    "upsert": q_upsert,
    "rename_envelope": q_rename_envelope,
    "trim_description": q_trim_description,
    "s3_key": q_s3_key,
    "strip_arn": q_strip_arn,
    "cast_with_default": q_cast_with_default,
    "pages_envelope": q_pages_envelope,
    "collect_page_keys": q_collect_page_keys,
    "bridge_coalesce": q_bridge_coalesce,
    "object_linkage": q_object_linkage,
    "json_extract": q_json_extract,
    "json_envelope": q_json_envelope,
}

_REF = f"ref_orders AS ({REF_ORDERS_SQL})"
_BLOB = f"ref_blob AS ({REF_BLOB_ORDERS_SQL})"

ORACLES = {
    "count_orders": "SELECT CAST(COUNT(o_orderkey) AS BIGINT) AS orders_count FROM orders",
    "page_scan": f"""
        WITH {_REF}
        SELECT order_id, description, s3_prefix FROM ref_orders
        ORDER BY order_id LIMIT 5 OFFSET 10
    """,
    "keyset_page": f"""
        WITH {_REF}
        SELECT order_id, description, s3_prefix FROM ref_orders
        WHERE order_id > '110'
        ORDER BY order_id LIMIT 5
    """,
    "page_scan_projection": f"""
        WITH {_BLOB}
        SELECT order_id, description FROM ref_blob
        ORDER BY order_id LIMIT 5 OFFSET 0
    """,
    "point_lookup": f"""
        WITH {_REF}
        SELECT order_id, description, s3_prefix FROM ref_orders
        WHERE order_id = '42' LIMIT 1
    """,
    "blob_lookup_b64": f"""
        WITH {_BLOB}
        SELECT order_id, to_base64(order_blob) AS blob_b64 FROM ref_blob
        WHERE order_id = '42' LIMIT 1
    """,
    "base64_roundtrip": f"""
        WITH {_BLOB}
        SELECT order_id,
               to_base64(from_base64(to_base64(order_blob))) AS blob_b64,
               to_base64(order_blob) = to_base64(from_base64(to_base64(order_blob))) AS roundtrip_ok
        FROM ref_blob
    """,
    "insert_append": f"""
        WITH {_REF},
        new_rows AS (
            SELECT CASE WHEN _num_key % 200 = 0 THEN 'new-' || order_id ELSE order_id END AS order_id,
                   'Default Description' AS description,
                   'image.png' AS s3_prefix
            FROM ref_orders WHERE _num_key % 100 = 0
        )
        SELECT order_id, description, s3_prefix FROM ref_orders
        UNION ALL
        SELECT * FROM new_rows
        WHERE order_id NOT IN (SELECT order_id FROM ref_orders)
    """,
    "keyed_update": f"""
        WITH {_REF},
        updates AS (
            SELECT order_id, 'UPDATED DESCRIPTION' AS u_desc, 'updated.png' AS u_pfx
            FROM ref_orders WHERE _num_key % 100 = 0
        )
        SELECT r.order_id,
               COALESCE(u.u_desc, r.description) AS description,
               COALESCE(u.u_pfx, r.s3_prefix) AS s3_prefix
        FROM ref_orders r LEFT JOIN updates u USING (order_id)
    """,
    "keyed_delete": f"""
        WITH {_REF},
        del AS (
            SELECT order_id FROM ref_orders WHERE _num_key % 10 = 0
            UNION ALL SELECT 'does-not-exist'
        )
        SELECT order_id, description, s3_prefix FROM ref_orders
        WHERE order_id NOT IN (SELECT order_id FROM del)
    """,
    "upsert": f"""
        WITH {_REF},
        batch AS (
            SELECT CASE WHEN _num_key % 500 = 0 THEN 'up-' || order_id ELSE order_id END AS order_id,
                   'UPSERTED' AS description, 'upsert.png' AS s3_prefix
            FROM ref_orders WHERE _num_key % 250 = 0
        )
        SELECT r.order_id,
               COALESCE(b.description, r.description) AS description,
               COALESCE(b.s3_prefix, r.s3_prefix) AS s3_prefix
        FROM ref_orders r LEFT JOIN batch b USING (order_id)
        UNION ALL
        SELECT * FROM batch WHERE order_id NOT IN (SELECT order_id FROM ref_orders)
    """,
    "rename_envelope": f"""
        WITH {_REF}
        SELECT order_id AS "orderId", description, s3_prefix AS "s3Prefix" FROM ref_orders
    """,
    "trim_description": """
        SELECT doc_id,
               CASE WHEN length(text) > 30
                    THEN substring(text, 1, 24) || '(TRIM)'
                    ELSE text END AS description,
               CAST(length(CASE WHEN length(text) > 30
                    THEN substring(text, 1, 24) || '(TRIM)'
                    ELSE text END) AS INT) AS description_len
        FROM documents
    """,
    "s3_key": f"""
        WITH {_REF}
        SELECT order_id, 'orders/' || order_id || '/' || s3_prefix AS object_key
        FROM ref_orders
    """,
    "strip_arn": f"""
        WITH {_REF}
        SELECT order_id,
               regexp_replace('arn:aws:s3:::bucket-' || order_id, '^arn:aws:s3:::', '') AS bucket_name
        FROM ref_orders
    """,
    "cast_with_default": """
        SELECT o_orderkey,
               COALESCE(TRY_CAST(string_split(o_orderpriority, '-')[1] AS INT), -1) AS priority_num,
               COALESCE(TRY_CAST('1dscx' AS INT), 0) AS bad_offset
        FROM orders
    """,
    "pages_envelope": """
        SELECT CAST(COUNT(o_orderkey) AS BIGINT) AS orders_count,
               3 AS page_limit,
               LEAST(0, CAST(COUNT(o_orderkey) AS INT)) AS page_offset,
               CASE WHEN 3 > COUNT(o_orderkey) THEN 0
                    ELSE CAST(FLOOR(3.0 / COUNT(o_orderkey)) AS INT) END AS pages
        FROM orders
    """,
    "collect_page_keys": f"""
        WITH {_REF}
        SELECT 'orders/' || order_id || '/' || s3_prefix AS s3_key
        FROM (SELECT * FROM ref_orders ORDER BY order_id LIMIT 5 OFFSET 0)
    """,
    "bridge_coalesce": f"""
        WITH {_REF},
        new AS (
            SELECT order_id, description, s3_prefix FROM ref_orders WHERE _num_key % 3 != 0
        ),
        legacy AS (
            SELECT order_id, 'legacy:' || description AS description, s3_prefix
            FROM ref_orders WHERE _num_key % 3 != 1
        )
        SELECT * FROM new
        UNION ALL
        SELECT * FROM legacy WHERE order_id NOT IN (SELECT order_id FROM new)
    """,
    "object_linkage": f"""
        WITH {_REF},
        objects AS (
            SELECT 'orders/' || CAST(doc_id AS VARCHAR) || '/image.png' AS object_key,
                   n_chars AS size_bytes
            FROM documents
        )
        SELECT 'orders/' || order_id || '/' || s3_prefix AS object_key,
               order_id, description, s3_prefix, size_bytes
        FROM ref_orders r
        JOIN objects o ON o.object_key = 'orders/' || r.order_id || '/' || r.s3_prefix
    """,
    "json_extract": """
        SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events
    """,
    "json_envelope": f"""
        WITH {_REF}
        SELECT order_id,
               '{{"order_id":"' || order_id || '","description":"' || description ||
               '","s3_prefix":"' || s3_prefix || '"}}' AS envelope
        FROM ref_orders
    """,
}
