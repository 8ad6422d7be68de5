"""Keyed mutations over immutable Parquet — SURVEY.md §2 A6-A10, plan §7 M3.

The reference mutates rows in MySQL (INSERT order.js:690-701, UPDATE
order.js:707-718, DELETE order.js:673-684). Spark tables are immutable
files, so PK semantics become join-rewrites:

- insert      = PK-safe append: left-anti against existing keys, then union
- update      = left join + coalesce per column (merge semantics)
- delete      = left-anti join on the key set
- upsert      = update ∪ insert in one pass

All four are pure DataFrame transforms (oracle-checkable); ``rewrite``
materializes one atomically via write-temp-then-swap. At 100 TB the rewrite
should be partition-scoped: join the updates to the partition spec first and
rewrite only affected partitions (dynamic partition overwrite), never the
whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def insert_rows(existing: DataFrame, new_rows: DataFrame, pk: str) -> DataFrame:
    """A6 PK-safe insert: append only rows whose key is not already present
    (the reference relies on the MySQL PRIMARY KEY constraint; we enforce it
    with a left-anti join). New-row side is typically small → broadcast."""
    fresh = new_rows.join(F.broadcast(existing.select(pk)), pk, "left_anti")
    return existing.unionByName(fresh)


def update_rows(existing: DataFrame, updates: DataFrame, pk: str) -> DataFrame:
    """A7/A8 keyed update: for every non-PK column present in ``updates``,
    take the update value when a matching key exists, else keep the old one
    (UPDATE ... SET col = ? WHERE order_id = ?, order.js:707-718)."""
    upd_cols = [c for c in updates.columns if c != pk]
    renamed = updates.select(pk, *[F.col(c).alias(f"__upd_{c}") for c in upd_cols])
    joined = existing.join(F.broadcast(renamed), pk, "left")
    out_cols = []
    for c in existing.columns:
        if c in upd_cols:
            out_cols.append(F.coalesce(F.col(f"__upd_{c}"), F.col(c)).alias(c))
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def delete_rows(existing: DataFrame, keys: DataFrame, pk: str) -> DataFrame:
    """A9 keyed delete: left-anti join (DELETE WHERE order_id = ?,
    order.js:673-684). Deleting an absent key is a no-op, matching the
    reference's idempotent-delete probe (test/order.test.js:433-445)."""
    return existing.join(F.broadcast(keys.select(pk)), pk, "left_anti")


def upsert_rows(existing: DataFrame, rows: DataFrame, pk: str) -> DataFrame:
    """MERGE-style upsert = update matched + insert unmatched, one shuffle."""
    return insert_rows(update_rows(existing, rows, pk), rows, pk)


def rewrite(df: DataFrame, path: str) -> None:
    """Materialize a mutation atomically: write to a temp dir, then swap.
    (Plain-Parquet analog of a transactional commit; with a table format
    like Delta/Iceberg this becomes a real MERGE.)"""
    import shutil
    import uuid

    tmp = f"{path.rstrip('/')}.__tmp_{uuid.uuid4().hex}"
    df.write.mode("overwrite").parquet(tmp)
    # Spark accepts file: URIs; shutil needs bare paths
    local_tmp, local_path = tmp.removeprefix("file:"), path.removeprefix("file:")
    shutil.rmtree(local_path, ignore_errors=True)
    shutil.move(local_tmp, local_path)
