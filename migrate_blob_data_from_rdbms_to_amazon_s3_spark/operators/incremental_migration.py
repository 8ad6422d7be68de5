"""Incremental RDBMS→S3 migration: keyset-cursor passes, not full re-reads.

The reference's migration job reads the whole source table every run
(lambda_fns/order_rdbms_blob.js:447-523 walks the table page by page and
externalizes each blob). At 100 TB the source scan must be INCREMENTAL —
each pass reads only rows whose monotone cursor (auto-increment PK,
``updated_at``) moved past the last committed watermark, and the filter
is PUSHED INTO the RDBMS so the database never ships old rows.

One pass (``migrate_increment``):

1. **Read the increment** — ``cursor > watermark`` filtered JDBC scan
   (Catalyst pushes the predicate; tests assert ``PushedFilters`` on
   embedded Derby). Parallelized by the source's partition column.
2. **Stage it** — the raw increment lands in
   ``{target}/staging/run=<id>`` Parquet BEFORE any side-effect. The
   RDBMS is scanned exactly once per pass; blob writes and pointer rows
   both derive from the immutable staged copy, so a retry never sees a
   different increment than the failed attempt.
3. **Externalize blobs** — operators/blob_pipeline.externalize_blobs
   over the staged copy (one store client per task, manifest receipt,
   10 MB cap contract of order.js:388). Object keys are derived from
   the PK, so re-writing after a crash overwrites the same keys:
   idempotent.
4. **Emit pointer rows** — the post-migration shape plus ``(run_id,
   cursor)`` lineage columns, written to ``{target}/pointers/run=<id>``
   (overwrite — a re-run of the same pass replaces its own output, it
   never duplicates it).
5. **Commit the watermark LAST** — a run-ledger JSON in ``state_path``
   recording ``max(cursor)`` of the staged increment. Written via
   temp-file + atomic rename under the kernel flock lease
   (operators/mutation._writer_lock), so concurrent migrators serialize
   and a half-written ledger entry can never be read back.

Crash anywhere before step 5 ⇒ the watermark is unchanged and the next
pass re-reads the same rows; every downstream effect is keyed
(object keys by PK, pointer dirs by run id, staging dirs by run id), so
re-execution converges — at-least-once passes with idempotent effects.
The ledger is append-only; the live watermark is the max over committed
runs, so readers never depend on in-place file mutation. (Like the
mutation lease, plain-file atomicity is a local/POSIX rendition — on an
object store the ledger becomes a table-format commit.)

``read_current`` is the consumer view: union of all pointer runs with
keep-latest-per-key semantics — ``row_number() over (partition by pk
order by cursor desc, run_id desc) = 1`` — so a key UPDATEd in a later
increment shadows its older pointer row without any rewrite of earlier
runs. The same transform is registered as the value-oracled
``incremental_pointer_latest`` query (plans/parity twin discipline).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .blob_pipeline import externalize_blobs
from .mutation import _writer_lock

LEDGER_PREFIX = "run-"


def _ledger_entries(state_path: str) -> list[dict]:
    if not os.path.isdir(state_path):
        return []
    out = []
    for name in sorted(os.listdir(state_path)):
        if name.startswith(LEDGER_PREFIX) and name.endswith(".json"):
            with open(os.path.join(state_path, name)) as fh:
                out.append(json.load(fh))
    return out


def current_watermark(state_path: str):
    """(watermark, next_run_id) from the committed ledger. None watermark
    means no pass has committed: the next pass is the full backfill."""
    entries = _ledger_entries(state_path)
    if not entries:
        return None, 0
    return max(e["watermark"] for e in entries), max(e["run_id"] for e in entries) + 1


def _commit_run(state_path: str, entry: dict) -> None:
    """Append one ledger entry: temp write + atomic rename, serialized by
    the kernel flock lease so two migrators can't both claim a run id."""
    os.makedirs(state_path, exist_ok=True)
    name = f"{LEDGER_PREFIX}{entry['run_id']:08d}.json"
    tmp = os.path.join(state_path, f".{name}.tmp")
    with open(tmp, "w") as fh:
        json.dump(entry, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, os.path.join(state_path, name))


def keep_latest(pointers: DataFrame, pk: str = "order_id",
                cursor_col: str = "cursor") -> DataFrame:
    """Keep-latest-per-key consumer view over unioned pointer runs: the
    newest (cursor, run_id) wins. One shuffle on the PK; at scale the
    window is the standard merge-on-read pattern (a periodic compaction
    materializes it back to one run)."""
    w = Window.partitionBy(pk).orderBy(
        F.col(cursor_col).desc(), F.col("run_id").desc()
    )
    return (
        pointers.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def read_current(spark: SparkSession, target_path: str, pk: str = "order_id",
                 cursor_col: str = "cursor") -> DataFrame:
    """Union of every committed pointer run, keep-latest per key. The
    ``run=<id>`` dirs read back as a Hive partition column ``run`` —
    dropped here because the rows carry their lineage (run_id, cursor)
    as data columns (the dirs exist for idempotent per-run overwrite and
    run-grain pruning, not as the source of truth)."""
    pointers = spark.read.parquet(f"{target_path}/pointers")
    if "run" in pointers.columns:
        pointers = pointers.drop("run")
    return keep_latest(pointers, pk, cursor_col)


def compact_pointer_runs(
    spark: SparkSession, target_path: str, state_path: str,
    pk: str = "order_id", cursor_col: str = "cursor",
) -> dict:
    """Materialize the keep-latest view into ONE pointer run and drop the
    shadowed history — the periodic compaction that keeps merge-on-read
    cheap (read_current's window cost grows with run count, not data).

    Rows keep their ORIGINAL (cursor, run_id) lineage, so a crash after
    the compacted run lands but before the old dirs are removed leaves
    only byte-identical duplicates — keep_latest resolves them to the
    same view, and the next compaction sweeps the leftovers. Serialized
    against migrators by the same ledger lease; the ledger entry records
    the compaction without moving the watermark."""
    import shutil

    os.makedirs(state_path, exist_ok=True)
    with _writer_lock(f"{state_path}/ledger"):
        watermark, run_id = current_watermark(state_path)
        pointers_root = f"{target_path}/pointers"
        if not os.path.isdir(pointers_root):
            return {"run_id": run_id, "n_rows": 0, "compaction": True,
                    "committed": False}
        old_runs = [d for d in os.listdir(pointers_root) if d.startswith("run=")]
        current = read_current(spark, target_path, pk, cursor_col)
        n_rows = current.count()
        current.write.mode("overwrite").parquet(f"{pointers_root}/run={run_id}")
        for d in old_runs:  # compacted copy is in place: drop the history
            shutil.rmtree(os.path.join(pointers_root, d), ignore_errors=True)
        entry = {"run_id": run_id, "watermark": watermark, "n_rows": n_rows,
                 "compaction": True, "committed": True}
        _commit_run(state_path, entry)
        return entry


def migrate_increment(
    spark: SparkSession,
    source: DataFrame,
    *,
    store_url: str,
    target_path: str,
    state_path: str,
    cursor_col: str,
    pk: str = "order_id",
    blob_col: str = "order_blob",
) -> dict:
    """One incremental pass (module docstring). ``source`` is the lazily
    built full-table frame (e.g. ``JdbcSource.load(spark)``); the
    watermark filter applied here reaches the RDBMS as a pushed
    predicate. Returns the pass summary (committed ledger entry, or a
    no-op marker when the increment is empty)."""
    os.makedirs(state_path, exist_ok=True)
    with _writer_lock(f"{state_path}/ledger"):
        watermark, run_id = current_watermark(state_path)
        increment = source
        if watermark is not None:
            increment = increment.filter(F.col(cursor_col) > F.lit(watermark))
        staging = f"{target_path}/staging/run={run_id}"
        increment.write.mode("overwrite").parquet(staging)
        staged = spark.read.parquet(staging)
        n_rows = staged.count()
        if n_rows == 0:
            return {"run_id": run_id, "watermark": watermark, "n_rows": 0,
                    "committed": False}
        manifest = externalize_blobs(staged, store_url, pk=pk, blob_col=blob_col)
        n_written = manifest.filter(F.col("status") == "written").count()
        pointer_rows = staged.select(
            F.col(pk).alias("order_id"),
            "description",
            F.col(cursor_col).alias("cursor"),
            F.lit(run_id).alias("run_id"),
        )
        pointer_rows.write.mode("overwrite").parquet(
            f"{target_path}/pointers/run={run_id}"
        )
        new_watermark = staged.agg(F.max(cursor_col)).collect()[0][0]
        entry = {
            "run_id": run_id,
            "watermark": (
                new_watermark.isoformat()
                if hasattr(new_watermark, "isoformat")
                else new_watermark
            ),
            "n_rows": n_rows,
            "n_objects_written": n_written,
            "committed": True,
        }
        _commit_run(state_path, entry)
        return entry
