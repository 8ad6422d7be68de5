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

``read_current`` is the consumer view: union of the pointer runs with
keep-latest-per-key semantics — ``row_number() over (partition by pk
order by cursor desc, run_id desc) = 1`` — so a key UPDATEd in a later
increment shadows its older pointer row without any rewrite of earlier
runs. Pass ``state_path`` for READ COMMITTED (only ledger-committed
runs are scanned); without it the view is documented READ UNCOMMITTED
(every run dir on disk, including crashed passes' increments). The same
transform is registered as the value-oracled
``incremental_pointer_latest`` query (plans/parity twin discipline).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalars import DEFAULT_S3_PREFIX
from ..sources.object_store import make_store
from .blob_pipeline import externalize_blobs
from .mutation import _writer_lock

LEDGER_PREFIX = "run-"


def _delete_objects(tombstones: DataFrame, store_url: str, pk: str) -> int:
    """Tolerant distributed object delete for tombstoned keys (one store
    client per task, same G1 batching as the writes). ``delete`` itself
    is absence-tolerant (S3 returns 204 for a missing key), so the
    returned audit counter comes from an A14 existence check first: it
    counts keys whose object was PRESENT and removed — a retry that
    finds them already gone reports 0 and is equally converged."""
    import pandas as pd

    def kernel(batches):
        store = make_store(store_url)
        for pdf in batches:
            out = []
            for oid in pdf[pk]:
                key = f"orders/{oid}/{DEFAULT_S3_PREFIX}"
                existed = store.head(key)
                store.delete(key)
                out.append(bool(existed))
            yield pd.DataFrame({"deleted": out})

    results = tombstones.select(pk).mapInPandas(kernel, "deleted boolean")
    return results.filter(F.col("deleted")).count()


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
    means no pass has committed a cursor yet: the next pass is the full
    backfill. Entries CAN carry ``watermark: None`` (a compaction
    committed before any migrate pass), so the max skips them — a bare
    ``max()`` would raise TypeError on None vs value and wedge every
    subsequent pass."""
    entries = _ledger_entries(state_path)
    if not entries:
        return None, 0
    watermark = max(
        (e["watermark"] for e in entries if e["watermark"] is not None),
        default=None,
    )
    return watermark, max(e["run_id"] for e in entries) + 1


def _committed_run_dirs(state_path: str, pointers_root: str) -> list[str]:
    """Leaf ``run=<id>`` dirs whose id appears in the committed ledger and
    which still exist on disk (a committed run's dir may legitimately be
    gone after a later compaction swept it)."""
    ids = sorted({e["run_id"] for e in _ledger_entries(state_path)})
    return [
        os.path.join(pointers_root, f"run={i}")
        for i in ids
        if os.path.isdir(os.path.join(pointers_root, f"run={i}"))
    ]


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
                 cursor_col: str = "cursor",
                 state_path: str | None = None) -> DataFrame:
    """Keep-latest consumer view over the pointer runs.

    With ``state_path`` (the run ledger): READ COMMITTED — only ``run=``
    dirs whose run id appears in a committed ledger entry are scanned, so
    a crashed pass's half-written increment is invisible until its retry
    commits. The committed dirs are read as explicit leaf paths: a dirty
    dir's (possibly partial) parquet footers are never even opened.

    Without ``state_path``: READ UNCOMMITTED, documented — every
    ``run=`` dir on disk is scanned, including increments from crashed
    passes that a retry may rewrite. Acceptable only when the caller
    knows no pass has ever crashed mid-write (e.g. single-process tests).

    The ``run=<id>`` dir / Hive partition column ``run`` is dropped:
    rows carry their lineage (run_id, cursor) as data columns — the dirs
    exist for idempotent per-run overwrite and run-grain pruning, not as
    the source of truth."""
    pointers_root = f"{target_path}/pointers"
    if state_path is None:
        pointers = spark.read.parquet(pointers_root)
    else:
        committed = _committed_run_dirs(state_path, pointers_root)
        if not committed:
            raise FileNotFoundError(
                f"no committed pointer runs under {pointers_root} "
                f"(ledger: {state_path})"
            )
        pointers = spark.read.parquet(*committed)
    if "run" in pointers.columns:
        pointers = pointers.drop("run")
    latest = keep_latest(pointers, pk, cursor_col)
    if "is_deleted" in latest.columns:
        # a key whose LATEST row is a tombstone is gone from the view
        # (its history stays in the runs until compaction sweeps it)
        latest = latest.filter(
            ~F.coalesce(F.col("is_deleted"), F.lit(False))
        )
    return latest


class CompactionHorizonError(RuntimeError):
    """Requested an as-of view older than the last compaction sweep."""


def read_as_of(spark: SparkSession, target_path: str, run_id: int,
               pk: str = "order_id", cursor_col: str = "cursor",
               state_path: str | None = None) -> DataFrame:
    """TIME-TRAVEL consumer view: the keep-latest state exactly as
    ``read_current`` returned it right after committed run ``run_id``
    landed — union of committed pointer runs with id <= run_id,
    keep-latest per key, tombstone-hidden. The audit/debug read every
    table format with a commit log offers (Delta `VERSION AS OF`,
    Iceberg snapshot reads); here the ledger IS the commit log, so a
    version is a committed run id.

    Honest horizon semantics instead of silent wrong answers:

    - ``run_id`` must be a COMMITTED id (ValueError otherwise — asking
      for an uncommitted or future version is a caller bug, not an
      empty view).
    - Compaction sweeps shadowed history dirs, so a version older than
      the last compaction is UNRECONSTRUCTIBLE; that read raises
      ``CompactionHorizonError`` (the Delta/Iceberg vacuum-retention
      caveat, surfaced as a typed error rather than a view that is
      quietly missing rows). The compacted run itself is a valid
      travel point: its rows keep their ORIGINAL (cursor, run_id)
      lineage, so views from the horizon forward are byte-stable
      across compactions.
    """
    if state_path is None:
        raise ValueError("read_as_of requires the run ledger (state_path)")
    entries = _ledger_entries(state_path)
    ids = sorted(e["run_id"] for e in entries)
    if run_id not in ids:
        raise ValueError(
            f"run {run_id} is not a committed version (committed: {ids})"
        )
    pointers_root = f"{target_path}/pointers"
    compactions = [e["run_id"] for e in entries if e.get("compaction")]
    horizon = max(compactions, default=None)
    if horizon is not None and run_id < horizon:
        raise CompactionHorizonError(
            f"version {run_id} predates compaction run {horizon}, which "
            f"swept the history needed to reconstruct it; earliest "
            f"reconstructible version is {horizon}"
        )
    # a compaction run consolidates everything before itself, so the read
    # set is [horizon .. run_id]; without one it is every id <= run_id
    lo = horizon if horizon is not None else -1
    wanted = [i for i in ids if lo <= i <= run_id]
    dirs, missing = [], []
    for i in wanted:
        d = os.path.join(pointers_root, f"run={i}")
        (dirs if os.path.isdir(d) else missing).append(d if os.path.isdir(d) else i)
    if missing:
        raise CompactionHorizonError(
            f"version {run_id} needs run dirs {missing} that are gone from "
            f"disk (outside any committed compaction's sweep — storage loss, "
            f"not history retention)"
        )
    pointers = spark.read.parquet(*dirs)
    if "run" in pointers.columns:
        pointers = pointers.drop("run")
    latest = keep_latest(pointers, pk, cursor_col)
    if "is_deleted" in latest.columns:
        latest = latest.filter(~F.coalesce(F.col("is_deleted"), F.lit(False)))
    return latest


def compact_pointer_runs(
    spark: SparkSession, target_path: str, state_path: str,
    pk: str = "order_id", cursor_col: str = "cursor",
    lock_timeout_s: float = 600.0,
) -> dict:
    """Materialize the keep-latest view into ONE pointer run and drop the
    shadowed history — the periodic compaction that keeps merge-on-read
    cheap (read_current's window cost grows with run count, not data).

    Crash-ordering contract (each clause closes a real loss path):

    - **The output run id never reuses an existing dir.** The ledger's
      next id can collide with a dir left by a crashed uncommitted pass;
      writing there and then sweeping "old" dirs would delete the fresh
      compaction output while its ledger entry commits as successful.
      The id is bumped past every ``run=`` dir on disk instead.
    - **Only COMMITTED runs are compacted** (read_current with the
      ledger): a crashed pass's half-written increment is neither
      consolidated nor silently promoted — its owner's retry re-reads
      the same rows from the source (the watermark never moved).
    - **The ledger entry commits BEFORE any dir is removed.** A crash
      between the compacted write and the deletes leaves byte-identical
      duplicates (rows keep their ORIGINAL (cursor, run_id) lineage, so
      keep_latest resolves both copies to the same view) which the next
      sweep removes. The reverse order could delete the only copy of the
      consolidated history while the ledger still pointed readers at it.
    - **After the commit, every other run dir is removed** — committed
      dirs are shadowed history; an uncommitted dir belongs to a dead
      pass (the lease serializes writers, so nobody live owns it) whose
      increment is recomputable from the unchanged watermark.

    Serialized against migrators by the same ledger lease
    (``lock_timeout_s``, see migrate_increment on why passes serialize);
    the ledger entry records the compaction without moving the
    watermark."""
    import shutil

    os.makedirs(state_path, exist_ok=True)
    with _writer_lock(f"{state_path}/ledger", timeout_s=lock_timeout_s):
        watermark, run_id = current_watermark(state_path)
        pointers_root = f"{target_path}/pointers"
        if not os.path.isdir(pointers_root):
            return {"run_id": run_id, "n_rows": 0, "compaction": True,
                    "committed": False}
        all_runs = [d for d in os.listdir(pointers_root) if d.startswith("run=")]
        if not _committed_run_dirs(state_path, pointers_root):
            # nothing committed to compact — dirty dirs (if any) belong
            # to crashed passes whose retries will rewrite them
            return {"run_id": run_id, "n_rows": 0, "compaction": True,
                    "committed": False}
        existing_ids = []
        for d in all_runs:
            try:
                existing_ids.append(int(d.split("=", 1)[1]))
            except ValueError:
                pass
        if existing_ids:  # never reuse a dir of unknown provenance
            run_id = max(run_id, max(existing_ids) + 1)
        current = read_current(spark, target_path, pk, cursor_col,
                               state_path=state_path)
        n_rows = current.count()
        out_dir = f"run={run_id}"
        current.write.mode("overwrite").parquet(f"{pointers_root}/{out_dir}")
        entry = {"run_id": run_id, "watermark": watermark, "n_rows": n_rows,
                 "compaction": True, "committed": True}
        _commit_run(state_path, entry)
        for d in all_runs:  # commit is durable: now drop the history
            if d != out_dir:
                shutil.rmtree(os.path.join(pointers_root, d),
                              ignore_errors=True)
        return entry


def vacuum_pointer_runs(
    target_path: str, state_path: str, lock_timeout_s: float = 600.0,
) -> dict:
    """The cheap sweep compaction's crash-ordering contract defers to:
    remove superseded pointer-run dirs WITHOUT rewriting any data (pure
    file-listing + ledger, no Spark job — unlike re-running
    ``compact_pointer_runs``, which pays a full keep-latest shuffle just
    to drop duplicates a crash left behind).

    Under the same ledger lease (no live writer can exist while it is
    held), a run dir is removable iff:

    - its id is BELOW the latest committed compaction's id — that
      compaction consolidated all earlier history into its own run, so
      the dir is shadowed whether or not it was committed (this is
      exactly the byte-identical-duplicate window the compaction
      docstring leaves "for the next sweep"); or
    - its id is absent from the committed ledger — a dead pass's
      leftover (the lease serializes writers, so nobody live owns it;
      the committed watermark never advanced, so its increment is
      recomputable; ``read_current`` already ignores it).

    Everything else — the compaction run itself and committed
    post-compaction increments — stays. Returns
    ``{"removed_shadowed", "removed_uncommitted", "kept"}`` counts."""
    import shutil

    os.makedirs(state_path, exist_ok=True)
    with _writer_lock(f"{state_path}/ledger", timeout_s=lock_timeout_s):
        pointers_root = f"{target_path}/pointers"
        if not os.path.isdir(pointers_root):
            return {"removed_shadowed": 0, "removed_uncommitted": 0, "kept": 0}
        entries = _ledger_entries(state_path)
        committed_ids = {e["run_id"] for e in entries}
        compaction_ids = [
            e["run_id"] for e in entries if e.get("compaction") and e.get("committed")
        ]
        # a committed compaction whose dir a later crash removed is not a
        # valid shadow anchor; require the dir to exist
        anchor = max(
            (
                i
                for i in compaction_ids
                if os.path.isdir(os.path.join(pointers_root, f"run={i}"))
            ),
            default=None,
        )
        removed_shadowed = removed_uncommitted = kept = 0
        for d in sorted(os.listdir(pointers_root)):
            if not d.startswith("run="):
                continue
            try:
                rid = int(d.split("=", 1)[1])
            except ValueError:
                continue
            path = os.path.join(pointers_root, d)
            if anchor is not None and rid < anchor:
                shutil.rmtree(path, ignore_errors=True)
                removed_shadowed += 1
            elif rid not in committed_ids:
                shutil.rmtree(path, ignore_errors=True)
                removed_uncommitted += 1
            else:
                kept += 1
        return {
            "removed_shadowed": removed_shadowed,
            "removed_uncommitted": removed_uncommitted,
            "kept": kept,
        }


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
    op_col: str | None = None,
    lock_timeout_s: float = 600.0,
) -> dict:
    """One incremental pass (module docstring). ``source`` is the lazily
    built full-table frame (e.g. ``JdbcSource.load(spark)``); the
    watermark filter applied here reaches the RDBMS as a pushed
    predicate. Returns the pass summary (committed ledger entry, or a
    no-op marker when the increment is empty).

    **Passes serialize fully, by design.** The ledger lease is held for
    the WHOLE pass — JDBC scan, blob externalization, pointer write,
    commit — not just the watermark read and the commit. Releasing it
    mid-pass would let two passes compute the same next run id and race
    their overwrites of the same staging/pointer dirs; keyed-idempotence
    protects against a RETRY of a dead pass, not against a concurrent
    live one. This matches the reference's single-writer migration job
    (one Lambda, lambda_fns/order_rdbms_blob.js:447-523). A second
    migrator or compactor therefore waits up to ``lock_timeout_s``
    (default 600 s — sized for a long scan, unlike mutation.rewrite's
    60 s point-write default) and then raises WriterLockTimeout.

    ``op_col`` enables source-side DELETE capture for append-only CDC
    feeds whose rows carry an op marker ('D' = tombstone, anything else
    = upsert). Tombstoned keys get their OBJECT deleted first (tolerant
    — a retry after a crash finds it already gone) and then a pointer
    tombstone row (``is_deleted = true``), the reference's S3-first
    cascade ordering (order.js:346-351 / README.md:126) applied
    incrementally; ``read_current`` hides keys whose LATEST row is a
    tombstone while the history stays queryable until compaction."""
    os.makedirs(state_path, exist_ok=True)
    with _writer_lock(f"{state_path}/ledger", timeout_s=lock_timeout_s):
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
        is_tomb = (
            F.col(op_col) == F.lit("D") if op_col else F.lit(False)
        )
        live = staged.filter(~is_tomb)
        manifest = externalize_blobs(live, store_url, pk=pk, blob_col=blob_col)
        n_written = manifest.filter(F.col("status") == "written").count()
        n_deleted = 0
        if op_col:
            # objects FIRST, pointer tombstones second (order.js:346-351
            # ordering) — tolerant delete, so a crash-retry converges
            n_deleted = _delete_objects(staged.filter(is_tomb), store_url, pk)
        pointer_rows = staged.select(
            F.col(pk).alias("order_id"),
            "description",
            F.col(cursor_col).alias("cursor"),
            F.lit(run_id).alias("run_id"),
            is_tomb.alias("is_deleted"),
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
            "n_objects_deleted": n_deleted,
            "committed": True,
        }
        _commit_run(state_path, entry)
        return entry
