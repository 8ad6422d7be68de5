"""Incremental RDBMS→S3 migration (operators/incremental_migration):
keyset-cursor passes against embedded Derby.

Contracts under test:
- the watermark filter reaches the RDBMS (PushedFilters on the JDBC scan)
  and a pass stages ONLY rows past the last committed cursor;
- objects + pointer rows land per pass; the ledger commits LAST;
- a key re-emitted at a later cursor ("update" in the append-only CDC
  shape) shadows its old pointer in read_current without rewriting the
  earlier run's files;
- a crash before the ledger commit (simulated by deleting the last
  ledger entry) makes the next pass redo the same increment and
  converge to the identical state — at-least-once + idempotent effects;
- an empty increment is a committed no-op (no ledger growth).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.incremental_migration import (
    current_watermark,
    migrate_increment,
    read_current,
)
from migrate_blob_data_from_rdbms_to_amazon_s3_spark.sources.jdbc import JdbcSource
from migrate_blob_data_from_rdbms_to_amazon_s3_spark.sources.object_store import (
    make_store,
)

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture()
def derby_cdc(spark, tmp_path):
    """Embedded Derby with an append-only CDC-shaped source table:
    (seq BIGINT monotone cursor, order_id, description, order_blob)."""
    url = f"jdbc:derby:{tmp_path}/cdcdb;create=true"

    def write(rows, mode="append"):
        spark.createDataFrame(
            rows, "seq long, order_id string, description string, order_blob binary"
        ).write.format("jdbc").options(
            url=url, dbtable="orders_cdc", driver=DERBY_DRIVER
        ).mode(mode).save()

    write(
        [(i, f"id-{i:03d}", f"desc {i}", bytes([i % 251] * (50 + i))) for i in range(1, 11)],
        mode="overwrite",
    )
    return url, write


def _src(url):
    return JdbcSource(url=url, table="orders_cdc", driver=DERBY_DRIVER)


def _paths(tmp_path):
    return (
        f"file://{tmp_path}/objstore",
        str(tmp_path / "target"),
        str(tmp_path / "state"),
    )


def test_incremental_passes_and_keep_latest(spark, derby_cdc, tmp_path):
    url, write = derby_cdc
    store_url, target, state = _paths(tmp_path)
    source = _src(url).load(spark)

    # pass 1: full backfill (no watermark yet)
    e1 = migrate_increment(
        spark, source, store_url=store_url, target_path=target,
        state_path=state, cursor_col="seq",
    )
    assert e1 == {"run_id": 0, "watermark": 10, "n_rows": 10,
                  "n_objects_written": 10, "n_objects_deleted": 0,
                  "committed": True}
    assert current_watermark(state) == (10, 1)
    assert make_store(store_url).head("orders/id-003/image.png")

    # source grows: 5 inserts + 1 re-emit of id-005 at a later cursor
    write([(i, f"id-{i:03d}", f"desc {i}", bytes([i % 251] * 60)) for i in range(11, 16)])
    write([(16, "id-005", "desc 5 UPDATED", b"\x05" * 99)])

    # pass 2 must stage ONLY the 6 new rows, and the filter must be
    # pushed into Derby
    filtered = source.filter(F.col("seq") > F.lit(10))
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "seq" in plan.split("PushedFilters", 1)[1][:200]
    e2 = migrate_increment(
        spark, source, store_url=store_url, target_path=target,
        state_path=state, cursor_col="seq",
    )
    assert e2["n_rows"] == 6 and e2["watermark"] == 16 and e2["run_id"] == 1

    # keep-latest view: 15 distinct keys; the re-emitted key shows the
    # updated description from run 1, everything else its backfill row
    cur = read_current(spark, target)
    rows = {r["order_id"]: (r["description"], r["cursor"], r["run_id"])
            for r in cur.collect()}
    assert len(rows) == 15
    assert rows["id-005"] == ("desc 5 UPDATED", 16, 1)
    assert rows["id-004"] == ("desc 4", 4, 0)
    # the updated object was overwritten in place (keyed by PK)
    assert make_store(store_url).get("orders/id-005/image.png") == b"\x05" * 99

    # pass 3: nothing new -> uncommitted no-op, ledger unchanged
    e3 = migrate_increment(
        spark, source, store_url=store_url, target_path=target,
        state_path=state, cursor_col="seq",
    )
    assert e3 == {"run_id": 2, "watermark": 16, "n_rows": 0, "committed": False}
    assert current_watermark(state) == (16, 2)


def test_crash_before_ledger_commit_is_idempotent(spark, derby_cdc, tmp_path):
    url, write = derby_cdc
    store_url, target, state = _paths(tmp_path)
    source = _src(url).load(spark)
    migrate_increment(spark, source, store_url=store_url, target_path=target,
                      state_path=state, cursor_col="seq")
    write([(i, f"id-{i:03d}", f"desc {i}", bytes([7] * 64)) for i in range(11, 14)])
    e2 = migrate_increment(spark, source, store_url=store_url, target_path=target,
                           state_path=state, cursor_col="seq")
    before = {tuple(r) for r in read_current(spark, target).collect()}

    # simulate a crash BETWEEN the data writes and the ledger commit:
    # delete run 1's ledger entry (its staging/pointer/object effects stay)
    os.unlink(os.path.join(state, f"run-{e2['run_id']:08d}.json"))
    assert current_watermark(state) == (10, 1)

    # the retry re-reads the same increment, overwrites the same run
    # dirs and object keys, and converges to the identical state
    e2b = migrate_increment(spark, source, store_url=store_url, target_path=target,
                            state_path=state, cursor_col="seq")
    assert e2b == e2
    after = {tuple(r) for r in read_current(spark, target).collect()}
    assert after == before
    assert current_watermark(state) == (13, 2)


def test_tombstones_cascade_s3_first(spark, tmp_path):
    """op_col='D' rows delete the object FIRST, then land a pointer
    tombstone; read_current hides the key; a replay of the same pass
    (crash simulation) converges — the tolerant delete finds the object
    already gone."""
    import os as _os

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.incremental_migration import (
        compact_pointer_runs,
    )

    url = f"jdbc:derby:{tmp_path}/tombdb;create=true"

    def write(rows, mode="append"):
        spark.createDataFrame(
            rows,
            "seq long, order_id string, description string, "
            "order_blob binary, op string",
        ).write.format("jdbc").options(
            url=url, dbtable="orders_cdc_ops", driver=DERBY_DRIVER
        ).mode(mode).save()

    write([(i, f"id-{i:03d}", f"desc {i}", bytes([i]) * 20, "I")
           for i in range(1, 6)], mode="overwrite")
    store_url, target, state = _paths(tmp_path)
    source = JdbcSource(url=url, table="orders_cdc_ops",
                        driver=DERBY_DRIVER).load(spark)
    kw = dict(store_url=store_url, target_path=target, state_path=state,
              cursor_col="seq", op_col="op")
    e1 = migrate_increment(spark, source, **kw)
    assert e1["n_objects_written"] == 5 and e1["n_objects_deleted"] == 0
    store = make_store(store_url)
    assert store.head("orders/id-002/image.png")

    # tombstone id-002, update id-003
    write([(6, "id-002", None, None, "D"),
           (7, "id-003", "desc 3 v2", b"v2" * 5, "U")])
    e2 = migrate_increment(spark, source, **kw)
    assert e2["n_rows"] == 2
    assert e2["n_objects_written"] == 1 and e2["n_objects_deleted"] == 1
    assert not store.head("orders/id-002/image.png")  # object gone FIRST
    cur = {r["order_id"]: r["description"]
           for r in read_current(spark, target).collect()}
    assert "id-002" not in cur and cur["id-003"] == "desc 3 v2"
    assert len(cur) == 4

    # crash-replay of pass 2: delete its ledger entry and rerun
    _os.unlink(_os.path.join(state, f"run-{e2['run_id']:08d}.json"))
    e2b = migrate_increment(spark, source, **kw)
    assert e2b["n_objects_deleted"] == 0  # already gone: tolerant, converged
    assert {r["order_id"] for r in read_current(spark, target).collect()} == set(cur)

    # compaction sweeps the tombstone history entirely
    entry = compact_pointer_runs(spark, target, state)
    assert entry["n_rows"] == 4
    assert {r["order_id"] for r in read_current(spark, target).collect()} == set(cur)


def test_compaction_preserves_view_and_drops_history(spark, derby_cdc, tmp_path):
    import os as _os

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.incremental_migration import (
        compact_pointer_runs,
    )

    url, write = derby_cdc
    store_url, target, state = _paths(tmp_path)
    source = _src(url).load(spark)
    migrate_increment(spark, source, store_url=store_url, target_path=target,
                      state_path=state, cursor_col="seq")
    write([(11, "id-005", "desc 5 UPDATED", b"u" * 8),
           (12, "id-012", "desc 12", b"n" * 8)])
    migrate_increment(spark, source, store_url=store_url, target_path=target,
                      state_path=state, cursor_col="seq")
    before = {tuple(r) for r in read_current(spark, target).collect()}
    assert len(_os.listdir(f"{target}/pointers")) == 2

    entry = compact_pointer_runs(spark, target, state)
    assert entry["committed"] and entry["n_rows"] == 11
    # one run dir left; the view is unchanged, lineage columns included
    runs = [d for d in _os.listdir(f"{target}/pointers") if d.startswith("run=")]
    assert runs == [f"run={entry['run_id']}"]
    after = {tuple(r) for r in read_current(spark, target).collect()}
    assert after == before
    # the watermark did not move, and the next pass still works
    wm, next_run = current_watermark(state)
    assert wm == 12 and next_run == entry["run_id"] + 1
    write([(13, "id-013", "desc 13", b"x" * 8)])
    e = migrate_increment(spark, source, store_url=store_url, target_path=target,
                          state_path=state, cursor_col="seq")
    assert e["n_rows"] == 1
    assert {r["order_id"] for r in read_current(spark, target).collect()} >= {"id-013"}


def test_compaction_survives_dirty_run_dir_collision(spark, derby_cdc, tmp_path):
    """A crashed pass leaves an UNCOMMITTED ``run=N`` dir where N is
    exactly the ledger's next run id. Compaction must not write its
    output there and then sweep it as 'old history' (that deleted the
    freshly compacted data while the ledger entry committed success):
    the output id is bumped past every dir on disk, only COMMITTED runs
    are consolidated, and the crashed pass's retry still converges."""
    import os as _os

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.incremental_migration import (
        compact_pointer_runs,
    )

    url, write = derby_cdc
    store_url, target, state = _paths(tmp_path)
    source = _src(url).load(spark)
    migrate_increment(spark, source, store_url=store_url, target_path=target,
                      state_path=state, cursor_col="seq")
    write([(11, "id-011", "desc 11", b"a" * 8)])
    migrate_increment(spark, source, store_url=store_url, target_path=target,
                      state_path=state, cursor_col="seq")
    committed_before = {
        tuple(r)
        for r in read_current(spark, target, state_path=state).collect()
    }

    # crashed pass: run 2's data landed, its ledger entry did not
    write([(12, "id-012", "desc 12", b"b" * 8)])
    e3 = migrate_increment(spark, source, store_url=store_url,
                           target_path=target, state_path=state,
                           cursor_col="seq")
    _os.unlink(_os.path.join(state, f"run-{e3['run_id']:08d}.json"))
    assert _os.path.isdir(f"{target}/pointers/run={e3['run_id']}")
    assert current_watermark(state) == (11, e3["run_id"])  # collision armed

    entry = compact_pointer_runs(spark, target, state)
    assert entry["committed"] and entry["n_rows"] == 11
    # the output id skipped the dirty dir's id — and the output survived
    assert entry["run_id"] == e3["run_id"] + 1
    runs = sorted(d for d in _os.listdir(f"{target}/pointers")
                  if d.startswith("run="))
    assert runs == [f"run={entry['run_id']}"]
    # the dirty increment was NOT promoted into the committed view
    after = {tuple(r)
             for r in read_current(spark, target, state_path=state).collect()}
    assert after == committed_before
    # the crashed pass retries from the unchanged watermark and converges
    e3b = migrate_increment(spark, source, store_url=store_url,
                            target_path=target, state_path=state,
                            cursor_col="seq")
    assert e3b["n_rows"] == 1 and e3b["committed"]
    keys = {r["order_id"]
            for r in read_current(spark, target, state_path=state).collect()}
    assert "id-012" in keys and len(keys) == 12


def test_compaction_commits_before_deleting_history(spark, derby_cdc,
                                                    tmp_path, monkeypatch):
    """Crash BETWEEN the compaction commit and the history sweep: the
    ledger already has the entry, the old dirs remain as byte-identical
    duplicates, the view is unchanged, and the next compaction sweeps
    the leftovers. (The reverse ordering — delete first — would leave
    the only copy of the consolidated history uncommitted.)"""
    import os as _os
    import shutil as _shutil

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.incremental_migration import (
        compact_pointer_runs,
    )

    url, write = derby_cdc
    store_url, target, state = _paths(tmp_path)
    source = _src(url).load(spark)
    migrate_increment(spark, source, store_url=store_url, target_path=target,
                      state_path=state, cursor_col="seq")
    write([(11, "id-005", "desc 5 v2", b"u" * 8)])
    migrate_increment(spark, source, store_url=store_url, target_path=target,
                      state_path=state, cursor_col="seq")
    before = {tuple(r)
              for r in read_current(spark, target, state_path=state).collect()}

    def boom(*a, **k):
        raise RuntimeError("simulated crash during history sweep")

    monkeypatch.setattr(_shutil, "rmtree", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact_pointer_runs(spark, target, state)
    monkeypatch.undo()

    # the commit preceded the sweep: entry durable, duplicates benign
    entries = [json.load(open(_os.path.join(state, n)))
               for n in sorted(_os.listdir(state)) if n.startswith("run-")]
    assert any(e.get("compaction") and e["committed"] for e in entries)
    assert len([d for d in _os.listdir(f"{target}/pointers")
                if d.startswith("run=")]) == 3  # compacted + 2 leftovers
    mid = {tuple(r)
           for r in read_current(spark, target, state_path=state).collect()}
    assert mid == before
    # the next sweep removes the leftovers and preserves the view
    entry2 = compact_pointer_runs(spark, target, state)
    assert entry2["committed"] and entry2["n_rows"] == len(before)
    runs = [d for d in _os.listdir(f"{target}/pointers") if d.startswith("run=")]
    assert runs == [f"run={entry2['run_id']}"]
    assert {tuple(r) for r in
            read_current(spark, target, state_path=state).collect()} == before


def test_vacuum_sweeps_crash_leftovers_without_rewrite(spark, derby_cdc,
                                                       tmp_path, monkeypatch):
    """The cheap sweep: after a crash between the compaction commit and
    its history sweep, vacuum removes the shadowed duplicates by file
    ops alone — no Spark job, no data rewrite — and the view is
    unchanged. A dead uncommitted dir (crashed pass) goes too; the
    compaction run and committed post-compaction increments stay."""
    import os as _os
    import shutil as _shutil

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.incremental_migration import (
        compact_pointer_runs,
        vacuum_pointer_runs,
    )

    url, write = derby_cdc
    store_url, target, state = _paths(tmp_path)
    source = _src(url).load(spark)
    migrate_increment(spark, source, store_url=store_url, target_path=target,
                      state_path=state, cursor_col="seq")
    write([(11, "id-005", "desc 5 v2", b"u" * 8)])
    migrate_increment(spark, source, store_url=store_url, target_path=target,
                      state_path=state, cursor_col="seq")
    before = {tuple(r)
              for r in read_current(spark, target, state_path=state).collect()}

    def boom(*a, **k):
        raise RuntimeError("simulated crash during history sweep")

    monkeypatch.setattr(_shutil, "rmtree", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        compact_pointer_runs(spark, target, state)
    monkeypatch.undo()

    # a post-compaction committed increment must survive the vacuum
    write([(12, "id-006", "desc 6", b"w" * 8)])
    migrate_increment(spark, source, store_url=store_url, target_path=target,
                      state_path=state, cursor_col="seq")
    after_inc = {tuple(r)
                 for r in read_current(spark, target, state_path=state).collect()}
    # and a dead uncommitted dir (crashed pass leftover) must go
    _os.makedirs(f"{target}/pointers/run=99")

    stats = vacuum_pointer_runs(target, state)
    assert stats["removed_shadowed"] == 2     # the two pre-compaction runs
    assert stats["removed_uncommitted"] == 1  # run=99
    assert stats["kept"] == 2                 # compaction + new increment
    assert {tuple(r) for r in
            read_current(spark, target, state_path=state).collect()} == after_inc

    # idempotent: a second vacuum is a no-op
    again = vacuum_pointer_runs(target, state)
    assert again == {"removed_shadowed": 0, "removed_uncommitted": 0, "kept": 2}


def test_vacuum_without_compaction_keeps_committed_history(spark, derby_cdc,
                                                           tmp_path):
    """No committed compaction anchor: every committed run IS the live
    history and must stay; only dead uncommitted dirs are removable."""
    import os as _os

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.incremental_migration import (
        vacuum_pointer_runs,
    )

    url, write = derby_cdc
    store_url, target, state = _paths(tmp_path)
    source = _src(url).load(spark)
    migrate_increment(spark, source, store_url=store_url, target_path=target,
                      state_path=state, cursor_col="seq")
    write([(11, "id-005", "desc 5 v2", b"u" * 8)])
    migrate_increment(spark, source, store_url=store_url, target_path=target,
                      state_path=state, cursor_col="seq")
    before = {tuple(r)
              for r in read_current(spark, target, state_path=state).collect()}
    _os.makedirs(f"{target}/pointers/run=42")

    stats = vacuum_pointer_runs(target, state)
    assert stats == {"removed_shadowed": 0, "removed_uncommitted": 1, "kept": 2}
    assert {tuple(r) for r in
            read_current(spark, target, state_path=state).collect()} == before


def test_current_watermark_skips_none_entries(tmp_path):
    """A compaction entry can commit ``watermark: None`` (nothing
    migrated yet). Later real watermarks must not TypeError against it —
    that wedged every subsequent pass permanently."""
    import json as _json
    import os as _os

    state = str(tmp_path / "state")
    _os.makedirs(state)

    def put(run_id, watermark, **extra):
        with open(_os.path.join(state, f"run-{run_id:08d}.json"), "w") as fh:
            _json.dump({"run_id": run_id, "watermark": watermark,
                        "committed": True, **extra}, fh)

    put(0, None, compaction=True)
    assert current_watermark(state) == (None, 1)  # only-None: still None
    put(1, 42)
    put(2, None, compaction=True)
    assert current_watermark(state) == (42, 3)  # max skips the Nones


def test_read_current_committed_vs_uncommitted(spark, derby_cdc, tmp_path):
    """With ``state_path`` the view is READ COMMITTED: a run dir with no
    ledger entry (crashed pass) is invisible. Without it the documented
    read-uncommitted view scans every dir on disk."""
    url, write = derby_cdc
    store_url, target, state = _paths(tmp_path)
    source = _src(url).load(spark)
    migrate_increment(spark, source, store_url=store_url, target_path=target,
                      state_path=state, cursor_col="seq")

    # fabricate a dirty run dir: pointer-shaped rows, no ledger entry
    spark.createDataFrame(
        [("id-dirty", "uncommitted", 999, 7, False)],
        "order_id string, description string, cursor long, "
        "run_id int, is_deleted boolean",
    ).write.parquet(f"{target}/pointers/run=7")

    committed = {r["order_id"] for r in
                 read_current(spark, target, state_path=state).collect()}
    assert "id-dirty" not in committed and len(committed) == 10
    uncommitted = {r["order_id"] for r in read_current(spark, target).collect()}
    assert "id-dirty" in uncommitted


def test_compaction_noop_when_nothing_committed(spark, tmp_path):
    """Pointer dirs from crashed passes only (empty ledger): compaction
    must not consolidate or delete anything — the increments belong to
    retries that will rewrite them."""
    import os as _os

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.incremental_migration import (
        compact_pointer_runs,
    )

    target = str(tmp_path / "target")
    state = str(tmp_path / "state")
    spark.createDataFrame(
        [("id-x", "crashed", 1, 0, False)],
        "order_id string, description string, cursor long, "
        "run_id int, is_deleted boolean",
    ).write.parquet(f"{target}/pointers/run=0")

    entry = compact_pointer_runs(spark, target, state)
    assert entry["committed"] is False and entry["n_rows"] == 0
    assert _os.path.isdir(f"{target}/pointers/run=0")  # untouched


def test_watermark_filter_prunes_source_scan(spark, derby_cdc, tmp_path):
    """The staged increment is exactly the rows past the watermark — the
    RDBMS never ships old rows (row-count proof on top of the plan
    assertion above)."""
    url, write = derby_cdc
    store_url, target, state = _paths(tmp_path)
    source = _src(url).load(spark)
    migrate_increment(spark, source, store_url=store_url, target_path=target,
                      state_path=state, cursor_col="seq")
    write([(99, "id-099", "late", b"z" * 10)])
    e = migrate_increment(spark, source, store_url=store_url, target_path=target,
                          state_path=state, cursor_col="seq")
    assert e["n_rows"] == 1
    staged = spark.read.parquet(f"{target}/staging/run=1")
    assert [r["seq"] for r in staged.collect()] == [99]


def test_read_as_of_time_travel(spark, derby_cdc, tmp_path):
    """Version reads over the ledger: as-of run 0 reproduces the
    post-backfill view after later passes shadow it; bad versions raise
    typed errors; compaction moves the travel horizon forward and the
    compacted run stays a valid (lineage-preserving) travel point."""
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.incremental_migration import (
        CompactionHorizonError,
        compact_pointer_runs,
        read_as_of,
    )

    url, write = derby_cdc
    store_url, target, state = _paths(tmp_path)
    source = _src(url).load(spark)

    migrate_increment(spark, source, store_url=store_url, target_path=target,
                      state_path=state, cursor_col="seq")
    v0 = {r["order_id"]: (r["description"], r["cursor"])
          for r in read_current(spark, target, state_path=state).collect()}

    write([(16, "id-005", "desc 5 UPDATED", b"\x05" * 99)])
    migrate_increment(spark, source, store_url=store_url, target_path=target,
                      state_path=state, cursor_col="seq")

    # current view moved; as-of run 0 still returns the backfill state
    cur = {r["order_id"]: (r["description"], r["cursor"])
           for r in read_current(spark, target, state_path=state).collect()}
    asof0 = {r["order_id"]: (r["description"], r["cursor"])
             for r in read_as_of(spark, target, 0, state_path=state).collect()}
    assert cur["id-005"] == ("desc 5 UPDATED", 16)
    assert asof0 == v0 and asof0["id-005"] == ("desc 5", 5)
    # as-of the latest run == read_current
    asof1 = {r["order_id"]: (r["description"], r["cursor"])
             for r in read_as_of(spark, target, 1, state_path=state).collect()}
    assert asof1 == cur

    # not-a-version and ledger-less reads are caller bugs, not empty views
    with pytest.raises(ValueError):
        read_as_of(spark, target, 7, state_path=state)
    with pytest.raises(ValueError):
        read_as_of(spark, target, 0)

    # compaction sweeps history: run 0/1 become unreconstructible, the
    # compacted run is the new horizon and equals the live view
    ce = compact_pointer_runs(spark, target, state)
    with pytest.raises(CompactionHorizonError):
        read_as_of(spark, target, 0, state_path=state)
    asofc = {r["order_id"]: (r["description"], r["cursor"])
             for r in read_as_of(spark, target, ce["run_id"],
                                 state_path=state).collect()}
    assert asofc == cur
