"""Keyed-mutation read-after-write tests (SURVEY §5: read-your-write,
delete-then-read-empty, idempotent delete; §7 M3 join-rewrite layer)."""

import pytest
from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators import mutation as M


@pytest.fixture()
def base(spark):
    return spark.createDataFrame(
        [("a", "one", "p1"), ("b", "two", "p2"), ("c", "three", "p3")],
        "order_id string, description string, s3_prefix string",
    )


def test_insert_skips_existing_keys(spark, base):
    new = spark.createDataFrame(
        [("b", "DUP", "x"), ("d", "four", "p4")],
        "order_id string, description string, s3_prefix string",
    )
    out = M.insert_rows(base, new, "order_id")
    got = {r.order_id: r.description for r in out.collect()}
    assert got == {"a": "one", "b": "two", "c": "three", "d": "four"}  # b kept, not DUP


def test_update_only_matching(spark, base):
    upd = spark.createDataFrame(
        [("b", "TWO!")], "order_id string, description string"
    )
    out = M.update_rows(base, upd, "order_id")
    got = {r.order_id: (r.description, r.s3_prefix) for r in out.collect()}
    assert got["b"] == ("TWO!", "p2")      # untouched column survives
    assert got["a"] == ("one", "p1")


def test_delete_and_idempotency(spark, base):
    keys = spark.createDataFrame([("b",), ("zz",)], "order_id string")
    out = M.delete_rows(base, keys, "order_id")
    assert sorted(r.order_id for r in out.collect()) == ["a", "c"]
    # deleting again (key already absent) is a no-op — order.test.js:433-445
    again = M.delete_rows(out, keys, "order_id")
    assert sorted(r.order_id for r in again.collect()) == ["a", "c"]


def test_upsert(spark, base):
    batch = spark.createDataFrame(
        [("c", "THREE!", "px"), ("e", "five", "p5")],
        "order_id string, description string, s3_prefix string",
    )
    out = M.upsert_rows(base, batch, "order_id")
    got = {r.order_id: r.description for r in out.collect()}
    assert got == {"a": "one", "b": "two", "c": "THREE!", "e": "five"}


def test_rewrite_swaps_atomically(spark, base, tmp_path):
    path = str(tmp_path / "t.parquet")
    base.write.parquet(path)
    mutated = M.delete_rows(
        spark.read.parquet(path),
        spark.createDataFrame([("a",)], "order_id string"),
        "order_id",
    )
    M.rewrite(mutated, path)
    back = spark.read.parquet(path)
    assert sorted(r.order_id for r in back.collect()) == ["b", "c"]


def test_rewrite_restores_original_on_failed_swap(spark, base, tmp_path, monkeypatch):
    """If the move-in fails mid-swap, the original table must survive
    (rename-aside, not delete-first)."""
    import shutil

    path = str(tmp_path / "t.parquet")
    base.write.parquet(path)

    def boom(src, dst):
        raise OSError("simulated cross-device failure")

    monkeypatch.setattr(shutil, "move", boom)
    with pytest.raises(OSError):
        M.rewrite(base.limit(1), path)
    monkeypatch.undo()
    back = spark.read.parquet(path)
    assert sorted(r.order_id for r in back.collect()) == ["a", "b", "c"]


def test_concurrent_rewrites_serialize_not_corrupt(spark, base, tmp_path):
    """Two rewrites of the same path racing each other must SERIALIZE on
    the lease file (VERDICT r4 item 7): both complete, the final table is
    exactly one writer's complete output (never a mix / never absent),
    and no stray temp or aside dirs survive."""
    import threading

    path = str(tmp_path / "t.parquet")
    base.write.parquet(path)
    upd_b = spark.createDataFrame([("b", "B!")], "order_id string, description string")
    upd_c = spark.createDataFrame([("c", "C!")], "order_id string, description string")
    errs = []

    def writer(upd):
        try:
            # each writer mutates the ORIGINAL snapshot (read before either
            # swap), so last-wins output is exactly one writer's full table
            M.rewrite(M.update_rows(base, upd, "order_id"), path)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(u,)) for u in (upd_b, upd_c)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    got = {r.order_id: r.description for r in spark.read.parquet(path).collect()}
    assert got in (
        {"a": "one", "b": "B!", "c": "three"},
        {"a": "one", "b": "two", "c": "C!"},
    ), got
    leftovers = [p.name for p in tmp_path.iterdir() if p.name != "t.parquet"]
    assert leftovers == [], leftovers


def test_writer_lock_times_out_loud(tmp_path):
    """A writer that cannot get the lease within the timeout fails with
    WriterLockTimeout — it never proceeds unserialized."""
    import pytest as _pytest

    path = str(tmp_path / "t.parquet")
    with M._writer_lock(path):
        with _pytest.raises(M.WriterLockTimeout):
            with M._writer_lock(path, timeout_s=0.3):
                pass


def test_writer_lock_ignores_crashed_writers_lockfile(tmp_path):
    """A crashed writer's leftover lock FILE never blocks: exclusion is
    the kernel flock, which dies with the holder's process — no TTL wait,
    no staleness heuristic (round-7 flock redesign, ADVICE r6). Covers
    both an ancient orphan and a RECENT one (the old mtime-TTL design
    made the latter block all writers for up to an hour)."""
    import os
    import time

    path = str(tmp_path / "t.parquet")
    lock = f"{path}.__lock"
    for age in (7200, 1):  # ancient orphan, then fresh orphan
        with open(lock, "w") as f:
            f.write("999999 0\n")
        old = time.time() - age
        os.utime(lock, (old, old))
        with M._writer_lock(path, timeout_s=1.0):
            pass  # acquired immediately: nobody holds the flock
        assert not os.path.exists(lock)


def test_writer_lock_release_handoff(tmp_path):
    """A waiter blocked on the holder's fd acquires cleanly after release
    (inode-verify path: the holder unlinks under its flock, so the waiter
    must detect the orphan inode and reopen the fresh file)."""
    import os
    import threading

    path = str(tmp_path / "t.parquet")
    order = []
    a_entered = threading.Event()
    release_a = threading.Event()

    def holder():
        with M._writer_lock(path):
            order.append("a-in")
            a_entered.set()
            release_a.wait(5.0)
            order.append("a-out")  # inside the lock: strict ordering vs b-in

    def waiter():
        a_entered.wait(5.0)
        with M._writer_lock(path, timeout_s=5.0):
            order.append("b-in")

    ta, tb = threading.Thread(target=holder), threading.Thread(target=waiter)
    ta.start()
    tb.start()
    a_entered.wait(5.0)
    release_a.set()
    ta.join(10.0)
    tb.join(10.0)
    assert order == ["a-in", "a-out", "b-in"], order
    assert not os.path.exists(f"{path}.__lock")


def test_partition_scoped_rewrite_leaves_untouched_partitions(spark, tmp_path):
    """A keyed update must rewrite only the partitions holding touched keys;
    every other partition's files stay byte-identical (mtime + content) —
    the 100 TB contract (docstring of rewrite_partitions; order.js:205-208
    read-after-write honored on the touched row)."""
    import os

    path = str(tmp_path / "orders_part")
    rows = [(f"k{i}", f"d{i}", f"seg{i % 4}") for i in range(40)]
    df = spark.createDataFrame(rows, "order_id string, description string, segment string")
    df.write.partitionBy("segment").parquet(path)

    def file_state(part):
        d = os.path.join(path, f"segment={part}")
        return {
            f: (os.path.getmtime(os.path.join(d, f)), os.path.getsize(os.path.join(d, f)))
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        }

    before = {p: file_state(p) for p in ("seg0", "seg1", "seg2", "seg3")}

    existing = spark.read.parquet(path)
    # touch only keys living in seg1 (k1, k5 → i % 4 == 1)
    upd = spark.createDataFrame(
        [("k1", "UPDATED"), ("k5", "UPDATED")], "order_id string, description string"
    )
    mutated = M.update_rows(existing, upd, "order_id")
    touched = upd.select("order_id")
    M.rewrite_partitions(existing, mutated, path, "segment", touched)

    after = {p: file_state(p) for p in ("seg0", "seg1", "seg2", "seg3")}
    for p in ("seg0", "seg2", "seg3"):
        assert after[p] == before[p], f"partition {p} was rewritten"
    assert after["seg1"] != before["seg1"]

    back = spark.read.parquet(path)
    got = {r.order_id: r.description for r in back.collect()}
    assert got["k1"] == "UPDATED" and got["k5"] == "UPDATED"
    assert got["k0"] == "d0" and len(got) == 40


def test_read_after_write_contract(spark, base, tmp_path):
    """POST then GET returns the row (order.js:205-208)."""
    path = str(tmp_path / "t.parquet")
    base.write.parquet(path)
    new = spark.createDataFrame([("n1", "fresh", "p")],
                                "order_id string, description string, s3_prefix string")
    M.rewrite(M.insert_rows(spark.read.parquet(path), new, "order_id"), path)
    got = spark.read.parquet(path).filter(F.col("order_id") == "n1").collect()
    assert len(got) == 1 and got[0].description == "fresh"


def test_recover_restores_renamed_aside_table(spark, tmp_path):
    """Simulated crash between rename-aside and move-in: recover() puts
    the aside copy back, sweeps STALE temp dirs, and leaves a recent
    (possibly in-flight) temp dir alone."""
    import os

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.mutation import (
        recover,
    )

    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    df.write.parquet(path)
    # simulate the crash window: table renamed aside, one stale partial tmp
    # (backdated an hour) and one fresh tmp that could be a live writer
    os.rename(path, f"{path}.__old_deadbeef")
    os.makedirs(f"{path}.__tmp_cafe")
    old = os.path.getmtime(f"{path}.__tmp_cafe") - 3600
    os.utime(f"{path}.__tmp_cafe", (old, old))
    os.makedirs(f"{path}.__tmp_live")
    assert recover(path) is True
    assert sorted(r.k for r in spark.read.parquet(path).collect()) == [1, 2]
    assert not os.path.exists(f"{path}.__tmp_cafe")
    assert os.path.exists(f"{path}.__tmp_live")  # recent => not swept
    os.rmdir(f"{path}.__tmp_live")
    # idempotent: nothing to do on a healthy table
    assert recover(path) is False


# --- CAS writer lease (r12, VERDICT r11 item 7) -----------------------------


class _FakeCasStore:
    """In-memory object store with TRUE CAS semantics: every primitive is
    atomic under one lock, etag = monotone generation counter — the
    semantics S3's conditional puts guarantee, minus the network."""

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._objs: dict[str, tuple[bytes, str]] = {}
        self._gen = 0

    def _next(self) -> str:
        self._gen += 1
        return f"g{self._gen}"

    def get_with_etag(self, key):
        with self._lock:
            return self._objs.get(key)

    def put_if_absent(self, key, payload):
        with self._lock:
            if key in self._objs:
                return None
            etag = self._next()
            self._objs[key] = (bytes(payload), etag)
            return etag

    def put_if_match(self, key, payload, etag):
        with self._lock:
            cur = self._objs.get(key)
            if cur is None or cur[1] != etag:
                return None
            new = self._next()
            self._objs[key] = (bytes(payload), new)
            return new


def test_cas_lease_mutual_exclusion_threads():
    """Eight threads hammer one lease: the critical section must never
    overlap and every thread must eventually get through."""
    import threading

    store = _FakeCasStore()
    inside, maxin, done = [0], [0], [0]
    guard = threading.Lock()
    errs = []

    def worker():
        try:
            with M.CasWriterLease(store, "tbl.lease", timeout_s=30.0):
                with guard:
                    inside[0] += 1
                    maxin[0] = max(maxin[0], inside[0])
                import time

                time.sleep(0.01)
                with guard:
                    inside[0] -= 1
                    done[0] += 1
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=worker) for _ in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    assert maxin[0] == 1 and done[0] == 8


def test_cas_lease_expiry_takeover_single_winner_and_safe_late_release():
    """A crashed (never-releasing) holder expires; racing waiters produce
    EXACTLY one takeover winner (the etag pins the generation), the old
    holder's late release cannot clobber the new holder, and its renew
    raises LeaseLost."""
    import threading

    store = _FakeCasStore()
    crashed = M.CasWriterLease(store, "t.lease", timeout_s=5.0, ttl_s=0.05)
    crashed.__enter__()  # never exits: simulated crash

    import time

    time.sleep(0.08)  # wait out the TTL
    wins = []

    def waiter():
        lease = M.CasWriterLease(store, "t.lease", timeout_s=5.0, ttl_s=30.0)
        with lease:
            wins.append(lease._etag)
            time.sleep(0.05)

    ts = [threading.Thread(target=waiter) for _ in range(4)]
    for t in ts:
        t.start()
    # while a new holder is live: the crashed holder's release must fail
    # silently (stale etag) and leave the new generation in place
    time.sleep(0.02)
    before = store.get_with_etag("t.lease")
    crashed.__exit__(None, None, None)
    with pytest.raises(M.LeaseLost):
        crashed2 = M.CasWriterLease(store, "t.lease", timeout_s=1.0, ttl_s=0.05)
        crashed2._etag = "g0"  # a stale generation
        crashed2.renew()
    for t in ts:
        t.join()
    assert len(wins) == 4 and len(set(wins)) == 4  # all eventually held
    after_crashed_release = store.get_with_etag("t.lease")
    assert after_crashed_release is not None  # never deleted mid-protocol
    assert before is not None


def test_cas_lease_times_out_loud():
    store = _FakeCasStore()
    with M.CasWriterLease(store, "x.lease", ttl_s=60.0):
        with pytest.raises(M.WriterLockTimeout):
            with M.CasWriterLease(store, "x.lease", timeout_s=0.3, ttl_s=60.0):
                pass  # pragma: no cover


def test_cas_lease_released_tombstone_reacquired_fast():
    store = _FakeCasStore()
    with M.CasWriterLease(store, "y.lease", ttl_s=60.0):
        pass
    import json

    data, _ = store.get_with_etag("y.lease")
    assert json.loads(data)["state"] == "released"
    # a released lease is immediately acquirable (no TTL wait)
    import time

    t0 = time.monotonic()
    with M.CasWriterLease(store, "y.lease", ttl_s=60.0):
        pass
    assert time.monotonic() - t0 < 1.0


def test_localfs_store_cas_primitives(tmp_path):
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.sources.object_store import (
        LocalFSObjectStore,
    )

    s = LocalFSObjectStore(str(tmp_path))
    assert s.get_with_etag("k") is None
    e1 = s.put_if_absent("k", b"v1")
    assert e1 is not None
    assert s.put_if_absent("k", b"v2") is None  # create-only
    assert s.get_with_etag("k") == (b"v1", e1)
    assert s.put_if_match("k", b"v2", "wrong") is None
    e2 = s.put_if_match("k", b"v2", e1)
    assert e2 is not None and s.get("k") == b"v2"
    assert s.put_if_match("missing", b"x", e2) is None


def test_concurrent_rewrites_serialize_with_cas_lease(spark, base, tmp_path):
    """The r11 'done' bar: the rewrite concurrency contract holds with
    the CAS lease swapped in behind the same seam (fake store with real
    CAS semantics; flock never involved)."""
    import threading

    store = _FakeCasStore()
    path = str(tmp_path / "t.parquet")
    base.write.parquet(path)
    upd_b = spark.createDataFrame([("b", "B!")], "order_id string, description string")
    upd_c = spark.createDataFrame([("c", "C!")], "order_id string, description string")
    errs = []

    def writer(upd):
        try:
            M.rewrite(
                M.update_rows(base, upd, "order_id"),
                path,
                lease=M.CasWriterLease(store, "t.parquet.lease", timeout_s=60.0),
            )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=writer, args=(u,)) for u in (upd_b, upd_c)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    got = {r.order_id: r.description for r in spark.read.parquet(path).collect()}
    assert got in (
        {"a": "one", "b": "B!", "c": "three"},
        {"a": "one", "b": "two", "c": "C!"},
    ), got
    leftovers = [p.name for p in tmp_path.iterdir() if p.name != "t.parquet"]
    assert leftovers == [], leftovers
