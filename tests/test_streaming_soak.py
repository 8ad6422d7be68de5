"""RocksDB state-store soak: prove streaming-dedup state stays BOUNDED
across many drain cycles (watermark eviction working), not just that one
drain's values are right. The value oracles in test_streaming prove
semantics; this proves the state-lifecycle claim the docstrings make —
state holds the watermark horizon, independent of total stream length —
under the production state-store provider (RocksDB), not the default
in-memory HDFS-backed one."""

import datetime as dt

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.streaming.events import (
    EVENTS_SCHEMA,
    dedup_stream,
    read_event_stream,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
CYCLES = 6
EVENTS_PER_CYCLE = 200


def test_rocksdb_dedup_soak_state_stays_bounded(spark, tmp_path):
    src = str(tmp_path / "soak_src")
    ckpt = str(tmp_path / "soak_ckpt")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        state_rows = []
        seen_ids = set()
        for cycle in range(CYCLES):
            # each cycle is one hour later: far past the 10-min watermark,
            # so every prior cycle's keys must be evicted by this batch.
            # 10% of each cycle's rows are in-cycle duplicates the dedup
            # must drop.
            base = dt.datetime(2026, 1, 1, 0, 0, 0) + dt.timedelta(hours=cycle)
            rows = [
                (
                    cycle * 100000 + i,
                    base + dt.timedelta(seconds=i),
                    i % 50,
                    "view",
                    1.0,
                    "{}",
                )
                for i in range(EVENTS_PER_CYCLE)
            ]
            dupes = rows[:: EVENTS_PER_CYCLE // 20]
            df = spark.createDataFrame(rows + dupes, EVENTS_SCHEMA)
            df.coalesce(1).write.mode("append").parquet(src)

            dd = dedup_stream(read_event_stream(spark, src, files_per_trigger=None))
            cycle_rows = []

            def sink(batch_df, batch_id, _acc=cycle_rows):
                _acc.extend(batch_df.select("event_id").collect())

            q = (
                dd.writeStream.foreachBatch(sink)
                .queryName(f"soak_{cycle}")
                .outputMode("append")
                .trigger(availableNow=True)
                .option("checkpointLocation", ckpt)
                .start()
            )
            q.awaitTermination()
            for p in q.recentProgress:
                for op in p.get("stateOperators") or []:
                    if op.get("numRowsTotal") is not None:
                        state_rows.append(op["numRowsTotal"])
                        # proof the RocksDB provider is actually engaged
                        assert any(
                            k.startswith("rocksdb")
                            for k in (op.get("customMetrics") or {})
                        ), op
            ids = [r.event_id for r in cycle_rows]
            assert len(ids) == len(set(ids)), "in-cycle duplicate leaked"
            assert not seen_ids.intersection(ids)
            seen_ids.update(ids)

        # every unique event exactly once across the whole soak
        assert len(seen_ids) == CYCLES * EVENTS_PER_CYCLE
        # bounded state: if eviction were broken, state would accumulate all
        # cycles (~1200 keys by the end). It must never exceed ~2 cycles.
        assert state_rows, "no state metrics captured"
        assert max(state_rows) <= 2 * EVENTS_PER_CYCLE, state_rows
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
