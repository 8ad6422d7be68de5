"""Streaming sinks beyond the memory harness: an idempotent
foreachBatch Parquet sink — the production pattern for exactly-once
file output from a micro-batch stream.

Structured Streaming guarantees foreachBatch is called with a
monotonically increasing ``batch_id``, but a batch can be REPLAYED after
a crash (same id, same data). The sink below makes the write idempotent
by routing each batch to a ``batch_id=<id>`` subdirectory written with
dynamic partition overwrite: a replay overwrites its own partition
byte-for-byte instead of appending duplicates. That (checkpoint +
idempotent sink) is the exactly-once recipe the Spark docs prescribe for
file targets the built-in file sink can't express (e.g. per-batch
compaction or side-effects).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_idempotent_parquet(result: DataFrame, path: str, name: str):
    """Start an availableNow foreachBatch drain into ``path``,
    partitioned by batch_id with dynamic overwrite. Returns the query
    (caller awaits termination).

    Exactly-once holds when a replay REUSES the checkpoint (same
    batch_id -> same rows, so dynamic overwrite replaces each partition
    byte-for-byte). A restart with a FRESH checkpoint renumbers batches
    from 0 and may slice files differently — dynamic overwrite only
    replaces partitions present in the new write, so partitions from the
    previous run with higher batch_ids would survive as duplicates. To
    keep the fresh-checkpoint path correct too, any pre-existing
    ``batch_id=*`` partitions are cleared before a drain that starts
    without a checkpoint."""
    import glob as _glob
    import os
    import shutil

    local_ckpt = f"{path}__checkpoint".removeprefix("file:")
    local_path = path.removeprefix("file:")
    if not os.path.exists(local_ckpt):
        for part in _glob.glob(os.path.join(local_path, "batch_id=*")):
            shutil.rmtree(part, ignore_errors=True)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (
        result.writeStream.foreachBatch(sink)
        .queryName(name)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{path}__checkpoint")
        .start()
    )
