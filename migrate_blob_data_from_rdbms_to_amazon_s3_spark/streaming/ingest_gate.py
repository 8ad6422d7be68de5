"""Streaming ingest gates over the standing indexes: as records ARRIVE,
probe-then-append per micro-batch — ``ivf_ingest_gate`` for embeddings
over the IVF index, ``text_ingest_gate`` for documents over the
MinHash-LSH text index (operators/text_index).

The batch operators already split the lifecycle — build once
(operators/ivf_index.build_ivf_index), probe a batch in one pass
(ivf_knn_batch_persisted), append without retraining (append_ivf_index).
This module composes them under Structured Streaming's foreachBatch so a
live feed of new embeddings is continuously gated: every arriving vector
gets its top-k neighbor evidence from the corpus ingested BEFORE it
(the admission / near-dup signal), then joins the index for the vectors
that arrive after it.

Replay discipline (foreachBatch batches can re-run after a crash):

- **Probe results are replay-stable.** The neighbor search excludes the
  ENTIRE incoming batch by id (``exclude_ids``), not just each query's
  self — so even if a crashed attempt already appended part of the
  batch, the re-probe sees exactly the pre-batch corpus and returns the
  same rows. Without this, a replay would find batch members as each
  other's neighbors and diverge from the first attempt.
- **Results land idempotently** via the batch_id-partitioned dynamic-
  overwrite sink (streaming/sinks.write_idempotent_parquet's pattern):
  a replay overwrites its own partition byte-for-byte.
- **The append is dedup-guarded**: only vectors the index does not
  already hold are appended (id anti-join — the freshness_audit
  n_missing discipline), so a replayed append converges instead of
  duplicating rows. Parquet job commit keeps half-appends invisible
  (task outputs surface only at job commit), so the guard sees either
  none or all of a prior attempt's rows.

At scale each micro-batch pays: one map-side cell ranking of the batch,
one partition-pruned scan of the union of probed cells, one cluster
join + per-query top-k over candidate rows, one id anti-join against
the cells' id column, and one partitioned append of just the batch —
never a Lloyd round, never a scan of the full corpus rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.ivf_index import (
    append_ivf_index,
    ivf_knn_batch_persisted,
    load_cells,
)


def ivf_ingest_gate(
    stream: DataFrame,
    index_path: str,
    results_path: str,
    nprobe: int = 1,
    k_top: int = 3,
):
    """Start an availableNow foreachBatch drain of ``stream`` (vec_id,
    embedding) through the gate; returns the streaming query (caller
    awaits termination). Per micro-batch, in order:

    1. pin the batch (``localCheckpoint`` — the probe and the append
       must see the same rows even though each action re-plans);
    2. probe the standing index at ``index_path``, excluding the whole
       batch's ids (replay-stability, module docstring);
    3. write the neighbor evidence to ``results_path/batch_id=<id>``
       with dynamic partition overwrite (idempotent replay);
    4. append the vectors the index doesn't already hold against the
       frozen codebook.
    """

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select("vec_id", "embedding").localCheckpoint(eager=True)
        if not batch.take(1):
            return
        probes = ivf_knn_batch_persisted(
            spark,
            index_path,
            batch,
            nprobe=nprobe,
            k_top=k_top,
            exclude_ids=batch.select("vec_id"),
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                probes.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(results_path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        missing = batch.join(
            load_cells(spark, index_path).select("vec_id"), "vec_id", "left_anti"
        ).localCheckpoint(eager=True)
        if missing.take(1):
            append_ivf_index(spark, missing, index_path)

    return (
        stream.writeStream.foreachBatch(gate)
        .queryName("ivf_ingest_gate")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{results_path}__checkpoint")
        .start()
    )


def text_ingest_gate(stream: DataFrame, index_path: str, results_path: str):
    """The text-side gate: an availableNow foreachBatch drain of
    ``stream`` (doc_id, text) through the standing MinHash-LSH index
    (operators/text_index). Per micro-batch, in order:

    1. pin the batch (``localCheckpoint``);
    2. probe the standing index for near-dup evidence against the
       corpus ingested BEFORE this batch, excluding the whole batch's
       ids from the registry side (replay-stability: a crashed
       attempt's partial append can't make batch members each other's
       registry neighbors — membership is restored by the anti-join;
       the fill-count boundary is documented on ingest_text_persisted);
    3. write (batch_doc, registry_doc, est_jaccard) to
       ``results_path/batch_id=<id>`` with dynamic partition overwrite
       (idempotent replay);
    4. append only the docs the index does not already hold
       (signature-id anti-join — a replayed append converges).

    Each micro-batch pays batch-sized signing, one equi-join against
    the stored pre-capped bands, and one append that re-signs only the
    batch — never a registry re-scan."""
    from ..operators.text_index import (
        append_text_index,
        ingest_text_persisted,
        load_signatures,
    )

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.select("doc_id", "text").localCheckpoint(eager=True)
        if not batch.take(1):
            return
        probes = ingest_text_persisted(
            spark, batch, index_path, exclude_ids=batch.select("doc_id")
        )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                probes.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(results_path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        missing = batch.join(
            load_signatures(spark, index_path).select("doc_id"), "doc_id", "left_anti"
        ).localCheckpoint(eager=True)
        if missing.take(1):
            append_text_index(spark, missing, index_path)

    return (
        stream.writeStream.foreachBatch(gate)
        .queryName("text_ingest_gate")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{results_path}__checkpoint")
        .start()
    )
