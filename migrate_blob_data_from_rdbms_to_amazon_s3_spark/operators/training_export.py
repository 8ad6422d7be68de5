"""Deterministic global shuffle + sharded training export.

The last stage of a training-data pipeline: deliver the cleaned corpus
as N balanced shards whose assignment AND within-shard order are fully
deterministic — reproducible across runs, engines, and cluster sizes —
so a training run (and its resume) always sees the same example stream.
The reference has no analog (its export is the per-row blob
externalization of lambda_fns/order_rdbms_blob.js:447-523); this is the
§7 LLM-pipeline extension, same family as plans/quality.q_dataset_split.

Why not ``DataFrame.randomSplit``/``rand()``: Spark's RNG is seeded per
partition, so the SAME seed yields a DIFFERENT shuffle when the input
partitioning changes (a re-read with different file splits reassigns
every row). The coin here is a pure function of the document key:

    coin  = first 8 hex chars of md5(salt || id)  → uniform in [0, 2^32)
    shard = coin % n_shards
    order = (coin, id) ascending within the shard

which decorrelates the output order from ingest order (the "global
shuffle" a dataloader needs so adjacent training examples aren't
adjacent source rows) without any RNG state. The md5-derived coin is
the one hash that must cross engines (the DuckDB oracle of the
``training_shard_manifest`` registry twin recomputes it bit-for-bit —
the md5-vs-xxhash rule in plans/similarity).

Scale shape (the plan you'd want at 100 TB):

- ONE hash shuffle, keyed by the shard id. The coin is uniform, so the
  shards — and the shuffle's reducers — are balanced by construction;
  no skew, no salting needed.
- ``sortWithinPartitions`` is task-local (SortExec without an exchange):
  the within-shard order costs no extra shuffle.
- one output dir per shard (``partitionBy``) so a dataloader addresses
  shards by path; ``max_records_per_file`` bounds file sizes so a shard
  is many right-sized parquet files, not one 6 TB file.
- the returned manifest re-reads WHAT WAS WRITTEN (read-after-write
  audit, the blob_pipeline discipline): per-shard doc counts, token
  mass, and a coin-sum fingerprint that any engine can recompute to
  verify shard integrity without comparing row-by-row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHARD_SALT = "shard-"
# default shard count for the registry twin (training_shard_manifest) —
# shared verbatim with its DuckDB oracle. Real exports size n_shards to
# the corpus (e.g. total_bytes / target_shard_bytes).
TRAIN_SHARDS = 16


def shard_coin(id_col: str, salt: str = SHARD_SALT) -> Column:
    """Uniform deterministic coin in [0, 2^32): the first 8 md5 hex chars
    of (salt || id). 8 chars (32 bits) keeps the BIGINT cast overflow-free
    under ANSI mode; the DuckDB twin is
    ``CAST('0x' || substr(md5(salt || CAST(id AS VARCHAR)), 1, 8) AS BIGINT)``."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")


def with_shard(
    df: DataFrame, n_shards: int, id_col: str = "doc_id", salt: str = SHARD_SALT
) -> DataFrame:
    """Append the (coin, shard) assignment columns. Pure projection — no
    shuffle; every downstream consumer shares one definition of the coin."""
    return df.withColumn("coin", shard_coin(id_col, salt)).withColumn(
        "shard", (F.col("coin") % F.lit(n_shards)).cast("int")
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    token_col: Column | None = None,
    salt: str = SHARD_SALT,
) -> DataFrame:
    """Per-shard audit: (shard, n_docs[, n_tokens], coin_fingerprint,
    min_coin, max_coin). The fingerprint is the BIGINT sum of the coins —
    order-free, exactly recomputable by any engine from the keys alone,
    so two manifests agree iff the shards hold the same key sets. One
    combiner-friendly shuffle to the shard grain (≤ n_shards rows out)."""
    sharded = with_shard(df, n_shards, id_col, salt)
    aggs = [F.count("*").alias("n_docs")]
    if token_col is not None:
        aggs.append(F.sum(token_col).alias("n_tokens"))
    aggs += [
        F.sum("coin").alias("coin_fingerprint"),
        F.min("coin").alias("min_coin"),
        F.max("coin").alias("max_coin"),
    ]
    return sharded.groupBy("shard").agg(*aggs)


def export_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = SHARD_SALT,
    max_records_per_file: int = 0,
) -> DataFrame:
    """Write the deterministically shuffled corpus as ``{path}/shard=<k>``
    parquet dirs and return the read-after-write manifest.

    One repartition on the shard id (the only exchange), a task-local
    sort to (shard, coin, id) for the reproducible within-shard order,
    and a partitioned write. Overwrite mode: re-running the export after
    a crash replaces the same dirs — idempotent, like the pointer runs
    of operators/incremental_migration. ``max_records_per_file`` (0 =
    unlimited) caps parquet file sizes for dataloader-friendly shards.

    The returned manifest is computed from the files just written, not
    from the input plan — it audits what a consumer will actually read."""
    sharded = with_shard(df, n_shards, id_col, salt)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "coin", id_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .parquet(path)
    )
    written = df.sparkSession.read.parquet(path)
    return _written_manifest(written)


def _written_manifest(written: DataFrame) -> DataFrame:
    return written.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("coin").alias("coin_fingerprint"),
        F.min("coin").alias("min_coin"),
        F.max("coin").alias("max_coin"),
    )


def append_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = SHARD_SALT,
    max_records_per_file: int = 0,
) -> DataFrame:
    """Incremental shard delivery: new documents land in their STABLE
    shard — the coin is a pure function of the key, so an append never
    reassigns or rewrites an existing row, and the per-shard
    coin-fingerprints compose additively (old + batch = new, which the
    caller can verify against two manifests without reading data rows).

    ``n_shards`` and ``salt`` must match the original export (the shard
    function IS the layout contract); the caller owns dedup discipline,
    like append_ivf_index — re-appending a key duplicates it. Ordering
    contract under append: within-FILE coin order still holds (each
    ingest generation's files are internally sorted), but the shard's
    cross-generation total order is per-generation — a dataloader that
    shuffles file lists (the standard practice) is unaffected.

    Same plan as the export: one shard-keyed exchange over JUST the
    batch, task-local sort, partitioned append."""
    sharded = with_shard(df, n_shards, id_col, salt)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "coin", id_col)
        .write.mode("append")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .parquet(path)
    )
    return _written_manifest(df.sparkSession.read.parquet(path))
