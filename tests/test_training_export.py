"""Deterministic global shuffle + sharded training export
(operators/training_export).

Contracts under test:
- the coin is a pure function of the key: assignment and within-shard
  order are identical across runs AND across input partitionings (the
  property rand()/randomSplit does not have);
- export writes one ``shard=<k>`` dir per shard, round-trips every row
  exactly once, and bounds file sizes via max_records_per_file;
- within each written file rows are coin-ascending (the reproducible
  example stream a dataloader resume relies on);
- the read-after-write manifest equals the pure-plan manifest
  (shard_manifest) — what was written is what was planned;
- shards are balanced (uniform coin), and the export plan has exactly
  ONE exchange (the shard repartition; the sort is task-local).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.training_export import (
    TRAIN_SHARDS,
    export_training_shards,
    shard_manifest,
    with_shard,
)

N_DOCS = 500


def _docs(spark, n=N_DOCS):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text of doc "), F.col("id")).alias("text"),
    )


def test_assignment_is_partitioning_invariant(spark):
    one = with_shard(_docs(spark).coalesce(1), 8).select("doc_id", "shard", "coin")
    many = with_shard(_docs(spark).repartition(13), 8).select(
        "doc_id", "shard", "coin"
    )
    assert {tuple(r) for r in one.collect()} == {tuple(r) for r in many.collect()}


def test_export_round_trips_and_orders_within_files(spark, tmp_path):
    out = f"{tmp_path}/shards"
    manifest = export_training_shards(
        _docs(spark), out, n_shards=8, max_records_per_file=20
    )
    rows = {r["shard"]: r for r in manifest.collect()}
    assert sorted(rows) == list(range(8))
    assert sum(r["n_docs"] for r in rows.values()) == N_DOCS

    written = spark.read.parquet(out)
    assert written.count() == N_DOCS
    assert written.select("doc_id").distinct().count() == N_DOCS
    # every shard dir exists; max_records_per_file bounds each file
    for k in range(8):
        d = f"{tmp_path}/shards/shard={k}"
        assert os.path.isdir(d)
        for fn in os.listdir(d):
            if fn.endswith(".parquet"):
                n = spark.read.parquet(os.path.join(d, fn)).count()
                assert n <= 20
                # within-file order is coin-ascending (then doc_id):
                coins = [
                    r["coin"]
                    for r in spark.read.parquet(os.path.join(d, fn))
                    .select("coin")
                    .collect()
                ]
                assert coins == sorted(coins)

    # shard assignment on disk matches the coin contract
    bad = written.filter(
        (F.col("coin") % 8).cast("int") != F.col("shard").cast("int")
    )
    assert bad.count() == 0


def test_export_is_deterministic_across_runs(spark, tmp_path):
    a = f"{tmp_path}/a"
    b = f"{tmp_path}/b"
    export_training_shards(_docs(spark), a, n_shards=4)
    export_training_shards(_docs(spark).repartition(17), b, n_shards=4)

    def shard_contents(path):
        df = spark.read.parquet(path)
        return {
            (r["shard"], r["doc_id"], r["coin"]) for r in df.collect()
        }

    assert shard_contents(a) == shard_contents(b)


def test_written_manifest_equals_planned_manifest(spark, tmp_path):
    out = f"{tmp_path}/shards"
    written = export_training_shards(_docs(spark), out, n_shards=8)
    planned = shard_manifest(_docs(spark), 8).drop("n_tokens")
    w = {r["shard"]: (r["n_docs"], r["coin_fingerprint"], r["min_coin"], r["max_coin"])
         for r in written.collect()}
    p = {r["shard"]: (r["n_docs"], r["coin_fingerprint"], r["min_coin"], r["max_coin"])
         for r in planned.collect()}
    assert w == p


def test_shards_balanced_by_uniform_coin(spark, tmp_path):
    counts = [
        r["n_docs"]
        for r in shard_manifest(_docs(spark, 2000), TRAIN_SHARDS).collect()
    ]
    assert len(counts) == TRAIN_SHARDS
    mean = 2000 / TRAIN_SHARDS
    # binomial(2000, 1/16): mean 125, sd ~10.8 — 4 sd bounds
    assert max(counts) < mean + 4 * 11 and min(counts) > mean - 4 * 11


def test_append_lands_in_stable_shards_without_touching_old_files(spark, tmp_path):
    """Appending a batch adds rows only to the batch's own shards, never
    rewrites an existing file, and the fingerprints compose additively."""
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.training_export import (
        append_training_shards,
    )

    out = f"{tmp_path}/shards"
    base = _docs(spark, 300)
    batch = _docs(spark, 400).filter(F.col("doc_id") >= 300)
    m0 = {r["shard"]: r for r in export_training_shards(base, out, 8).collect()}

    def files(path):
        out_files = {}
        for k in range(8):
            d = f"{path}/shard={k}"
            out_files[k] = sorted(
                (fn, os.path.getmtime(os.path.join(d, fn)))
                for fn in os.listdir(d)
                if fn.endswith(".parquet")
            )
        return out_files

    f0 = files(out)
    m1 = {r["shard"]: r for r in append_training_shards(batch, out, 8).collect()}
    f1 = files(out)

    # old files untouched (same names, same mtimes) — append only adds
    for k in range(8):
        assert set(f0[k]) <= set(f1[k])

    # fingerprints compose: new = old + batch (computed independently)
    mb = {r["shard"]: r for r in shard_manifest(batch, 8).collect()}
    for k in range(8):
        assert m1[k]["n_docs"] == m0[k]["n_docs"] + mb.get(k, {"n_docs": 0})["n_docs"]
        assert m1[k]["coin_fingerprint"] == (
            m0[k]["coin_fingerprint"]
            + (mb[k]["coin_fingerprint"] if k in mb else 0)
        )

    # union round-trip, and batch rows sit in exactly the stable shard
    written = spark.read.parquet(out)
    assert written.count() == 400
    assert written.filter(
        (F.col("coin") % 8).cast("int") != F.col("shard").cast("int")
    ).count() == 0


def test_export_plan_has_single_exchange(spark):
    sharded = with_shard(_docs(spark), 8)
    plan = (
        sharded.repartition(8, F.col("shard"))
        .sortWithinPartitions("shard", "coin", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # the shard repartition only
    assert "Sort" in plan  # task-local sort, no second exchange
