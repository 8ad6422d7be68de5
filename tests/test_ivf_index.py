"""Persisted IVF index (operators/ivf_index): train-once/probe-many
equivalence, frozen-codebook append, and the partition-pruned cell scan.

The contract under test: a standing IVF index probed from Parquet gives
EXACTLY the rows the in-plan probe computes; appending against the
frozen codebook lands each new vector in the same cell a from-scratch
assignment would pick; and a probe's physical plan reads only the
probed cells' partitions (PartitionFilters), because at 100 TB the
pruned scan IS the feature."""

from __future__ import annotations

from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.ivf_index import (
    append_ivf_index,
    build_ivf_index,
    cell_fill_audit,
    ivf_topk_persisted,
    load_cells,
    load_centroids,
    probe_clusters,
    read_meta,
)
from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans import similarity as S


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_persisted_probe_equals_in_plan(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "ivf")
    meta = build_ivf_index(emb, path)
    assert meta["n_vectors"] == emb.count()
    assert meta["k"] == S._derived_k(emb.count())
    for nprobe in (1, S.IVF_NPROBE):
        in_plan = S._ivf_probe(spark, sf_dir, nprobe=nprobe)
        query = emb.filter(F.col("vec_id") == 0)
        persisted = ivf_topk_persisted(
            spark, path, query, nprobe=nprobe, k_top=5, exclude_vec_id=0
        )
        assert _rows(persisted) == _rows(in_plan)


def test_probe_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path)
    query = emb.filter(F.col("vec_id") == 0)
    probes = probe_clusters(spark, path, query, nprobe=S.IVF_NPROBE)
    assert len(probes) == S.IVF_NPROBE
    plan = (
        ivf_topk_persisted(spark, path, query, nprobe=S.IVF_NPROBE, exclude_vec_id=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the cells scan carries the literal cluster-in-probes partition filter
    assert "PartitionFilters" in plan
    assert any(f"cluster#" in seg and "IN" in seg.upper()
               for seg in plan.split("PartitionFilters")[1:2]) or "cluster" in (
        plan.split("PartitionFilters")[1].split("]")[0]
    )
    # and the pruned read touches only the probed cells
    pruned = load_cells(spark, path).filter(F.col("cluster").isin(*probes))
    all_cells = load_cells(spark, path)
    assert 0 < pruned.count() < all_cells.count()


def test_batch_probe_equals_per_query_probes(spark, sf_dir, tmp_path):
    """The one-call batch probe returns, per query, exactly the rows a
    per-query ivf_topk_persisted loop returns — the batch join changes
    the plan (one pruned scan + cluster join), never the results."""
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.ivf_index import (
        ivf_knn_batch_persisted,
    )

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path)
    batch_ids = [0, 97, 194]
    batch = emb.filter(F.col("vec_id").isin(batch_ids))
    got = ivf_knn_batch_persisted(
        spark, path, batch, nprobe=S.IVF_NPROBE, k_top=3
    )
    by_query = {
        q: sorted(
            (r["vec_id"], r["cluster"], r["score"])
            for r in got.filter(F.col("q_vec_id") == q).collect()
        )
        for q in batch_ids
    }
    for q in batch_ids:
        solo = ivf_topk_persisted(
            spark,
            path,
            emb.filter(F.col("vec_id") == q),
            nprobe=S.IVF_NPROBE,
            k_top=3,
            exclude_vec_id=q,
        )
        assert by_query[q] == sorted(
            (r["vec_id"], r["cluster"], r["score"]) for r in solo.collect()
        )


def test_batch_probe_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    """The batch's cell scan carries the literal union-of-probes
    partition filter — the whole batch touches only its cells' files."""
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.ivf_index import (
        ivf_knn_batch_persisted,
    )

    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path)
    batch = emb.filter(F.col("vec_id") % 97 == 0)
    plan = (
        ivf_knn_batch_persisted(spark, path, batch, nprobe=S.IVF_NPROBE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    assert "cluster" in plan.split("PartitionFilters")[1].split("]")[0]


def test_append_matches_from_scratch_assignment(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    n = emb.count()
    cut = n // 2
    path = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") < cut), path)
    cents_before = load_centroids(spark, path)
    meta = append_ivf_index(spark, emb.filter(F.col("vec_id") >= cut), path)
    assert meta["n_vectors"] == n
    assert meta["gens"] == 2
    # codebook untouched by the append
    assert load_centroids(spark, path) == cents_before
    # every appended row landed where a from-scratch assignment puts it
    scratch = S._assign_df(emb, cents_before).select(
        "vec_id", F.col("cluster").alias("want")
    )
    cells = load_cells(spark, path)
    mismatch = cells.join(scratch, "vec_id").filter(
        ~F.col("cluster").eqNullSafe(F.col("want"))
    )
    assert mismatch.count() == 0
    # generation stamps split at the cut
    gens = {
        (r["gen"], r["base"]): r["n"]
        for r in cells.groupBy("gen", (F.col("vec_id") < cut).alias("base"))
        .agg(F.count("*").alias("n"))
        .select("gen", "base", "n")
        .collect()
    }
    assert set(gens) == {(0, True), (1, False)}
    audit = {r["cluster"]: (r["n_base"], r["n_appended"], r["n_total"])
             for r in cell_fill_audit(spark, path).collect()}
    assert sum(b for b, _, _ in audit.values()) == cut
    assert sum(a for _, a, _ in audit.values()) == n - cut


def test_appended_probe_equals_full_rebuild_probe(spark, sf_dir, tmp_path):
    """Probing the appended index == probing a full index FORCED to the
    same codebook size and trained on the same prefix — i.e. the append
    path changes nothing about probe semantics."""
    emb = _emb(spark, sf_dir)
    cut = emb.count() // 2
    base = emb.filter(F.col("vec_id") < cut)
    rest = emb.filter(F.col("vec_id") >= cut)
    p_app = str(tmp_path / "appended")
    build_ivf_index(base, p_app)
    append_ivf_index(spark, rest, p_app)
    query = emb.filter(F.col("vec_id") == 0)
    got = ivf_topk_persisted(
        spark, p_app, query, nprobe=S.IVF_NPROBE, k_top=5, exclude_vec_id=0
    )
    # reference: same frozen codebook, whole corpus assigned in one pass
    cents = load_centroids(spark, p_app)
    assigned = S._assign_df(emb, cents)
    probes = probe_clusters(spark, p_app, query, nprobe=S.IVF_NPROBE)
    q = F.broadcast(query.select(F.col("embedding").alias("qv")))
    want = (
        assigned.filter(F.col("cluster").isin(*probes) & (F.col("vec_id") != 0))
        .crossJoin(q)
        .select("vec_id", "cluster", F.expr(S._cos_spark("embedding", "qv")).alias("score"))
        .orderBy(F.desc("score"), "vec_id")
        .limit(5)
    )
    assert _rows(got) == _rows(want)


def test_freshness_audit_drives_the_next_operation(spark, sf_dir, tmp_path):
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.ivf_index import (
        freshness_audit,
    )

    emb = _emb(spark, sf_dir)
    n = emb.count()
    cut = n // 2
    path = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") < cut), path)
    # stale: the second half is missing -> append is the indicated move
    a = freshness_audit(spark, emb, path)
    assert a == {"n_indexed": cut, "n_live": n, "n_missing": n - cut,
                 "n_orphaned": 0, "stale": True}
    append_ivf_index(spark, emb.filter(F.col("vec_id") >= cut), path)
    assert freshness_audit(spark, emb, path)["stale"] is False
    # corpus shrank -> orphaned rows flag a rebuild
    b = freshness_audit(spark, emb.filter(F.col("vec_id") % 3 != 0), path)
    assert b["n_missing"] == 0 and b["n_orphaned"] > 0 and b["stale"]


def test_empty_corpus_degrades_typed(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir).filter(F.lit(False))
    path = str(tmp_path / "ivf")
    meta = build_ivf_index(emb, path)
    assert meta["n_vectors"] == 0 and meta["k"] == 0
    assert read_meta(spark, path)["n_vectors"] == 0
    assert load_cells(spark, path).count() == 0
    out = ivf_topk_persisted(spark, path, emb, nprobe=2)
    assert out.count() == 0
    assert [f.name for f in out.schema] == ["vec_id", "cluster", "score"]
