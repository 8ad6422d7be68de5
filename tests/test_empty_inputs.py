"""Empty-input robustness: core operators must return empty (not crash)
on zero-row tables — the degenerate case every 100 TB pipeline
eventually feeds them (an empty partition, a filter that matches
nothing)."""

from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators import (
    bridge,
    lookup,
    mutation,
    pagination,
)

SCHEMA = "order_id string, description string, s3_prefix string"


def _empty(spark):
    return spark.createDataFrame([], SCHEMA)


def test_pagination_on_empty(spark):
    df = _empty(spark)
    assert pagination.count_rows(df, "order_id").collect()[0][0] == 0
    lim, off = pagination.clamp_page_params("3", "100", total=0)
    assert (lim, off) == (3, 0)
    assert pagination.page(df, "order_id", lim, off).count() == 0
    assert pagination.keyset_page(df, "order_id", 5, after="x").count() == 0


def test_mutation_on_empty(spark):
    empty = _empty(spark)
    row = spark.createDataFrame([("a", "d", "p")], SCHEMA)
    assert mutation.insert_rows(empty, row, "order_id").count() == 1
    assert mutation.update_rows(empty, row, "order_id").count() == 0
    assert mutation.delete_rows(empty, row, "order_id").count() == 0
    assert mutation.upsert_rows(empty, row, "order_id").count() == 1
    # and the mirror: mutating WITH empty inputs is identity
    assert mutation.insert_rows(row, empty, "order_id").count() == 1
    assert mutation.delete_rows(row, empty, "order_id").count() == 1


def test_lookup_and_bridge_on_empty(spark):
    empty = _empty(spark)
    assert lookup.point_lookup(empty, "order_id", "zz").count() == 0
    row = spark.createDataFrame([("a", "d", "p")], SCHEMA)
    merged = bridge.bridge_coalesce(empty, row, "order_id")
    assert merged.count() == 1  # legacy-only row survives the coalesce
    assert bridge.bridge_coalesce(row, empty, "order_id").count() == 1


def test_dedup_on_empty_documents(spark, tmp_path):
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.dedup import (
        q_dedup_exact,
        q_dedup_ngram_jaccard,
    )

    sf = f"file:{tmp_path}"
    spark.createDataFrame([], "doc_id long, text string, lang string").write.parquet(
        f"{sf}/documents.parquet"
    )
    assert q_dedup_exact(spark, sf).count() == 0
    assert q_dedup_ngram_jaccard(spark, sf).count() == 0


def test_round2_ops_on_empty_documents(spark, tmp_path):
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.contamination import (
        q_decontaminate_ngram,
        q_ngram_topk,
    )
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.text import (
        q_pack_sequences,
        q_pii_scrub,
        q_repetition_filter,
    )

    sf = f"file:{tmp_path}"
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    assert q_decontaminate_ngram(spark, sf).count() == 0
    assert q_ngram_topk(spark, sf).count() == 0
    assert q_repetition_filter(spark, sf).count() == 0
    assert q_pii_scrub(spark, sf).count() == 0
    assert q_pack_sequences(spark, sf).count() == 0


def test_quantize_on_empty_embeddings(spark, tmp_path):
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.similarity import (
        q_embedding_quantize,
        q_neardup_embedding,
    )

    sf = f"file:{tmp_path}"
    spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label long"
    ).write.parquet(f"{sf}/embeddings.parquet")
    assert q_embedding_quantize(spark, sf).count() == 0
    assert q_neardup_embedding(spark, sf).count() == 0


def test_corpus_and_similarity_ops_on_empty_tables(spark, tmp_path):
    """Every dedup/text/corpus/similarity query returns empty — not a
    crash — on zero-row documents/embeddings tables. (The trainable ops,
    kmeans/IVF, are excluded: a quantizer cannot fit on an empty corpus
    and raising there is correct.)"""
    import __spark_entry__ as E

    sf = str(tmp_path)
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")
    qs = E.queries()
    for name in [
        "dedup_exact",
        "dedup_incremental",
        "dedup_ngram_jaccard",
        "dedup_containment",
        "dedup_minhash_lsh",
        "simhash",
        "tfidf_cosine_pairs",
        "unigram_logprob_score",
        "quality_percentile_filter",
        "stratified_sample",
        "source_quota",
        "text_token_count",
        "text_quality_score",
        "embedding_outliers",
        "ann_bruteforce_topk",
        "ann_hyperplane_lsh",
        "neardup_embedding",
        "embedding_quantize_int8",
    ]:
        assert qs[name](spark, sf).count() == 0, name


def test_registry_queries_survive_empty_fixtures(spark, sf_dir, tmp_path):
    """Representative registry queries must run (not crash) against an
    EMPTY copy of the fixture tables — the shape of a filter that matches
    nothing or an empty ingest batch. Iterative operators that seed from
    a collected row (coreset/kmeans) document a non-empty contract and
    are deliberately absent."""
    import __spark_entry__ as E

    empty_dir = str(tmp_path / "sf_empty")
    import os

    os.makedirs(empty_dir)
    for t in [
        "orders", "lineitem", "customer", "supplier", "part", "nation",
        "region", "events", "documents", "embeddings",
    ]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(0).write.parquet(
            f"{empty_dir}/{t}.parquet"
        )

    qs = E.queries()
    survivors = [
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_threshold_sweep",
        "bm25_topk",
        "text_token_count",
        "quality_classifier_filter",
        "lsh_candidate_stats",
        "lsh_width_sweep",
        "knn_join",
        "events_sessionize",
        "q1_pricing_summary",
        "grouped_linreg",
        "order_backlog_peaks",
        "graph_triangles",
        "kcore_membership",
        "decontaminate_substring",
    ]
    for name in survivors:
        rows = qs[name](spark, empty_dir).collect()  # must not raise
        assert isinstance(rows, list), name
