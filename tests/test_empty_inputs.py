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


# --- full-registry empty-fixture sweep (round 7, VERDICT r6 item 6) --------
#
# EVERY registry query runs against an empty copy of all ten fixture
# tables, or carries an explicit exemption with the reason. Two earlier
# partial sweeps each caught a real division-by-zero crash — the shape of
# a filter matching nothing must never be a crash at 100 TB.

import pytest

import __spark_entry__ as E

# No exemptions: the trainable/seeded operators (kmeans, coreset, IVF)
# now degrade to typed-empty output when the seed collect returns zero
# rows (`_assign_expr`/`_probe_clusters_expr` emit typed nulls, coreset
# returns an empty frame), so ALL 219 registry queries run the sweep.
_EMPTY_EXEMPT: dict[str, str] = {}

_ALL_QUERIES = sorted(E.queries())


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    """Empty twin of every fixture table, written once per module."""
    d = str(tmp_path_factory.mktemp("sf_empty"))
    for t in [
        "orders", "lineitem", "customer", "supplier", "part", "nation",
        "region", "events", "documents", "embeddings",
    ]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(0).write.parquet(
            f"{d}/{t}.parquet"
        )
    return d


@pytest.mark.parametrize("name", _ALL_QUERIES)
def test_registry_query_survives_empty_fixtures(spark, empty_sf_dir, name):
    if name in _EMPTY_EXEMPT:
        pytest.skip(f"exempt: {_EMPTY_EXEMPT[name]}")
    rows = E.queries()[name](spark, empty_sf_dir).collect()  # must not raise
    assert isinstance(rows, list), name
