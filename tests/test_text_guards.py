"""Positive cases for the repetition filter and PII scrubber (the fixture
corpus has no PII and fairly uniform repetition, so the interesting
behavior is proven here on constructed rows)."""

import hashlib

import pyarrow as pa
import pyarrow.parquet as pq

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans import text as TX


def _write_docs(tmp_path, rows):
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["test"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_pii_scrub_redacts_and_counts(spark, tmp_path):
    dirty = "contact bob@example.com or sue@test.org call 555-123 4567 now"
    clean = "plain text with no contact info at all"
    sf = _write_docs(tmp_path, [(1, dirty), (2, clean)])
    rows = {r.doc_id: r for r in TX.q_pii_scrub(spark, sf).collect()}
    assert rows[1].n_emails == 2
    assert rows[1].n_phones == 1
    assert rows[2].n_emails == 0 and rows[2].n_phones == 0

    expected = "contact <EMAIL> or <EMAIL> call <PHONE> now"
    assert rows[1].scrubbed_md5 == hashlib.md5(expected.encode()).hexdigest()
    assert rows[2].scrubbed_md5 == hashlib.md5(clean.encode()).hexdigest()


def test_repetition_filter_flags_spam(spark, tmp_path):
    spam = "buy now " * 30  # one bigram dominates, tokens all duplicates
    prose = "the quick brown fox jumps over a lazy dog near the old river bank"
    sf = _write_docs(tmp_path, [(1, spam.strip()), (2, prose)])
    rows = {r.doc_id: r for r in TX.q_repetition_filter(spark, sf).collect()}
    assert rows[1].dup_token_frac > 0.9
    assert rows[1].top_bigram_frac > 0.4
    assert rows[1].passes_repetition is False
    assert rows[2].dup_token_frac < 0.2
    assert rows[2].top_bigram_frac < 0.1
    assert rows[2].passes_repetition is True


def test_quantize_error_bound(spark, sf_dir):
    """Int8 quantization invariant: with a symmetric scale = max|x|/127,
    no element clamps, so every reconstruction error is <= scale/2 — up
    to the 1e-6 output rounding (both scale and err round to 6 decimals,
    so the reported bound can be off by half a quantum on each side)."""
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.similarity import (
        q_embedding_quantize,
    )
    import pyspark.sql.functions as F

    q = q_embedding_quantize(spark, sf_dir)
    bad = q.filter(
        (F.col("scale") > 0) & (F.col("max_abs_err") > F.col("scale") / 2 + 1e-6)
    )
    assert bad.count() == 0
    assert q.count() > 0


def test_pack_sequences_conserves_tokens(spark, sf_dir):
    """Packing invariant: window token fills sum to exactly the corpus
    token mass per (lang, shard) — nothing dropped, nothing duplicated."""
    import pyspark.sql.functions as F

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.text import (
        PACK_SHARDS,
        q_pack_sequences,
    )

    packed = q_pack_sequences(spark, sf_dir)
    got = {
        (r.lang, r.shard_id): r.total
        for r in packed.groupBy("lang", "shard_id")
        .agg(F.sum("n_tokens").alias("total"))
        .collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = {
        (r.lang, r.shard_id): r.total
        for r in docs.select(
            "lang",
            (F.col("doc_id") % PACK_SHARDS).alias("shard_id"),
            F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_toks"),
        )
        .groupBy("lang", "shard_id")
        .agg(F.sum("n_toks").alias("total"))
        .collect()
    }
    assert got == want
