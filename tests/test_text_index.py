"""Persisted MinHash-LSH text index: probe parity with the in-plan
twins, incremental append == rebuild, and crash detection."""

from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators import text_index as TI
from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans import dedup


def _pairs(df, a, b):
    return {(r[a], r[b]): r.est_jaccard for r in df.collect()}


def test_persisted_neardup_matches_in_plan(spark, sf_dir, tmp_path):
    path = str(tmp_path / "idx")
    TI.build_text_index(dedup._docs(spark, sf_dir), path)
    got = _pairs(TI.neardup_text_persisted(spark, path), "doc_a", "doc_b")
    want = _pairs(dedup.q_dedup_minhash_lsh(spark, sf_dir), "doc_a", "doc_b")
    assert got == want and len(got) > 0


def test_persisted_ingest_matches_in_plan(spark, sf_dir, tmp_path):
    docs = dedup._docs(spark, sf_dir)
    path = str(tmp_path / "idx")
    TI.build_text_index(docs.filter(F.col("doc_id") % 3 != 0), path)
    got = _pairs(
        TI.ingest_text_persisted(spark, docs.filter(F.col("doc_id") % 3 == 0), path),
        "batch_doc",
        "registry_doc",
    )
    want = _pairs(
        dedup.q_dedup_incremental_lsh(spark, sf_dir), "batch_doc", "registry_doc"
    )
    assert got == want and len(got) > 0


def test_append_equals_rebuild(spark, sf_dir, tmp_path):
    """Index built on slice A then appended with slice B must probe
    identically to an index built from scratch on A ∪ B — signatures,
    band fills (the cap input), and the pair results."""
    docs = dedup._docs(spark, sf_dir)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 != 0)

    inc = str(tmp_path / "inc")
    TI.build_text_index(a, inc)
    before = TI.read_meta(spark, inc)["n_docs"]
    res = TI.append_text_index(spark, b, inc)
    assert res["n_docs"] == before + res["n_added"]
    assert TI.freshness_audit(spark, inc)["consistent"]

    full = str(tmp_path / "full")
    TI.build_text_index(docs, full)
    got = _pairs(TI.neardup_text_persisted(spark, inc), "doc_a", "doc_b")
    want = _pairs(TI.neardup_text_persisted(spark, full), "doc_a", "doc_b")
    assert got == want and len(got) > 0


def test_freshness_audit_detects_crashed_append(spark, sf_dir, tmp_path):
    """Signatures appended without the meta commit (a crash between the
    two writes) must flip the audit to inconsistent."""
    docs = dedup._docs(spark, sf_dir)
    path = str(tmp_path / "idx")
    TI.build_text_index(docs.filter(F.col("doc_id") < 50), path)
    assert TI.freshness_audit(spark, path)["consistent"]
    TI._sigs_from_docs(
        docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 60))
    ).write.mode("append").parquet(f"{path}/signatures")
    audit = TI.freshness_audit(spark, path)
    assert not audit["consistent"]
    assert audit["n_docs_stored"] > audit["n_docs_meta"]
