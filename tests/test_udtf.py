"""Python UDTF: lateral tokenize matches the built-in generator twin."""

from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.functions.udtfs import tokenize_udtf


def test_tokenize_udtf_matches_builtin(spark, sf_dir):
    spark.udtf.register("tokenize", tokenize_udtf())
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    docs.createOrReplaceTempView("docs_u")

    got = spark.sql(
        "SELECT d.doc_id, t.pos, t.token FROM docs_u d, LATERAL tokenize(d.text) t"
    )
    want = docs.select(
        "doc_id", F.posexplode(F.split("text", r"\s+")).alias("pos", "token")
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
