"""Pandas-UDF kernels agree with the JVM built-in implementations."""

from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.functions.pandas_kernels import (
    cosine_to,
    quality_logit,
)


def test_pandas_cosine_matches_builtin(spark, sf_dir):
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.similarity import _cos_spark

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    both = (
        emb.crossJoin(query)
        .select(
            "vec_id",
            cosine_to("embedding", "qv").alias("udf_score"),
            F.expr(_cos_spark("embedding", "qv")).alias("builtin_score"),
        )
        .collect()
    )
    assert len(both) > 0
    # builtin folds sequentially, BLAS sums pairwise: agree to float-sum
    # tolerance (builtin_score is additionally rounded to 6 decimals)
    for r in both:
        assert abs(r.udf_score - r.builtin_score) < 5e-6, r.vec_id


def test_quality_logit_bounds(spark, sf_dir):
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.text import q_quality_score

    scored = q_quality_score(spark, sf_dir).select(
        quality_logit("n_tokens", "stopword_ratio", "alpha_ratio").alias("p")
    )
    stats = scored.agg(F.min("p"), F.max("p")).collect()[0]
    assert 0.0 <= stats[0] <= stats[1] <= 1.0
