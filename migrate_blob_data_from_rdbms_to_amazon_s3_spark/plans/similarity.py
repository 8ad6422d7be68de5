"""Similarity search over embedding columns (`array<float>`, dim 64).

Three operators:

- brute-force cosine top-k — the exactness baseline: broadcast the query
  vector, one narrow projection computes the score, TakeOrdered top-k.
  At 100 TB this is a single pass, no shuffle except the final k-merge.
- IVF top-k — the scale path: a coarse quantizer (deterministic seed
  centroids here; k-means in production) assigns every vector to a
  cluster; queries search only their cluster's inverted list. Assignment
  is a broadcast cross-score + argmax window; at 1000 executors the probe
  touches 1/n_clusters of the data.
- embedding near-dup pairs — label-blocked pair join with cosine above a
  threshold (the "semantic dedup" primitive).

All arithmetic is double-precision JVM-side (`zip_with`/`aggregate`
higher-order functions — no UDF, no Python). Scores are rounded to 6
decimals in both engines *before* any ordering/thresholding so the
cross-engine float summation ulp never flips a comparison.
"""

from __future__ import annotations

from pyspark.sql import functions as F

NEARDUP_COSINE = 0.45
N_CENTROIDS = 8  # seed centroids = vec_id < 8 (deterministic stand-in for k-means)

# cosine(a, b) with double accumulation, as a Spark SQL expression
def _cos_spark(a: str, b: str) -> str:
    dot = f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
    na = f"sqrt(aggregate({a}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    nb = f"sqrt(aggregate({b}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
    return f"round({dot} / ({na} * {nb}), 6)"


def _cos_duck(a: str, b: str) -> str:
    dot = f"list_sum(list_transform(generate_series(1, 64), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
    na = f"sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"
    nb = f"sqrt(list_sum(list_transform({b}, x -> x::DOUBLE * x::DOUBLE)))"
    return f"ROUND({dot} / ({na} * {nb}), 6)"


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def q_ann_bruteforce(spark, sf_dir):
    """Exact cosine top-10 neighbors of vec_id 0. Broadcast the 1-row query
    side; Catalyst plans BroadcastNestedLoopJoin + TakeOrdered."""
    emb = _emb(spark, sf_dir)
    query = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(query)
        .select("vec_id", F.expr(_cos_spark("embedding", "qv")).alias("score"))
        .orderBy(F.desc("score"), "vec_id")
        .limit(10)
    )


def q_ann_ivf(spark, sf_dir):
    """IVF probe: assign all vectors to their nearest seed centroid
    (argmax cosine, centroid-id tiebreak), then search the query's cluster
    only. Returns that cluster's top-5 for the vec_id-0 query."""
    emb = _emb(spark, sf_dir)
    cents = F.broadcast(
        emb.filter(F.col("vec_id") < N_CENTROIDS).select(
            F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("cv")
        )
    )
    scored = emb.crossJoin(cents).select(
        "vec_id",
        "embedding",
        "centroid_id",
        F.expr(_cos_spark("embedding", "cv")).alias("c_score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("vec_id").orderBy(F.desc("c_score"), "centroid_id")
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", F.col("centroid_id").alias("cluster"))
    )
    # vec 0 is itself centroid 0 → its cluster is centroid 0's cluster
    query = F.broadcast(
        assigned.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv"), F.col("cluster").alias("q_cluster")
        )
    )
    return (
        assigned.crossJoin(query)
        .filter((F.col("cluster") == F.col("q_cluster")) & (F.col("vec_id") != 0))
        .select(
            "vec_id",
            "cluster",
            F.expr(_cos_spark("embedding", "qv")).alias("score"),
        )
        .orderBy(F.desc("score"), "vec_id")
        .limit(5)
    )


def q_neardup_embedding(spark, sf_dir):
    """Semantic near-dup pairs: label-blocked pair join, cosine >= 0.45.
    At scale the block key becomes an LSH bucket (random-hyperplane signs)
    so the join never goes quadratic."""
    emb = _emb(spark, sf_dir)
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), "label"
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), "label"
    )
    return (
        a.join(b, "label")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "label",
            "vec_a",
            "vec_b",
            F.expr(_cos_spark("ea", "eb")).alias("score"),
        )
        .filter(F.col("score") >= NEARDUP_COSINE)
    )


QUERIES = {
    "ann_bruteforce_topk": q_ann_bruteforce,
    "ann_ivf_topk": q_ann_ivf,
    "neardup_embedding": q_neardup_embedding,
}

ORACLES = {
    "ann_bruteforce_topk": f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, {_cos_duck('embedding', 'qv')} AS score
        FROM embeddings, q
        WHERE vec_id != 0
        ORDER BY score DESC, vec_id
        LIMIT 10
    """,
    "ann_ivf_topk": f"""
        WITH cents AS (
            SELECT vec_id AS centroid_id, embedding AS cv
            FROM embeddings WHERE vec_id < {N_CENTROIDS}
        ),
        scored AS (
            SELECT e.vec_id, e.embedding, c.centroid_id,
                   {_cos_duck('e.embedding', 'c.cv')} AS c_score
            FROM embeddings e, cents c
        ),
        assigned AS (
            SELECT vec_id, embedding, centroid_id AS cluster
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY vec_id ORDER BY c_score DESC, centroid_id) AS rn
                FROM scored
            ) WHERE rn = 1
        ),
        q AS (SELECT embedding AS qv, cluster AS q_cluster FROM assigned WHERE vec_id = 0)
        SELECT a.vec_id, a.cluster, {_cos_duck('a.embedding', 'q.qv')} AS score
        FROM assigned a, q
        WHERE a.cluster = q.q_cluster AND a.vec_id != 0
        ORDER BY score DESC, a.vec_id
        LIMIT 5
    """,
    "neardup_embedding": f"""
        SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
               {_cos_duck('a.embedding', 'b.embedding')} AS score
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        WHERE {_cos_duck('a.embedding', 'b.embedding')} >= {NEARDUP_COSINE}
    """,
}
