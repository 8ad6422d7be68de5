"""Hybrid retrieval: lexical + dense rankings fused or cascaded.

The two architectures every modern retrieval / RAG / training-data
curation stack runs over a corpus at scale:

- **Reciprocal Rank Fusion** (Cormack, Clarke & Buettcher, SIGIR 2009):
  run K independent rankers, score each hit ``sum_r 1/(RRF_K + rank_r)``,
  merge. Robust to score-scale mismatch because it only consumes ranks.
- **Retrieve-then-rerank**: a cheap high-recall lexical pool (BM25), then
  an exact dense rerank of the bounded pool — the standard two-stage
  cascade (e.g. Nogueira & Cho 2019's BM25→neural reranker shape, with
  the dense stage here being exact cosine instead of a model forward).

Both are *query-by-example on document 0*: the lexical query terms are
doc 0's highest-tf tokens and the dense query vector is embedding 0
(``vec_id`` and ``doc_id`` share the id space in the fixtures), so the
whole pipeline is data-derived and deterministic on any corpus with no
out-of-band query input.

Scale shape (100 TB): every corpus-wide stage is token-grain or
row-grain aggregation feeding a ``TakeOrdered`` top-POOL — no global
sort, no pair join. The fusion / rerank stages run over POOL-bounded
frames (<= RRF_POOL rows after the limits), so their windows and outer
join are constant-size work regardless of corpus size. Per-(doc, term)
BM25 partials quantize to integer micros before the per-doc sum
(long addition is associative; rounded doubles are not) exactly like
``text.q_bm25_topk``, and the RRF contribution ``1e6/(K + rank)`` is
rounded to integer micros per list before summing, so the fused score
is bit-identical across engines.

Reference analog: none (LLM-pipeline extension per BASELINE.json §7);
the BM25 scoring semantics are shared with ``plans/text.py``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .similarity import _cos_duck, _cos_spark, _emb
from .text import BM25_B, BM25_K1, _docs_with_toks

RRF_K = 60          # the SIGIR'09 paper's constant
RRF_QTERMS = 8      # query = doc 0's QTERMS highest-tf tokens (deterministic)
RRF_POOL = 50       # per-ranker candidate pool
RRF_TOPK = 20
RERANK_POOL = 30    # lexical pool handed to the dense reranker
RERANK_TOPK = 10


def _bm25_scored(spark, sf_dir):
    """(doc_id, micros) per (doc != 0, query-term) hit: BM25 partials in
    integer micros against doc 0's top-tf query terms. Token/df/dl
    semantics mirror ``text.q_bm25_topk`` verbatim; only the query-term
    derivation differs (doc 0's tf instead of corpus df).

    Pass discipline (first cut cost 6× bm25_topk at sf0.1 — it rebuilt
    the corpus-wide token aggregation for each of its four consumers):
    the query terms come from a scan of DOCUMENT 0 ALONE (PK filter
    pushed to the source — deriving an 8-term query never justifies a
    corpus aggregation), then ONE corpus token pass builds the
    query-term-restricted tf table (broadcast semi-join BEFORE the
    groupBy, so the aggregation state is query-hits only), checkpointed
    at that restricted grain — df and per-doc scoring both read it.
    Plus the one-row stats scan: two corpus passes total."""
    d = _docs_with_toks(spark, sf_dir)
    d0 = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") == 0)
        .withColumn("toks", F.split(F.trim("text"), r"\s+"))
    )
    qterms = (
        d0.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.desc("tf"), "tok")
        .limit(RRF_QTERMS)
        .select("tok")
    )
    toks = d.select(
        "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("tok")
    )
    tf_q = (
        toks.join(F.broadcast(qterms), "tok")
        .groupBy("doc_id", "dl", "tok")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dft = tf_q.groupBy("tok").agg(F.count("*").alias("df"))
    stats = d.agg(
        F.count("*").alias("n_docs"), F.sum(F.size("toks")).alias("sum_dl")
    )
    return (
        tf_q.filter(F.col("doc_id") != 0)
        .join(F.broadcast(dft), "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.expr(
                f"CAST(ROUND(ln(1 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) * "
                f"(tf / (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * "
                f"dl / (CAST(sum_dl AS DOUBLE) / n_docs)))) * 1000000) AS BIGINT)"
            ).alias("micros"),
        )
    )


# Shared DuckDB CTE block: bm25-per-doc against doc 0's query terms.
# Mirrors _bm25_scored; ends with `lex(doc_id, lex_micros)`.
_BM25_LEX_CTES = rf"""
        d AS (
            SELECT doc_id,
                   list_filter(string_split_regex(trim(text), '\s+'),
                               t -> t != '') AS toks
            FROM documents
        ),
        tokrows AS (
            SELECT doc_id, len(toks) AS dl, u.tok
            FROM d, LATERAL (SELECT UNNEST(toks) AS tok) u
        ),
        tf AS (
            SELECT doc_id, dl, tok, COUNT(*) AS tf
            FROM tokrows GROUP BY 1, 2, 3
        ),
        qterms AS (
            SELECT tok FROM tf WHERE doc_id = 0
            ORDER BY tf DESC, tok LIMIT {RRF_QTERMS}
        ),
        dft AS (
            SELECT tok, COUNT(*) AS df FROM tf
            WHERE tok IN (SELECT tok FROM qterms) GROUP BY tok
        ),
        stats AS (
            SELECT COUNT(*) AS n_docs, SUM(len(toks)) AS sum_dl FROM d
        ),
        scored AS (
            SELECT tf.doc_id,
                   CAST(ROUND(ln(1 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) *
                        (tf / (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} *
                         dl / (CAST(sum_dl AS DOUBLE) / n_docs)))) * 1000000)
                        AS BIGINT) AS micros
            FROM tf JOIN dft USING (tok), stats
            WHERE tf.doc_id != 0
        ),
        lex AS (
            SELECT doc_id, SUM(micros) AS lex_micros
            FROM scored GROUP BY doc_id
        )
"""


def q_hybrid_rrf_fusion(spark, sf_dir):
    """Reciprocal Rank Fusion of a BM25 ranking and an exact-cosine dense
    ranking, both query-by-example on document 0 (module docstring).

    rrf = sum over the two lists of round(1e6 / (RRF_K + rank)) micros;
    a doc absent from one list simply contributes nothing for it (the
    paper's convention). Ranks come from row_number over each POOL-row
    pool — the windows run AFTER the TakeOrdered limits, so the
    single-partition window inputs are bounded at RRF_POOL rows by
    construction (not a scale hazard). Output: fused top-RRF_TOPK with
    each list's rank kept (NULL = not in that pool)."""
    lex_pool = (
        _bm25_scored(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.sum("micros").alias("lex_micros"))
        .orderBy(F.desc("lex_micros"), "doc_id")
        .limit(RRF_POOL)
        .withColumn(
            "lex_rank",
            F.row_number().over(
                Window.orderBy(F.desc("lex_micros"), "doc_id")
            ),
        )
        .select("doc_id", "lex_rank")
    )
    emb = _emb(spark, sf_dir)
    query = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    dense_pool = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(query)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.expr(_cos_spark("embedding", "qv")).alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(RRF_POOL)
        .withColumn(
            "dense_rank",
            F.row_number().over(Window.orderBy(F.desc("score"), "doc_id")),
        )
        .select("doc_id", "dense_rank")
    )
    contrib = (
        f"coalesce(CAST(ROUND(1000000.0 / ({RRF_K} + lex_rank)) AS BIGINT), 0L) + "
        f"coalesce(CAST(ROUND(1000000.0 / ({RRF_K} + dense_rank)) AS BIGINT), 0L)"
    )
    return (
        lex_pool.join(dense_pool, "doc_id", "full_outer")
        .withColumn("rrf_micros", F.expr(contrib))
        .orderBy(F.desc("rrf_micros"), "doc_id")
        .limit(RRF_TOPK)
        .select(
            "doc_id",
            "lex_rank",
            "dense_rank",
            (F.col("rrf_micros").cast("double") / F.lit(1000000)).alias("rrf"),
        )
    )


def q_bm25_dense_rerank(spark, sf_dir):
    """Two-stage cascade: BM25 retrieves a RERANK_POOL-doc lexical pool,
    exact cosine against embedding 0 reranks it. The dense stage touches
    ONLY the pool: pool ids broadcast into an equi-join against the
    embedding table (a semi-join shaped probe — at 100 TB the reranker
    reads RERANK_POOL embedding rows, not the corpus). Reports both
    ranks and the rank shift the reranker applied — the standard
    diagnostic for how much the dense stage disagrees with the lexical
    prior."""
    lex_pool = (
        _bm25_scored(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.sum("micros").alias("lex_micros"))
        .orderBy(F.desc("lex_micros"), "doc_id")
        .limit(RERANK_POOL)
        .withColumn(
            "lex_rank",
            F.row_number().over(
                Window.orderBy(F.desc("lex_micros"), "doc_id")
            ),
        )
    )
    emb = _emb(spark, sf_dir)
    query = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    reranked = (
        emb.join(
            F.broadcast(lex_pool),
            emb.vec_id == lex_pool.doc_id,
        )
        .crossJoin(query)
        .select(
            "doc_id",
            "lex_rank",
            (F.col("lex_micros").cast("double") / F.lit(1000000)).alias("bm25"),
            F.expr(_cos_spark("embedding", "qv")).alias("cos"),
        )
        .withColumn(
            "dense_rank",
            F.row_number().over(Window.orderBy(F.desc("cos"), "doc_id")),
        )
    )
    return (
        reranked.filter(F.col("dense_rank") <= RERANK_TOPK)
        .select(
            "doc_id",
            "bm25",
            "cos",
            "lex_rank",
            "dense_rank",
            (F.col("lex_rank") - F.col("dense_rank")).alias("rank_shift"),
        )
        .orderBy("dense_rank")
    )


QUERIES = {
    "hybrid_rrf_fusion": q_hybrid_rrf_fusion,
    "bm25_dense_rerank": q_bm25_dense_rerank,
}

ORACLES = {
    "hybrid_rrf_fusion": rf"""
        WITH {_BM25_LEX_CTES},
        lex_pool AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY lex_micros DESC, doc_id)
                       AS lex_rank
            FROM (SELECT * FROM lex
                  ORDER BY lex_micros DESC, doc_id LIMIT {RRF_POOL})
        ),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        dense_scored AS (
            SELECT vec_id AS doc_id, {_cos_duck('embedding', 'qv')} AS score
            FROM embeddings, q WHERE vec_id != 0
        ),
        dense_pool AS (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
                       AS dense_rank
            FROM (SELECT * FROM dense_scored
                  ORDER BY score DESC, doc_id LIMIT {RRF_POOL})
        ),
        fused AS (
            SELECT COALESCE(l.doc_id, r.doc_id) AS doc_id,
                   l.lex_rank, r.dense_rank,
                   COALESCE(CAST(ROUND(1000000.0 / ({RRF_K} + l.lex_rank)) AS BIGINT), 0) +
                   COALESCE(CAST(ROUND(1000000.0 / ({RRF_K} + r.dense_rank)) AS BIGINT), 0)
                       AS rrf_micros
            FROM lex_pool l FULL OUTER JOIN dense_pool r USING (doc_id)
        )
        SELECT doc_id, lex_rank, dense_rank,
               CAST(rrf_micros AS DOUBLE) / 1000000 AS rrf
        FROM fused
        ORDER BY rrf_micros DESC, doc_id LIMIT {RRF_TOPK}
    """,
    "bm25_dense_rerank": rf"""
        WITH {_BM25_LEX_CTES},
        lex_pool AS (
            SELECT doc_id, lex_micros,
                   ROW_NUMBER() OVER (ORDER BY lex_micros DESC, doc_id)
                       AS lex_rank
            FROM (SELECT * FROM lex
                  ORDER BY lex_micros DESC, doc_id LIMIT {RERANK_POOL})
        ),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        reranked AS (
            SELECT p.doc_id, p.lex_rank,
                   CAST(p.lex_micros AS DOUBLE) / 1000000 AS bm25,
                   {_cos_duck('e.embedding', 'qv')} AS cos
            FROM lex_pool p
            JOIN embeddings e ON e.vec_id = p.doc_id, q
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id)
                       AS dense_rank
            FROM reranked
        )
        SELECT doc_id, bm25, cos, lex_rank, dense_rank,
               lex_rank - dense_rank AS rank_shift
        FROM ranked WHERE dense_rank <= {RERANK_TOPK}
        ORDER BY dense_rank
    """,
}
