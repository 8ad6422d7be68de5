"""Random-projection dimensionality reduction (Johnson–Lindenstrauss).

``embedding_random_projection`` projects the EMB_DIM-dim embeddings to
RP_DOUT dims with a deterministic ±1 sign matrix (the database-friendly
construction of Achlioptas, JL lemma with {+1,-1} entries, PODS 2001 /
JCSS 2003): ``y = S·x / sqrt(RP_DOUT)``. ``projection_distortion_audit``
measures what the JL lemma promises — pairwise-distance preservation —
over the deterministic chain pairs (vec_id, vec_id + 1).

Cross-engine exactness: inputs quantize to integer micros with the
half-up ``floor(x*1e6 + 0.5)`` idiom (same as the int8 quantizer), the
sign matrix entries are ±1 literals derived driver-side from md5 (so
both engines inline the identical constants), and every sum/dot/norm
runs in exact BIGINT arithmetic — associative, partition-order-free.
The only floating-point ops are the final sqrt / division, which are
IEEE-correctly-rounded on identical inputs in both engines, so outputs
are emitted UNROUNDED and still hash-identical (no ROUND tie hazards).

Overflow headroom: |x| <= ~10 ⇒ |xq| <= 1e7; |y_j| <= 64e7 < 2^31;
y_j² ·16 ~ 6.6e18 < 2^63; (xqa-xqb)²·64 ~ 2.6e16 — all inside BIGINT.

Scale shape (100 TB): the projection is a narrow per-row expression —
scan-speed, no shuffle, no Python. The audit's chain-pair join is a
linear equi-join on consecutive ids (co-partitioned on the id — never a
pair explosion), and the final reduction is a single global aggregate of
integer partials. Reference analog: none (LLM-pipeline extension per
BASELINE.json §7); at 100 TB this is the standard pre-ANN compression
step — project once, index RP_DOUT-dim vectors at EMB_DIM/RP_DOUT× less
memory and candidate-scoring cost.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Window
from pyspark.sql import functions as F

from .similarity import EMB_DIM, _emb

RP_DOUT = 16
# micros quantization scale * sqrt(RP_DOUT): y_int / RP_SCALE_D = JL-scaled
# projected coordinate in original units
RP_SCALE_D = f"{1_000_000 * 4}D"
RP_SCALE_DUCK = str(1_000_000 * 4)
# |ratio - 1| <= 0.25 counts as "within tolerance" for the audit
RP_TOL_MICROS = 250_000


def _sign(j: int, i: int) -> int:
    """±1 from md5 parity — deterministic, engine-free (computed once at
    import and inlined as literals in BOTH the Spark and DuckDB text)."""
    return 1 if int(hashlib.md5(f"rp:{j}:{i}".encode()).hexdigest()[0], 16) & 1 == 0 else -1


_SIGNS = [[_sign(j, i) for i in range(EMB_DIM)] for j in range(RP_DOUT)]

_XQ = "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000D + 0.5D) AS BIGINT))"
_XQ_DUCK = "list_transform(embedding, x -> CAST(floor(x::DOUBLE * 1000000 + 0.5) AS BIGINT))"


def _y_exprs() -> str:
    """The RP_DOUT projected coordinates as BIGINT aggregates over the
    bound lambda variable ``xq`` (let-binding via transform(array(..)) —
    the _q8_spark idiom, so the quantized array is computed once, not
    re-inlined per coordinate)."""
    outs = []
    for j in range(RP_DOUT):
        signs = ", ".join(f"{s}L" for s in _SIGNS[j])
        outs.append(
            f"aggregate(zip_with(xq, array({signs}), (a, b) -> a * b), "
            f"0L, (acc, v) -> acc + v)"
        )
    return ", ".join(outs)


def _y_exprs_duck() -> str:
    outs = []
    for j in range(RP_DOUT):
        lit = "[" + ", ".join(str(s) for s in _SIGNS[j]) + "]"
        outs.append(
            f"list_sum(list_transform(generate_series(1, {EMB_DIM}), "
            f"i -> xq[i] * ({lit})[i]))"
        )
    return ", ".join(outs)


# per-vector (xq, ym) struct — shared by both queries
_PROJ_STRUCT = (
    f"transform(array({_XQ}), xq -> named_struct("
    f"'xq', xq, 'ym', array({_y_exprs()})))[0]"
)

_PROJ_CTE_DUCK = f"""
        xqt AS (
            SELECT vec_id, label, {_XQ_DUCK} AS xq FROM embeddings
        ),
        yt AS (
            SELECT vec_id, label, xq, [{_y_exprs_duck()}] AS ym FROM xqt
        )
"""


def _projected(spark, sf_dir):
    """(vec_id, label, xq, ym) with the struct materialized behind a
    groupBy-on-PK barrier so downstream field reads don't re-inline the
    1k-term projection expression (CollapseProject — the same hazard
    _q8_spark / _docs_with_toks document). One linear exchange of the
    quantized arrays."""
    return (
        _emb(spark, sf_dir)
        .select("vec_id", "label", F.expr(_PROJ_STRUCT).alias("s"))
        .groupBy("vec_id")
        .agg(
            F.first("label").alias("label"),
            F.first("s.xq").alias("xq"),
            F.first("s.ym").alias("ym"),
        )
    )


def q_random_projection(spark, sf_dir):
    """Per-vector JL projection + norm-preservation ratio
    ||y|| / (sqrt(RP_DOUT)·||x||) — the row-level product a pipeline
    would persist as the compressed embedding column (module docstring
    for the exactness/scale argument)."""
    p = _projected(spark, sf_dir)
    return p.select(
        "vec_id",
        "label",
        F.expr(f"transform(ym, v -> CAST(v AS DOUBLE) / {RP_SCALE_D})").alias("proj"),
        F.expr(
            "try_divide(sqrt(CAST(aggregate(ym, 0L, (acc, v) -> acc + v * v) AS DOUBLE)), "
            "4D * sqrt(CAST(aggregate(xq, 0L, (acc, v) -> acc + v * v) AS DOUBLE)))"
        ).alias("norm_ratio"),
    )


def q_distortion_audit(spark, sf_dir):
    """JL distance-distortion audit over the chain pairs (i, i+1):
    ratio_r = ||y_a - y_b|| / (sqrt(RP_DOUT)·||x_a - x_b||), quantized to
    micros (half-up) and reduced with exact integer partials. Reports
    pair count, mean/min/max ratio, and the fraction within
    |ratio - 1| <= 0.25 — the empirical check of the JL guarantee at
    this RP_DOUT. Identical quantized vectors (zero distance) yield a
    NULL ratio and drop out of the audit in both engines."""
    p = _projected(spark, sf_dir)
    a = p.select(
        F.col("vec_id").alias("vid"),
        F.col("xq").alias("axq"),
        F.col("ym").alias("aym"),
    )
    b = p.select(
        (F.col("vec_id") - 1).alias("vid"),
        F.col("xq").alias("bxq"),
        F.col("ym").alias("bym"),
    )
    pairs = a.join(b, "vid")
    rm = (
        "CAST(floor(try_divide("
        "sqrt(CAST(aggregate(zip_with(aym, bym, (p, q) -> (p - q) * (p - q)), 0L, (acc, v) -> acc + v) AS DOUBLE)), "
        "4D * sqrt(CAST(aggregate(zip_with(axq, bxq, (p, q) -> (p - q) * (p - q)), 0L, (acc, v) -> acc + v) AS DOUBLE))"
        ") * 1000000D + 0.5D) AS BIGINT)"
    )
    return (
        pairs.select(F.expr(rm).alias("rm"))
        .agg(
            F.count("rm").alias("n_pairs"),
            F.expr(
                "try_divide(CAST(SUM(rm) AS DOUBLE), CAST(COUNT(rm) AS DOUBLE) * 1000000D)"
            ).alias("mean_ratio"),
            (F.min("rm").cast("double") / F.lit(1000000)).alias("min_ratio"),
            (F.max("rm").cast("double") / F.lit(1000000)).alias("max_ratio"),
            F.sum(
                F.expr(
                    f"CASE WHEN rm IS NOT NULL AND abs(rm - 1000000) <= {RP_TOL_MICROS} THEN 1 ELSE 0 END"
                )
            ).alias("n_within_tol"),
            F.expr(
                f"try_divide(CAST(SUM(CASE WHEN rm IS NOT NULL AND abs(rm - 1000000) <= {RP_TOL_MICROS} "
                f"THEN 1 ELSE 0 END) AS DOUBLE), CAST(COUNT(rm) AS DOUBLE))"
            ).alias("frac_within_tol"),
        )
    )


PR_SAMPLE = 20  # fixed query panel (ann_recall_audit's discipline)
PR_K = 5
PR_SALT = 16    # phase-1 shards so no query's candidates single-sort


def q_projection_recall(spark, sf_dir):
    """Retrieval quality of the PROJECTED space: recall@PR_K of
    brute-force cosine top-k computed on the 16-dim JL projection
    against top-k on the original 64-dim embeddings, over a fixed
    PR_SAMPLE-query panel — the number that decides whether the 4×
    cheaper projected index is good enough to serve candidates
    (JL's distance guarantee measured as ranking agreement, not just
    pairwise distortion).

    ONE broadcast of the quantized panel serves both arms: each
    (corpus row × query) computes the original-space dot (64 exact
    integer terms) and the projected dot (16 terms) in the same
    map-side pass; each arm then runs the salted two-phase top-k.

    Honest reading of the number: on the near-isotropic synthetic
    fixtures recall@5 is LOW (~0.1 at sf0.01) — neighbors there are
    separated by cosine gaps far smaller than the ±0.25 distortion a
    16-dim JL projection admits, so ranking agreement collapses even
    though projection_distortion_audit shows distances preserved. That
    is the audit doing its job: it rejects serving candidates from 16
    dims on THIS corpus; real embedding corpora have clustered
    neighborhoods (gaps >> distortion) and the dial is RP_DOUT
    (rank within (qid, id % PR_SALT) shards, then rank the <=
    SALT·k survivors) so nothing single-sorts. Scores are exact
    integer dots divided by exact-integer-sum norms — bit-identical
    doubles in both engines; degenerate zero-norm rows drop via the
    IS NOT NULL guard BEFORE ranking (NULL-ordering defaults differ
    across engines)."""
    p = _projected(spark, sf_dir)
    withn = p.select(
        "vec_id",
        "xq",
        "ym",
        F.expr("aggregate(xq, 0L, (acc, v) -> acc + v * v)").alias("x2"),
        F.expr("aggregate(ym, 0L, (acc, v) -> acc + v * v)").alias("y2"),
    )
    qs = withn.filter(F.col("vec_id") < PR_SAMPLE).select(
        F.col("vec_id").alias("qid"),
        F.col("xq").alias("qxq"),
        F.col("ym").alias("qym"),
        F.col("x2").alias("qx2"),
        F.col("y2").alias("qy2"),
    )
    scored = (
        withn.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.expr(
                "try_divide(CAST(aggregate(zip_with(xq, qxq, (a, b) -> a * b), 0L, (acc, v) -> acc + v) AS DOUBLE), "
                "sqrt(CAST(x2 AS DOUBLE)) * sqrt(CAST(qx2 AS DOUBLE)))"
            ).alias("orig_score"),
            F.expr(
                "try_divide(CAST(aggregate(zip_with(ym, qym, (a, b) -> a * b), 0L, (acc, v) -> acc + v) AS DOUBLE), "
                "sqrt(CAST(y2 AS DOUBLE)) * sqrt(CAST(qy2 AS DOUBLE)))"
            ).alias("proj_score"),
        )
        .localCheckpoint(eager=False)
    )

    def topk(score_col):
        order = [F.desc(score_col), F.asc("vec_id")]
        w1 = Window.partitionBy("qid", F.col("vec_id") % PR_SALT).orderBy(*order)
        w2 = Window.partitionBy("qid").orderBy(*order)
        return (
            scored.filter(F.col(score_col).isNotNull())
            .withColumn("rn1", F.row_number().over(w1))
            .filter(F.col("rn1") <= PR_K)
            .withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") <= PR_K)
            .select("qid", F.col("vec_id").alias("nid"))
        )

    exact, proj = topk("orig_score"), topk("proj_score")
    ex = exact.groupBy("qid").agg(F.count("*").alias("n_exact"))
    pr = proj.groupBy("qid").agg(F.count("*").alias("n_proj"))
    ov = exact.join(proj, ["qid", "nid"]).groupBy("qid").agg(
        F.count("*").alias("n_overlap")
    )
    return (
        ex.join(pr, "qid", "left")
        .join(ov, "qid", "left")
        .select(
            F.col("qid").alias("vec_id"),
            "n_exact",
            F.coalesce("n_proj", F.lit(0)).alias("n_proj"),
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.round(
                F.coalesce("n_overlap", F.lit(0)) / F.col("n_exact"), 4
            ).alias("recall_at_k"),
        )
    )


QUERIES = {
    "embedding_random_projection": q_random_projection,
    "projection_distortion_audit": q_distortion_audit,
    "projection_ann_recall": q_projection_recall,
}

ORACLES = {
    "embedding_random_projection": f"""
        WITH {_PROJ_CTE_DUCK}
        SELECT vec_id, label,
               list_transform(ym, v -> v::DOUBLE / {RP_SCALE_DUCK}) AS proj,
               CASE WHEN list_sum(list_transform(xq, v -> v * v)) = 0 THEN NULL
                    ELSE sqrt(list_sum(list_transform(ym, v -> v * v))::DOUBLE) /
                         (4 * sqrt(list_sum(list_transform(xq, v -> v * v))::DOUBLE))
               END AS norm_ratio
        FROM yt
    """,
    "projection_ann_recall": f"""
        WITH {_PROJ_CTE_DUCK},
        wn AS (
            SELECT vec_id, xq, ym,
                   list_sum(list_transform(xq, v -> v * v)) AS x2,
                   list_sum(list_transform(ym, v -> v * v)) AS y2
            FROM yt
        ),
        qs AS (
            SELECT vec_id AS qid, xq AS qxq, ym AS qym, x2 AS qx2, y2 AS qy2
            FROM wn WHERE vec_id < {PR_SAMPLE}
        ),
        scored AS (
            SELECT q.qid, w.vec_id,
                   CASE WHEN w.x2 = 0 OR q.qx2 = 0 THEN NULL
                        ELSE CAST(list_sum(list_transform(generate_series(1, {EMB_DIM}),
                                  i -> w.xq[i] * q.qxq[i])) AS DOUBLE) /
                             (sqrt(w.x2::DOUBLE) * sqrt(q.qx2::DOUBLE))
                   END AS orig_score,
                   CASE WHEN w.y2 = 0 OR q.qy2 = 0 THEN NULL
                        ELSE CAST(list_sum(list_transform(generate_series(1, {RP_DOUT}),
                                  i -> w.ym[i] * q.qym[i])) AS DOUBLE) /
                             (sqrt(w.y2::DOUBLE) * sqrt(q.qy2::DOUBLE))
                   END AS proj_score
            FROM wn w, qs q WHERE w.vec_id != q.qid
        ),
        exact AS (
            SELECT qid, vec_id AS nid FROM (
                SELECT qid, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY orig_score DESC, vec_id) AS rn
                FROM scored WHERE orig_score IS NOT NULL
            ) WHERE rn <= {PR_K}
        ),
        proj AS (
            SELECT qid, vec_id AS nid FROM (
                SELECT qid, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY qid
                                          ORDER BY proj_score DESC, vec_id) AS rn
                FROM scored WHERE proj_score IS NOT NULL
            ) WHERE rn <= {PR_K}
        ),
        ex AS (SELECT qid, COUNT(*) AS n_exact FROM exact GROUP BY qid),
        pr AS (SELECT qid, COUNT(*) AS n_proj FROM proj GROUP BY qid),
        ov AS (
            SELECT e.qid, COUNT(*) AS n_overlap
            FROM exact e JOIN proj p ON e.qid = p.qid AND e.nid = p.nid
            GROUP BY e.qid
        )
        SELECT ex.qid AS vec_id, ex.n_exact,
               COALESCE(pr.n_proj, 0) AS n_proj,
               COALESCE(ov.n_overlap, 0) AS n_overlap,
               ROUND(COALESCE(ov.n_overlap, 0) / ex.n_exact, 4) AS recall_at_k
        FROM ex LEFT JOIN pr ON ex.qid = pr.qid
                LEFT JOIN ov ON ex.qid = ov.qid
    """,
    "projection_distortion_audit": f"""
        WITH {_PROJ_CTE_DUCK},
        pairs AS (
            SELECT a.xq AS axq, a.ym AS aym, b.xq AS bxq, b.ym AS bym
            FROM yt a JOIN yt b ON b.vec_id = a.vec_id + 1
        ),
        dist AS (
            SELECT
                list_sum(list_transform(generate_series(1, {EMB_DIM}),
                         i -> (axq[i] - bxq[i]) * (axq[i] - bxq[i]))) AS dx2,
                list_sum(list_transform(generate_series(1, {RP_DOUT}),
                         i -> (aym[i] - bym[i]) * (aym[i] - bym[i]))) AS dy2
            FROM pairs
        ),
        rt AS (
            SELECT CASE WHEN dx2 = 0 THEN NULL
                        ELSE CAST(floor(sqrt(dy2::DOUBLE) / (4 * sqrt(dx2::DOUBLE))
                                        * 1000000 + 0.5) AS BIGINT)
                   END AS rm
            FROM dist
        )
        SELECT COUNT(rm) AS n_pairs,
               CASE WHEN COUNT(rm) = 0 THEN NULL
                    ELSE CAST(SUM(rm) AS DOUBLE) / (CAST(COUNT(rm) AS DOUBLE) * 1000000)
               END AS mean_ratio,
               CAST(MIN(rm) AS DOUBLE) / 1000000 AS min_ratio,
               CAST(MAX(rm) AS DOUBLE) / 1000000 AS max_ratio,
               SUM(CASE WHEN rm IS NOT NULL AND abs(rm - 1000000) <= {RP_TOL_MICROS}
                        THEN 1 ELSE 0 END) AS n_within_tol,
               CASE WHEN COUNT(rm) = 0 THEN NULL
                    ELSE CAST(SUM(CASE WHEN rm IS NOT NULL AND abs(rm - 1000000) <= {RP_TOL_MICROS}
                                       THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(rm) AS DOUBLE)
               END AS frac_within_tol
        FROM rt
    """,
}
