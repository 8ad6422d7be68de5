"""Registry entries for the persisted IVF index (train-once / probe-many
/ append-without-retraining — operators/ivf_index).

Two queries:

- ``ann_index_ivf_persisted`` — trains the quantizer, lays the corpus
  out as cluster-partitioned inverted lists at a temp path, then runs
  the nprobe=2 query AS A PROBE against the standing index (partition-
  pruned cell scan + broadcast 1-row query + top-k; no Lloyd rounds at
  probe time). Result-identical to ``ann_ivf_multiprobe``, so it shares
  its DuckDB oracle — the cross-engine proof that the persisted layout
  round-trips the same index.
- ``ann_index_ivf_append_audit`` — trains ONLY on the first half of the
  corpus (vec_id < floor(n/2)), appends the second half against the
  FROZEN codebook (no retraining), and reports per-cell fill split by
  ingest generation. The DuckDB twin independently trains k-means on
  the same prefix and assigns the FULL corpus to the final centroids —
  a hash match proves (a) the frozen-codebook append assigns exactly
  like a from-scratch assignment, and (b) the partitioned cells layout
  round-trips every row.

At 100 TB: the round-8 soak measured in-plan IVF wall ≈ k-means wall —
training dominates, the probe is ~0.5 s. The standing index turns every
probe into a pruned scan of nprobe/k of the files, and ingest into an
assign+append of just the new batch (SOAK/IVF_INDEX_BENCH record the
amortization split).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from ..operators.ivf_index import (
    append_ivf_index,
    build_ivf_index,
    cell_fill_audit,
    ivf_knn_batch_persisted,
    ivf_topk_persisted,
)
from . import similarity as S
from .similarity import IVF_NPROBE, KMEANS_ITERS, _emb

# deterministic ingest-batch selector for the batch-probe twin: every
# 97th vector plays the "new arrivals" role (prime, so the batch is
# spread across cells). Shared verbatim with the DuckDB oracle.
BATCH_MOD = 97
BATCH_TOPK = 3


def q_ann_index_ivf_persisted(spark, sf_dir):
    """ann_ivf_multiprobe over the standing index (module docstring)."""
    emb = _emb(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="ivf_idx_")
    build_ivf_index(emb, path)
    query = emb.filter(F.col("vec_id") == 0)
    return ivf_topk_persisted(
        spark, path, query, nprobe=IVF_NPROBE, k_top=5, exclude_vec_id=0
    )


def q_ann_index_ivf_append_audit(spark, sf_dir):
    """Frozen-codebook append audit (module docstring): per-cell fill
    split by ingest generation after training on the first half and
    appending the second."""
    emb = _emb(spark, sf_dir)
    cut = emb.count() // 2
    path = tempfile.mkdtemp(prefix="ivf_idx_app_")
    build_ivf_index(emb.filter(F.col("vec_id") < cut), path)
    append_ivf_index(spark, emb.filter(F.col("vec_id") >= cut), path)
    return cell_fill_audit(spark, path)


def q_ann_index_ivf_knn_batch(spark, sf_dir):
    """Batch probe of the standing index: every BATCH_MOD-th vector
    plays an ingest batch and gets its BATCH_TOPK exact-cosine
    neighbors from its IVF_NPROBE nearest cells (self excluded) — the
    "score the new arrivals against the standing corpus" gate, one
    pruned scan + one cluster join for the WHOLE batch instead of a
    probe per query (operators/ivf_index.ivf_knn_batch_persisted)."""
    emb = _emb(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="ivf_idx_knn_")
    build_ivf_index(emb, path)
    batch = emb.filter(F.col("vec_id") % BATCH_MOD == 0)
    return ivf_knn_batch_persisted(
        spark, path, batch, nprobe=IVF_NPROBE, k_top=BATCH_TOPK
    )


def _ivf_knn_batch_oracle() -> str:
    """DuckDB twin: independently train the same corpus-derived k-means,
    assign the FULL corpus to the final centroids, rank each batch
    vector's IVF_NPROBE nearest cells, and take the per-query exact-
    cosine top BATCH_TOPK over those cells' members. A hash match proves
    the persisted layout + the batch join reproduce per-query results
    identical to a from-scratch per-query evaluation."""
    iters = KMEANS_ITERS
    d = S._sq_dist_duck("e.embedding", "c.cv")
    dq = S._sq_dist_duck("q.qv", "c.cv")
    cos = S._cos_duck("a.embedding", "q.qv")
    return f"""{S._kmeans_ctes()}
        , assigned_f AS (
            SELECT vec_id, embedding, cluster FROM (
                SELECT e.vec_id, e.embedding, c.cluster,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                          ORDER BY {d}, c.cluster) AS rn
                FROM embeddings e, cents_{iters} c
            ) WHERE rn = 1
        ),
        qb AS (
            SELECT vec_id AS q_vec_id, embedding AS qv
            FROM embeddings WHERE vec_id % {BATCH_MOD} = 0
        ),
        qprobes AS (
            SELECT q_vec_id, cluster FROM (
                SELECT q.q_vec_id, c.cluster,
                       ROW_NUMBER() OVER (PARTITION BY q.q_vec_id
                                          ORDER BY {dq}, c.cluster) AS rn
                FROM qb q, cents_{iters} c
            ) WHERE rn <= {IVF_NPROBE}
        )
        SELECT q_vec_id, vec_id, cluster, score FROM (
            SELECT q.q_vec_id, a.vec_id, a.cluster, {cos} AS score,
                   ROW_NUMBER() OVER (PARTITION BY q.q_vec_id
                                      ORDER BY {cos} DESC, a.vec_id) AS rn
            FROM assigned_f a
            JOIN qprobes p ON a.cluster = p.cluster
            JOIN qb q ON q.q_vec_id = p.q_vec_id
            WHERE a.vec_id != q.q_vec_id
        ) WHERE rn <= {BATCH_TOPK}
    """


def _ivf_append_audit_oracle() -> str:
    """DuckDB twin: train on the prefix corpus (same corpus-derived k,
    same Lloyd rounds — _kmeans_ctes parameterized by relation), assign
    the FULL corpus to the final centroids, and split the per-cell
    counts at the cut. Column-name parity with cell_fill_audit."""
    iters = KMEANS_ITERS
    d = S._sq_dist_duck("e.embedding", "c.cv")
    pre = (
        "cut AS (SELECT CAST(FLOOR(COUNT(*) / 2) AS BIGINT) AS c FROM embeddings), "
        "corpus AS (SELECT * FROM embeddings WHERE vec_id < (SELECT c FROM cut)), "
    )
    return f"""{S._kmeans_ctes(corpus="corpus", pre=pre)}
        , assigned_f AS (
            SELECT vec_id, cluster FROM (
                SELECT e.vec_id, c.cluster,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                          ORDER BY {d}, c.cluster) AS rn
                FROM embeddings e, cents_{iters} c
            ) WHERE rn = 1
        )
        SELECT cluster,
               SUM(CASE WHEN vec_id < (SELECT c FROM cut) THEN 1 ELSE 0 END) AS n_base,
               SUM(CASE WHEN vec_id >= (SELECT c FROM cut) THEN 1 ELSE 0 END) AS n_appended,
               COUNT(*) AS n_total
        FROM assigned_f GROUP BY cluster
    """


QUERIES = {
    "ann_index_ivf_persisted": q_ann_index_ivf_persisted,
    "ann_index_ivf_append_audit": q_ann_index_ivf_append_audit,
    "ann_index_ivf_knn_batch": q_ann_index_ivf_knn_batch,
}

ORACLES = {
    # the persisted probe must equal the in-plan query — shared oracle
    "ann_index_ivf_persisted": S._ann_ivf_multiprobe_oracle(),
    "ann_index_ivf_append_audit": _ivf_append_audit_oracle(),
    "ann_index_ivf_knn_batch": _ivf_knn_batch_oracle(),
}
