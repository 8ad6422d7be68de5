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
    ivf_topk_persisted,
)
from . import similarity as S
from .similarity import IVF_NPROBE, KMEANS_ITERS, _emb


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
}

ORACLES = {
    # the persisted probe must equal the in-plan query — shared oracle
    "ann_index_ivf_persisted": S._ann_ivf_multiprobe_oracle(),
    "ann_index_ivf_append_audit": _ivf_append_audit_oracle(),
}
