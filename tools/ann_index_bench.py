"""Measure the build-once/probe-many amortization of the persisted
ANN-LSH index (VERDICT r7 item 1's "done" evidence).

Times, in ONE fresh session at $SPARK_GRAFT_SF_DIR (default sf0.1):

- ``knn_inplan``: q_knn_join as registered (index rebuilt in-plan),
  RUNS times — the per-query price every consumer pays today.
- ``index_build``: one build_ann_index (signatures + bands + meta to
  Parquet).
- ``knn_probe``: knn_join_persisted against the prebuilt path, RUNS
  times — the amortized per-query price.
- ``neardup_inplan`` / ``neardup_probe``: same pair for the
  label-constrained consumer (its own label-carrying index build is
  timed into ``index_build_label``).
- ``ivf_inplan`` / ``ivf_build`` / ``ivf_probe``: the same
  amortization split for the persisted IVF index (round 9) — the r8
  soak measured in-plan IVF wall ≈ k-means wall, so the probe should
  shed nearly all of it. ``ivf_append_slice`` times the frozen-codebook
  incremental ingest of a 10% slice into a 90% index.

Writes ANN_INDEX_BENCH_latest.json and prints one summary line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> None:
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark import get_spark
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.ann_index import (
        build_ann_index,
        knn_join_persisted,
        neardup_persisted,
    )
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.similarity import (
        q_knn_join,
        q_neardup_embedding,
    )

    spark = get_spark(cpus=int(CPUS))
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def t(fn) -> float:
        t0 = time.monotonic()
        fn()
        return round(time.monotonic() - t0, 3)

    out: dict = {"sf_dir": SF_DIR, "runs": RUNS, "n": emb.count()}
    out["knn_inplan"] = [
        t(lambda: q_knn_join(spark, SF_DIR).count()) for _ in range(RUNS)
    ]
    path = tempfile.mkdtemp(prefix="ann_idx_bench_")
    out["index_build"] = t(lambda: build_ann_index(emb, path))
    out["knn_probe"] = [
        t(lambda: knn_join_persisted(spark, emb, path).count()) for _ in range(RUNS)
    ]
    out["neardup_inplan"] = [
        t(lambda: q_neardup_embedding(spark, SF_DIR).count()) for _ in range(RUNS)
    ]
    path_l = tempfile.mkdtemp(prefix="ann_idx_bench_l_")
    out["index_build_label"] = t(
        lambda: build_ann_index(emb, path_l, label_col="label")
    )
    out["neardup_probe"] = [
        t(lambda: neardup_persisted(spark, emb, path_l).count()) for _ in range(RUNS)
    ]
    from pyspark.sql import functions as F

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.ivf_index import (
        append_ivf_index,
        build_ivf_index,
        ivf_topk_persisted,
    )
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.similarity import (
        IVF_NPROBE,
        q_ann_ivf_multiprobe,
    )

    out["ivf_inplan"] = [
        t(lambda: q_ann_ivf_multiprobe(spark, SF_DIR).count()) for _ in range(RUNS)
    ]
    path_ivf = tempfile.mkdtemp(prefix="ivf_idx_bench_")
    out["ivf_build"] = t(lambda: build_ivf_index(emb, path_ivf))
    query = emb.filter(F.col("vec_id") == 0)
    out["ivf_probe"] = [
        t(
            lambda: ivf_topk_persisted(
                spark, path_ivf, query, nprobe=IVF_NPROBE, exclude_vec_id=0
            ).count()
        )
        for _ in range(RUNS)
    ]
    path_ivf9 = tempfile.mkdtemp(prefix="ivf_idx_bench9_")
    build_ivf_index(emb.filter(F.col("vec_id") % 10 != 0), path_ivf9)
    out["ivf_append_slice"] = t(
        lambda: append_ivf_index(
            spark, emb.filter(F.col("vec_id") % 10 == 0), path_ivf9
        )
    )
    try:
        out["load1"] = round(os.getloadavg()[0], 2)
    except OSError:
        out["load1"] = None
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "ANN_INDEX_BENCH_latest.json"), "w") as f:
        json.dump(out, f, indent=1)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(
        json.dumps(
            {
                "knn_inplan_med": med(out["knn_inplan"]),
                "knn_probe_med": med(out["knn_probe"]),
                "build": out["index_build"],
                "neardup_inplan_med": med(out["neardup_inplan"]),
                "neardup_probe_med": med(out["neardup_probe"]),
                "build_label": out["index_build_label"],
                "ivf_inplan_med": med(out["ivf_inplan"]),
                "ivf_build": out["ivf_build"],
                "ivf_probe_med": med(out["ivf_probe"]),
                "ivf_append_slice": out["ivf_append_slice"],
            }
        )
    )


if __name__ == "__main__":
    main()
