"""Phase-level wall-clock breakdown for the heavy persisted-index
queries (guide §1: measure first). Each phase is timed around the same
calls the registry query makes, in a fresh session, so the numbers sum
to ~the bench wall. Usage:

    python tools/profile_breakdown.py [sf_dir] [target ...]

Targets: ivf_build, ann_build, width_policy, ivf_knn_batch.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ONLY = set(sys.argv[2:])


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"  {label:45s} {time.perf_counter() - t0:7.2f}s", flush=True)
    return out


def main():
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark import get_spark
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans import similarity as S
    from pyspark.sql import functions as F

    spark = get_spark(app_name="profile-breakdown")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    # warm python workers + codegen
    spark.range(64, numPartitions=64).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    if not ONLY or "ivf_build" in ONLY:
        print("== ann_index_ivf_persisted (build phases) ==")
        from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators import ivf_index as IVF

        n = t("emb.count (derived k)", lambda: emb.count())
        k = S._derived_k(n)
        print(f"  (k={k})")
        cent = t("kmeans_fit (2 Lloyd rounds)", lambda: S._kmeans_fit(emb))[0]
        assigned = S._assign_df(emb, cent)
        from migrate_blob_data_from_rdbms_to_amazon_s3_spark.functions.local_frame import (
            arrow_local_df,
        )

        path = tempfile.mkdtemp(prefix="prof_ivf_")
        t("write centroids", lambda: arrow_local_df(
            spark, [(c, cv) for c, cv in cent], "cluster int, cv array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids"))
        t("write cells (repartition+partitionBy)", lambda: IVF._write_cells(assigned, path, 0, "overwrite"))
        t("read-back count", lambda: IVF.load_cells(spark, path).count())
        t("write meta", lambda: IVF._write_meta(spark, path, {
            "version": 1, "n_vectors": n, "k": k, "emb_dim": S.EMB_DIM, "gens": 1}))
        t("probe (ivf_topk_persisted+count)", lambda: IVF.ivf_topk_persisted(
            spark, path, emb.filter(F.col("vec_id") == 0), nprobe=S.IVF_NPROBE,
            exclude_vec_id=0).count())

    if not ONLY or "ann_build" in ONLY:
        print("== ann_index_knn_persisted (build phases) ==")
        from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators import ann_index as ANN

        path = tempfile.mkdtemp(prefix="prof_ann_")
        sigs = S._nd_sigs(emb, ["vec_id"], emit_dots=True)
        t("sigs kernel + write signatures", lambda: sigs.write.mode("overwrite").parquet(f"{path}/signatures"))
        sigs_back = spark.read.parquet(f"{path}/signatures")
        bands = ANN._band_rows(sigs_back, label=False)
        t("band rows window + write bands", lambda: bands.repartition(
            F.col("tab"), F.col("bv")).sortWithinPartitions("tab", "bv").write.mode(
            "overwrite").parquet(f"{path}/bands"))
        t("head limit(1) collect", lambda: sigs_back.select("nd_bits", "nd_tables").limit(1).collect())
        t("sigs_back.count", lambda: sigs_back.count())
        from migrate_blob_data_from_rdbms_to_amazon_s3_spark.functions.local_frame import (
            arrow_local_df,
        )

        t("write meta json", lambda: arrow_local_df(spark, [{
            "version": 1, "n_vectors": 2000, "nd_bits": 11, "nd_tables": 10,
            "recommended_bits": 11, "emb_dim": 64, "has_label": False,
        }], ANN._META_SCHEMA).coalesce(1).write.mode("overwrite").json(f"{path}/meta"))
        t("probe knn_join_persisted noop", lambda: ANN.knn_join_persisted(
            spark, emb, path).write.format("noop").mode("overwrite").save())

    if not ONLY or "width_policy" in ONLY:
        print("== ann_index_width_policy (phases) ==")
        from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators import ann_index as ANN
        from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans import ann_index_entries as AE

        base = tempfile.mkdtemp(prefix="prof_pol_")
        p0 = f"{base}/narrow"
        t("build narrow (4 bits, 8 tables)", lambda: ANN.build_ann_index(
            emb, p0, bits=AE._P_BITS, tables=AE._P_TABLES))
        a0 = t("freshness_audit #1", lambda: ANN.freshness_audit(spark, emb, p0))
        p1 = f"{base}/widened"
        t(f"widen to {a0['recommended_bits']} bits", lambda: ANN.widen_ann_index(
            spark, emb, p0, p1, bits=a0["recommended_bits"]))
        t("freshness_audit #2", lambda: ANN.freshness_audit(spark, emb, p1))

    if not ONLY or "ivf_knn_batch" in ONLY:
        print("== ann_index_ivf_knn_batch (phases) ==")
        from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans import ivf_index_entries as IE
        import inspect
        src = inspect.getsource(IE.q_ann_index_ivf_knn_batch)
        print(src)


if __name__ == "__main__":
    main()
