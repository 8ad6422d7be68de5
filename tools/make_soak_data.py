"""Synthesize an sf1-scale soak fixture from the sf0.1 testdata.

The driver ships sf{0.001,0.01,0.1}; the scaling story ("would this
plan survive 100x?") rests on the 0.01->0.1 step. This tool
manufactures ONE MORE decade locally — /tmp/spark_graft_soak/sf1 —
so the step ratios that back SCALING_r*.md can be re-measured at
10x the bench fixture without touching the read-only testdata.

Construction: 10 key-shifted copies of every sf0.1 table (copy 0 is
the original bytes). Replication is NOT a plain union — identical
copies would make every row a cross-copy duplicate and turn the dedup /
LSH workloads into a different (degenerate) problem. Instead:

- keys (orderkey/custkey/partkey/suppkey/event_id/user_id/doc_id/
  vec_id) shift by copy * STRIDE, preserving every join relationship
  within a copy and colliding nowhere across copies;
- document text gets a per-copy token suffix (regexp '(\\S+)' ->
  '$1~k'): every shingle/token becomes copy-distinct, so MinHash /
  SimHash / n-gram workloads keep the fixture's within-copy duplicate
  rate while the corpus grows 10x (vocab grows 10x — the Zipf shape
  per copy is unchanged); n_chars is recomputed to stay consistent;
- embeddings get a deterministic per-(copy, dimension) SIGN FLIP:
  norms and within-copy dot products are bit-preserved (the same flips
  apply to both operands), while cross-copy cosine structure is
  scrambled — so ANN/knn recall workloads scale without 10 identical
  nearest neighbors appearing for every vector;
- bounded dims (region, nation) are copied as-is — their domains do
  not grow with data, at any scale.

Usage: python tools/make_soak_data.py [copies] [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
STRIDE = 100_000_000


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_soak/sf1"
    from pyspark.sql import functions as F

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark import get_spark

    spark = get_spark(app_name="make-soak-data")
    os.makedirs(out, exist_ok=True)

    key_cols = {
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "customer": ["c_custkey"],
        "part": ["p_partkey"],
        "supplier": ["s_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }

    for t in ("region", "nation"):
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    for t, keys in key_cols.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = []
        for k in range(copies):
            df = base
            for c in keys:
                df = df.withColumn(c, F.col(c) + F.lit(k * STRIDE))
            if t == "documents" and k > 0:
                df = df.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", rf"$1~{k}")
                ).withColumn("n_chars", F.length("text").cast("long"))
            if t == "embeddings" and k > 0:
                # deterministic per-(copy, dim) sign: norm-preserving,
                # within-copy dots exact, cross-copy structure scrambled
                df = df.withColumn(
                    "embedding",
                    F.expr(
                        "transform(embedding, (x, i) -> CAST(CASE WHEN "
                        f"pmod(hash(i, {k}), 2) = 0 THEN x ELSE -x END "
                        "AS FLOAT))"
                    ),
                )
            parts.append(df)
        un = parts[0]
        for p in parts[1:]:
            un = un.unionByName(p)
        tmp = f"{out}/__tmp_{t}"
        # single-FILE layout to mirror the testdata fixtures exactly
        # (DuckDB oracle views read '{dir}/{t}.parquet' as one file; scan
        # parallelism is then row-group-bound at every SF alike)
        un.coalesce(1).write.mode("overwrite").parquet(tmp)
        files = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
        assert len(files) == 1, files
        shutil.move(os.path.join(tmp, files[0]), f"{out}/{t}.parquet")
        shutil.rmtree(tmp)
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
