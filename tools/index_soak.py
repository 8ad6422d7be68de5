"""Standing-index soak across TWO synthesized decades (VERDICT r10
item 7): sf1 (10 copies of sf0.1) and sf10 (100 copies) for the two
persisted index families whose payoff is build-once/probe-many —
ANN-LSH (operators/ann_index) and the MinHash text index
(operators/text_index). sf1 is 20 k vectors / 50 k docs; sf10 (200 k /
500 k) is the first size where the registry-side hot-bucket caps
(ND_MAX_BUCKET / MAX_BAND_BUCKET = 256) and the widen kernel carry real
mass.

Only documents + embeddings are synthesized (same transforms as
tools/make_soak_data.py: key stride, per-copy token suffix, per-copy
deterministic sign flips), because only those two tables feed the index
families; the step ratios to report are build, batch-probe (a ~1%
drop), registry-internal neardup (the cap-bounded self-join), widen
(+2 bits), and text append.

Usage: python tools/index_soak.py [out_json]
Writes INDEX_SOAK_raw_r11.json (default) and prints one summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
STRIDE = 100_000_000
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
SCALES = {"sf1": 10, "sf10": 100}
ROOT = "/tmp/spark_graft_index_soak"

# The registry's heaviest non-index plans (r12 fleet leg): similarity /
# dedup / graph / retrieval heavyweights plus the two r11 watch items
# (graph_triangles excursion band; pack_sequences_bpe step adjudication).
# All read only documents/embeddings/events — the tables synth() builds.
FLEET = [
    "knn_join",
    "hard_negative_mining",
    "graph_triangles",
    "semdedup",
    "bm25_topk",
    "dedup_minhash_lsh",
    "dedup_components",
    "decontaminate_embedding",
    "embedding_covariance_topk",
    "coreset_kcenter",
    "pack_sequences_bpe",
    "text_bpe_token_count",
]


def _synth_fingerprint(copies: int) -> str:
    """Cache key for a synthesized decade: config + source-fixture
    identity. A soak re-run after fixture or transform changes must
    regenerate, not silently measure stale data (r11 advice)."""
    st = os.stat(f"{SRC}/documents.parquet")
    se = os.stat(f"{SRC}/embeddings.parquet")
    sv = os.stat(f"{SRC}/events.parquet")
    return (
        f"v3|copies={copies}|stride={STRIDE}|src={SRC}"
        f"|doc={st.st_size}:{int(st.st_mtime)}|emb={se.st_size}:{int(se.st_mtime)}"
        f"|ev={sv.st_size}:{int(sv.st_mtime)}"
    )


def synth(spark, out: str, copies: int) -> None:
    """documents + embeddings + events (r12: the fleet-heavyweight leg
    needs the event graph too), same construction as make_soak_data
    (single-file layout). Regenerates whenever the manifest fingerprint
    (copies/STRIDE/source size+mtime/transform version) mismatches."""
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    manifest = f"{out}/MANIFEST.txt"
    fp = _synth_fingerprint(copies)
    stale = not (
        os.path.exists(manifest) and open(manifest).read().strip() == fp
    )
    for t, keys in (
        ("documents", ["doc_id"]),
        ("embeddings", ["vec_id"]),
        ("events", ["event_id", "user_id"]),
    ):
        if not stale and os.path.exists(f"{out}/{t}.parquet"):
            continue
        if os.path.exists(f"{out}/{t}.parquet"):
            os.remove(f"{out}/{t}.parquet")
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
        un.coalesce(1).write.mode("overwrite").parquet(tmp)
        files = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
        assert len(files) == 1, files
        shutil.move(os.path.join(tmp, files[0]), f"{out}/{t}.parquet")
        shutil.rmtree(tmp)
    with open(manifest, "w") as fh:
        fh.write(fp + "\n")


def _t(fn) -> float:
    t0 = time.monotonic()
    fn()
    return round(time.monotonic() - t0, 3)


def measure(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.ann_index import (
        build_ann_index,
        knn_join_persisted,
        read_meta,
        widen_ann_index,
    )
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.text_index import (
        append_text_index,
        build_text_index,
        ingest_text_persisted,
        neardup_text_persisted,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    out: dict = {"n_vectors": emb.count(), "n_docs": docs.count()}

    # --- ANN-LSH family ------------------------------------------------------
    # Build at a FIXED narrow width (12 bits) and widen to 14 at both
    # scales, so the 1->10 step ratio isolates data volume. (The
    # corpus-derived width is already the ND_MAX_BITS=16 clamp at 20 k
    # vectors, leaving no headroom to widen; starting narrow and
    # widening as the corpus grows is also the production lifecycle the
    # widen audit describes.)
    p = tempfile.mkdtemp(prefix="idx_soak_ann_", dir=ROOT)
    out["ann_build"] = _t(lambda: build_ann_index(emb, p, bits=12))
    batch = emb.filter(F.col("vec_id") % 97 == 0)
    out["ann_batch_probe"] = [
        _t(lambda: knn_join_persisted(spark, batch, p).count()) for _ in range(RUNS)
    ]
    meta = read_meta(spark, p)
    p2 = tempfile.mkdtemp(prefix="idx_soak_ann_w_", dir=ROOT)
    out["ann_widen_plus2"] = _t(
        lambda: widen_ann_index(spark, emb, p, p2, bits=14)
    )
    out["ann_bits"] = int(meta["nd_bits"])
    shutil.rmtree(p, ignore_errors=True)
    shutil.rmtree(p2, ignore_errors=True)

    # --- MinHash text family -------------------------------------------------
    pt = tempfile.mkdtemp(prefix="idx_soak_text_", dir=ROOT)
    out["text_build"] = _t(lambda: build_text_index(docs, pt))
    bdocs = docs.filter(F.col("doc_id") % 97 == 0)
    out["text_ingest_probe"] = [
        _t(
            lambda: ingest_text_persisted(
                spark, bdocs, pt, exclude_ids=bdocs.select("doc_id")
            ).count()
        )
        for _ in range(RUNS)
    ]
    out["text_neardup_registry"] = [
        _t(lambda: neardup_text_persisted(spark, pt).count()) for _ in range(RUNS)
    ]
    fresh = bdocs.select(
        (F.col("doc_id") + F.lit(10_000_000_000)).alias("doc_id"), "text"
    )
    out["text_append_slice"] = _t(lambda: append_text_index(spark, fresh, pt))
    shutil.rmtree(pt, ignore_errors=True)

    # --- fleet heavyweights (r12, VERDICT r11 item 5) ------------------------
    # The registry's top walls, driven through the driver contract so the
    # measured plan is exactly the gated one. Each runs FLEET_RUNS times;
    # the sf1->sf10 step ratio per query lands in the main() summary.
    # (pack_sequences_bpe is here for the r11 item-2 adjudication: its
    # 15.6x step was measured on the r11 chain plan inside a shared JVM
    # chunk; this is the kernel plan, solo.)
    import __spark_entry__ as E

    qs = E.queries()
    fleet_runs = int(os.environ.get("SPARK_GRAFT_FLEET_RUNS", "1"))
    out["fleet"] = {}
    for name in FLEET:
        try:
            walls = [
                _t(lambda: qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save())
                for _ in range(fleet_runs)
            ]
            out["fleet"][name] = walls
        except Exception as e:  # noqa: BLE001 - record, keep soaking
            out["fleet"][name] = f"ERROR: {type(e).__name__}: {e}"
    return out


def main() -> None:
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark import get_spark

    out_json = sys.argv[1] if len(sys.argv) > 1 else "INDEX_SOAK_raw_r12.json"
    os.makedirs(ROOT, exist_ok=True)
    spark = get_spark(app_name="index-soak")
    record: dict = {"runs": RUNS}
    try:
        record["load1_at_start"] = round(os.getloadavg()[0], 2)
    except OSError:
        record["load1_at_start"] = None
    for name, copies in SCALES.items():
        d = f"{ROOT}/{name}"
        synth(spark, d, copies)
        record[name] = measure(spark, d)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, out_json), "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    ratios = {
        k: round(
            (med(record["sf10"][k]) if isinstance(record["sf10"][k], list) else record["sf10"][k])
            / max(
                0.001,
                med(record["sf1"][k]) if isinstance(record["sf1"][k], list) else record["sf1"][k],
            ),
            2,
        )
        for k in (
            "ann_build", "ann_batch_probe", "ann_widen_plus2",
            "text_build", "text_ingest_probe", "text_neardup_registry",
            "text_append_slice",
        )
    }
    fleet_ratios = {}
    for k in FLEET:
        a, b = record["sf1"]["fleet"].get(k), record["sf10"]["fleet"].get(k)
        if isinstance(a, list) and isinstance(b, list):
            fleet_ratios[k] = round(med(b) / max(0.001, med(a)), 2)
        else:
            fleet_ratios[k] = "ERROR"
    print(json.dumps({
        "step_ratios_1_to_10": ratios,
        "fleet_step_ratios_1_to_10": fleet_ratios,
        "raw": out_json,
    }))


if __name__ == "__main__":
    main()
