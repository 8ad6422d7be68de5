"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Materialization is the ``noop`` sink (full computation, no driver collect)
except for small-result queries where collect() is the realistic path.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# headline set: reference-parity reads/writes, heavy analytics joins,
# windows, and the LLM-pipeline operators — the queries whose plans matter
# at scale. Names map 1:1 to __spark_entry__.queries().
HEADLINE = [
    "page_scan",
    "keyed_update",
    "bridge_coalesce",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q4_order_priority",
    "q10_returned_items",
    "asof_join",
    "range_join",
    "grouped_percentiles",
    "window_running_sum",
    "events_sessionize",
    "events_tumbling",
    "text_quality_score",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "simhash",
    "ann_bruteforce_topk",
    "ann_hyperplane_lsh",
    "ann_ivf_topk",
    "neardup_embedding",
    "embedding_quantize_int8",
    "kmeans_clusters",
    "grouped_zscore",
    "multimodal_meta",
    "decontaminate_ngram",
    "data_mix_audit",
    "pack_sequences",
    "corpus_clean_funnel",
    "q8_market_share",
    "q21_waiting_suppliers",
    "customer_rfm_segments",
    "unigram_logprob_score",
    "source_quota",
    "tfidf_cosine_pairs",
    "dedup_incremental",
    "dedup_containment",
    "cms_frequency",
    "ann_ivf_multiprobe",
    "importance_sample",
    "events_attribution",
    "hll_multigrain_rollup",
    "grouped_mad_outliers",
]


def main() -> None:
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench")
    queries = entrymod.queries()

    # warm the JVM/codegen paths and the Python (Arrow/pandas) worker pool
    # outside the timed region — worker spawn is a per-session one-time cost
    spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    import pandas as pd  # noqa: F401

    spark.range(64, numPartitions=64).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # contention guard: a correctness pass or pytest run sharing this
    # local[32] box inflates timings ~3x (BENCH_r02 recorded simhash at
    # 2.96 s vs 0.98 s isolated). Record the 1-minute load at start; when
    # it exceeds half the cores, flag the record as contended so a reader
    # never mistakes scheduler noise for a regression.
    ncpus = os.cpu_count() or 1
    load1 = os.getloadavg()[0]
    contended = load1 > 0.5 * ncpus

    # three timed runs per query, median reported: strips scheduler/GC
    # jitter (local-mode runs show up to 3x run-to-run variance on
    # sub-second jobs) without letting one lucky cold run understate
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[1], 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    record = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "runs_per_query": 3,
        "stat": "median",
        "load1_at_start": round(load1, 2),
        "ncpus": ncpus,
    }
    if contended:
        record["warning"] = (
            f"system load {load1:.1f} > {0.5 * ncpus:.0f} at start - "
            "timings likely inflated by a concurrent job; rerun isolated"
        )
    print(json.dumps(record))


if __name__ == "__main__":
    main()
