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

    # two timed runs per query, min reported: strips scheduler/GC jitter
    # (local-mode runs show up to 3x run-to-run variance on sub-second jobs)
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
