"""Soak measurement at the synthesized sf1 decade (tools/make_soak_data).

Reuses bench.py's isolation protocol exactly — fresh subprocess per
<=CHUNK queries, median of RUNS, solo re-measure of chunked outliers —
so per-query ratios against the committed sf0.1 record are
apples-to-apples. Writes SOAK_raw_sf1.json at the repo root.

Usage: python tools/soak_run.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SOAK_QUERIES = [
    # embedding / LSH family (the round-6/7 scaling claims)
    "knn_join", "hard_negative_mining", "neardup_embedding", "semdedup",
    "lsh_candidate_stats", "lsh_tuning_curve", "ann_ivf_topk",
    "ann_ivf_multiprobe", "coreset_kcenter", "kmeans_clusters",
    "embedding_batch_drift", "ann_index_knn_persisted",
    "ann_index_ivf_persisted", "ann_index_neardup_incremental",
    "ann_index_ivf_knn_batch", "training_shard_manifest",
    # text / dedup family
    "dedup_minhash_lsh", "dedup_threshold_sweep", "dedup_ngram_jaccard",
    "dedup_containment", "tfidf_cosine_pairs", "bigram_logprob_score",
    "unigram_logprob_score", "ngram_novelty", "corpus_clean_funnel",
    "quality_percentile_filter", "decontaminate_ngram", "bm25_topk",
    # quantile family (the round-7 distribution-method conversions)
    "grouped_percentiles", "grouped_percentiles_approx",
    "grouped_percentiles_distribution", "weighted_median_price",
    "histogram_equidepth", "winsorized_stats", "customer_rfm_segments",
    "session_length_stats", "revenue_gini", "price_qq_drift",
    "text_length_percentiles",
    # relational / graph / window
    "graph_triangles", "association_rules", "grouped_linreg",
    "distributed_global_rank", "window_running_sum", "q1_pricing_summary",
    "q21_waiting_suppliers", "events_sessionize",
    # round 11: the spearman fusion + the BPE family + PNG pixel decode
    "spearman_corr", "bpe_vocab_train", "text_bpe_token_count",
    "pack_sequences_bpe", "data_mix_audit_bpe", "multimodal_pixels",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_soak/sf1"
    names = sys.argv[2:] or SOAK_QUERIES
    os.environ["SPARK_GRAFT_SF_DIR"] = sf_dir
    # 100-second queries: 2 runs (min-noise is proportionally small at
    # this duration), chunks sized so a heavy chunk fits the timeout
    os.environ.setdefault("SPARK_GRAFT_BENCH_RUNS", "2")
    os.environ.setdefault("SPARK_GRAFT_BENCH_TIMEOUT_S", "3600")

    import bench

    bench.SF_DIR = sf_dir
    bench.CHUNK = 5
    # at sf1 most queries exceed the sf0.1 outlier bar; solo re-measure
    # only the heavyweights (where cross-query JVM pollution distorts most)
    bench.OUTLIER_SEC = 30.0
    load1 = bench._wait_for_quiet()
    timings: dict[str, float] = {}
    chunks = [names[i : i + bench.CHUNK] for i in range(0, len(names), bench.CHUNK)]
    for chunk in chunks:
        timings.update(bench._run_worker(["--worker", ",".join(chunk)])["timings"])
        print(json.dumps({k: timings[k] for k in chunk}), flush=True)

    re_measured = []
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        if sec > bench.OUTLIER_SEC:
            solo = bench._run_worker(["--worker", name])["timings"][name]
            if solo < sec:
                timings[name] = solo
            re_measured.append(name)
            print(json.dumps({"solo": {name: timings[name]}}), flush=True)

    record = {
        "sf_dir": sf_dir,
        "sf": "1 (synthesized, tools/make_soak_data.py)",
        "queries": timings,
        "value": round(sum(timings.values()), 3),
        "runs_per_query": bench.RUNS,
        "stat": "median",
        "isolation": f"fresh subprocess per <= {bench.CHUNK} queries",
        "re_measured": re_measured,
        "load1_at_start": round(load1, 2),
        "ncpus": os.cpu_count(),
    }
    with open(os.path.join(HERE, "SOAK_raw_sf1.json"), "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(json.dumps({"total_sec": record["value"], "n": len(timings)}))


if __name__ == "__main__":
    main()
