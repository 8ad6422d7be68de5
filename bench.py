"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Isolation design (round 4): BENCH_r03's single-process sweep overstated
four queries by 4-16x (dedup_minhash_lsh recorded 31.28 s vs 1.90 s
isolated on the same commit/fixtures) — JVM/GC state accumulated across
44 queries x 3 runs poisons later timings. The sweep now runs in FRESH
SUBPROCESSES of at most CHUNK queries each, and any query whose chunked
median still exceeds OUTLIER_SEC is re-measured solo in its own fresh
JVM (the min of the two medians is reported; re-measured names are
listed under "re_measured"). Wall-clock cost is ~6 extra JVM startups —
cheap insurance for a trustworthy cross-round record.

Materialization is the ``noop`` sink (full computation, no driver
collect). A streaming drain-throughput metric (rows/s, availableNow
micro-batch drain of the two stateful streaming entries) runs in its own
subprocess and lands under "streaming".
"""

from __future__ import annotations

import json
import os
import subprocess
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
    "events_gap_fill",
    "grouped_percentiles",
    "grouped_percentiles_approx",
    "grouped_percentiles_distribution",
    "window_running_sum",
    "events_sessionize",
    "events_tumbling",
    "text_quality_score",
    "dedup_ngram_jaccard",
    "dedup_jaccard_prefix",
    "dedup_minhash_lsh",
    "dedup_substring_windows",
    "simhash",
    "semdedup",
    "temperature_mix",
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
    "dsir_importance",
    "source_quota",
    "tfidf_cosine_pairs",
    "dedup_incremental",
    "dedup_containment",
    "cms_frequency",
    "ann_ivf_multiprobe",
    "knn_join",
    "ann_index_knn_persisted",
    "ann_index_ivf_persisted",
    "incremental_pointer_latest",
    "importance_sample",
    "events_attribution",
    "hll_multigrain_rollup",
    "grouped_mad_outliers",
    "grouped_mad_outliers_approx",
    "graph_triangles",
    "association_rules",
    "rolling_active_users",
    "pareto_frontier",
    "key_skew_audit",
    "bloom_prefilter_semijoin",
    "bigram_logprob_score",
    "events_trend_theilsen",
    "price_psi_drift",
    "weighted_median_price",
    "histogram_equidepth",
    "event_path_topk",
    "order_reconciliation_audit",
    "distributed_global_rank",
    "join_cardinality_estimate",
    "hard_negative_mining",
    "ngram_novelty",
    "coreset_kcenter",
    "consistent_hash_rebalance",
    "dedup_threshold_sweep",
    "decontaminate_substring",
    "grouped_linreg",
    "embedding_batch_drift",
    "lsh_tuning_curve",
    "lsh_candidate_stats",
    "bm25_topk",
    "order_backlog_peaks",
    "training_shard_manifest",
    "ann_index_ivf_knn_batch",
    "curriculum_order",
    "vocab_oov_audit",
    "zorder_pruning_audit",
    "text_index_neardup_persisted",
    "hybrid_rrf_fusion",
    "bm25_dense_rerank",
    "embedding_random_projection",
    "token_zipf_fit",
    "decontaminate_embedding",
    "kn_bigram_score",
    # session-4 families: survival, rank statistics, time-series
    # diagnostics, graph BFS, token PMI, covariance partials
    "survival_kaplan_meier",
    "mann_whitney_u",
    "spearman_corr",
    "interarrival_expfit",
    "events_hopping",
    "graph_khop_reach",
    "token_pmi_topk",
    "embedding_covariance_topk",
    # round 11: BPE subword tokenizer (train + apply + packing twin),
    # real PNG pixel decode
    "bpe_vocab_train",
    "text_bpe_token_count",
    "pack_sequences_bpe",
    "data_mix_audit_bpe",
    "temperature_mix_bpe",
    "multimodal_pixels",
    # round 12: the 32-merge replace-chain twin (the r11 apply path,
    # kept measured next to the vocabulary-scale kernel), the
    # width-policy lifecycle audit (build narrow -> stale_width ->
    # widen -> cleared), and real WAV PCM16 sample decode
    "text_bpe_token_count_chain",
    "ann_index_width_policy",
    "multimodal_wav_samples",
]

STREAMING = [
    "stream_tumbling_windows",
    "stream_sessionize_stateful",
    "stream_window_champions",
]

CHUNK = 9          # queries per fresh-JVM subprocess
OUTLIER_SEC = 2.5  # chunked median above this -> solo re-measure
REGRESS_RATIO = 1.5  # chunked median >= ratio x previous record -> solo re-measure
# env-tunable for the sf1 soak (tools/soak_run.py): 100-second queries
# don't need median-of-3, and a chunk of them outgrows the default
# worker timeout
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
WORKER_TIMEOUT_S = int(os.environ.get("SPARK_GRAFT_BENCH_TIMEOUT_S", "1800"))


def _time_queries(names: list[str]) -> dict[str, float]:
    """Worker body: fresh SparkSession, warmup, RUNS timed runs per query,
    median reported. Runs inside one subprocess."""
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench-worker")
    queries = entrymod.queries()

    # warm the JVM/codegen paths and the Python (Arrow/pandas) worker pool
    # outside the timed region — worker spawn is a per-session one-time cost
    spark.read.parquet(f"{SF_DIR}/orders.parquet").count()
    import pandas as pd  # noqa: F401

    spark.range(64, numPartitions=64).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        runs = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(sorted(runs)[RUNS // 2], 3)
    return timings


def _stream_throughput() -> dict[str, dict]:
    """Worker body: drain each streaming entry once (availableNow) and
    report wall-clock + input rows/s. One drain per entry — streaming
    state-store setup dominates and a median-of-3 would triple the cost
    for a metric whose job is regression visibility, not microbenching."""
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark import get_spark
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.sources.tables import load_events
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench-stream")
    queries = entrymod.queries()
    rows_in = load_events(spark, SF_DIR).count()

    out: dict[str, dict] = {}
    for name in STREAMING:
        t0 = time.perf_counter()
        df = queries[name](spark, SF_DIR)
        n_out = df.count()
        sec = time.perf_counter() - t0
        out[name] = {
            "sec": round(sec, 3),
            "rows_in": rows_in,
            "rows_out": n_out,
            "rows_per_sec": round(rows_in / sec, 1),
        }
    return out


def _index_split() -> dict[str, dict]:
    """Worker body: build-vs-probe amortization for the three persisted
    -index headline queries (VERDICT r10 item 3: their registry walls are
    ~70-85% one-time build, so the flat number misrepresents production
    cost). One build + RUNS probes per family, fresh session; mirrors
    tools/ann_index_bench.py but lands in the committed bench record as
    build_sec/probe_sec next to the hermetic in-plan timing."""
    import tempfile

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark import get_spark
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.ann_index import (
        build_ann_index,
        knn_join_persisted,
    )
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.ivf_index import (
        build_ivf_index,
        ivf_topk_persisted,
    )
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.text_index import (
        build_text_index,
        neardup_text_persisted,
    )
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.similarity import (
        IVF_NPROBE,
    )
    from pyspark.sql import functions as F

    spark = get_spark(app_name="bench-index-split")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def t(fn) -> float:
        t0 = time.perf_counter()
        fn()
        return round(time.perf_counter() - t0, 3)

    def med(runs) -> float:
        return sorted(runs)[len(runs) // 2]

    out: dict[str, dict] = {}

    p = tempfile.mkdtemp(prefix="bench_ann_idx_")
    build = t(lambda: build_ann_index(emb, p))
    probes = [t(lambda: knn_join_persisted(spark, emb, p).count()) for _ in range(RUNS)]
    out["ann_index_knn_persisted"] = {"build_sec": build, "probe_sec": med(probes)}

    p = tempfile.mkdtemp(prefix="bench_ivf_idx_")
    build = t(lambda: build_ivf_index(emb, p))
    query = emb.filter(F.col("vec_id") == 0)
    probes = [
        t(
            lambda: ivf_topk_persisted(
                spark, p, query, nprobe=IVF_NPROBE, exclude_vec_id=0
            ).count()
        )
        for _ in range(RUNS)
    ]
    out["ann_index_ivf_persisted"] = {"build_sec": build, "probe_sec": med(probes)}

    p = tempfile.mkdtemp(prefix="bench_text_idx_")
    build = t(lambda: build_text_index(docs, p))
    probes = [t(lambda: neardup_text_persisted(spark, p).count()) for _ in range(RUNS)]
    out["text_index_neardup_persisted"] = {"build_sec": build, "probe_sec": med(probes)}

    # BPE is the same build-once/apply-many lifecycle: the apply-side
    # headline queries share the memoized table (bpe_vocab_train's own
    # headline wall retrains — r11 advice); the isolated training wall
    # (corpus contraction + top-W collect + merge loop) lands here too.
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans import bpe as B

    B._MERGES_MEMO.clear()
    build = t(lambda: B.trained_merges(spark, SF_DIR))
    applies = [
        t(
            lambda: B.q_text_bpe_token_count(spark, SF_DIR)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        for _ in range(RUNS)
    ]
    out["bpe_vocab_train"] = {"build_sec": build, "probe_sec": med(applies)}
    return out


def _run_worker(args: list[str]) -> dict:
    """Spawn this script in worker mode; parse the last JSON line of
    stdout (Spark chatter goes to stderr, but guard anyway)."""
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__)] + args,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        env=os.environ.copy(),
        timeout=WORKER_TIMEOUT_S,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"bench worker {args} rc={proc.returncode}")
    for line in reversed(proc.stdout.decode().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"bench worker {args}: no JSON line in stdout")


LOAD_GATE = 0.5      # load1 above this -> wait for quiet before measuring
#   (VERDICT r10 item 1: the old 2.0 gate let a load1-1.6 neighbor inflate
#   the committed record ~5%; the gate now waits for the same quiet bar
#   the tainted-record warning checks, so a flagged record means the wait
#   budget ran out, not that the gate never tried)
LOAD_WARN = 0.5      # load1 above this at start -> tainted-record warning
LOAD_WAIT_S = 900    # max seconds to wait for the machine to go quiet


def _wait_for_quiet() -> float:
    """Load gate (VERDICT r6 item 1: the r6 record was taken at load1
    2.99 and 'regressed' untouched queries 2-4x — an unfalsifiable
    cross-round comparison). If the machine is busy, wait up to
    LOAD_WAIT_S for load1 to drop below LOAD_GATE; always return the
    load at measurement start so the record carries it."""
    t0 = time.time()
    load1 = os.getloadavg()[0]
    while load1 > LOAD_GATE and time.time() - t0 < LOAD_WAIT_S:
        print(
            f"bench: load1 {load1:.2f} > {LOAD_GATE} - waiting for quiet "
            f"({int(time.time() - t0)}s)",
            file=sys.stderr,
        )
        time.sleep(30)
        load1 = os.getloadavg()[0]
    return load1


def main() -> None:
    ncpus = os.cpu_count() or 1
    load1 = _wait_for_quiet()
    contended = load1 > LOAD_WARN

    timings: dict[str, float] = {}
    chunks = [HEADLINE[i : i + CHUNK] for i in range(0, len(HEADLINE), CHUNK)]
    for chunk in chunks:
        timings.update(_run_worker(["--worker", ",".join(chunk)])["timings"])

    # solo re-measure anything that still looks slow, OR that regressed
    # >= REGRESS_RATIO vs the previous committed record (VERDICT r5
    # item 2: consistent_hash_rebalance recorded 2.09 s from chunk-batch
    # noise while the same-day solo/sweep number was ~1 s — an absolute
    # threshold alone misses sub-OUTLIER_SEC noise). A fresh JVM per
    # query is the ground truth the judge's isolated re-runs use.
    # Baseline = per-query MIN over the previous local record AND the
    # newest judged round record (ADVICE r6: comparing only against
    # BENCH_LOCAL_latest.json lets a committed slowdown self-baseline —
    # the >=1.5x trigger goes silent for ratcheting regressions; the
    # judged BENCH_rNN.json can't be rewritten by this run).
    here = os.path.dirname(os.path.abspath(__file__))
    prev: dict[str, float] = {}
    import glob as _glob

    candidates = [os.path.join(here, "BENCH_LOCAL_latest.json")]
    candidates += sorted(_glob.glob(os.path.join(here, "BENCH_LOCAL_r[0-9][0-9].json")))
    round_records = sorted(_glob.glob(os.path.join(here, "BENCH_r[0-9][0-9].json")))
    if round_records:
        candidates.append(round_records[-1])
    sf_now = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    for path in candidates:
        try:
            with open(path) as f:
                rec = json.load(f)
        except (OSError, ValueError):
            continue
        # only same-SF records are comparable (the scaling sweep rewrites
        # BENCH_LOCAL_latest.json at each SF in turn — an sf0.001 record
        # must not become the regression baseline for the sf0.01 leg)
        if str(rec.get("sf", "")) != sf_now:
            continue
        qs = rec.get("queries") or rec.get("parsed", {}).get("queries") or {}
        for k, v in qs.items():
            if isinstance(v, (int, float)):
                prev[k] = min(prev[k], v) if k in prev else v
    re_measured = []
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1]):
        regressed = name in prev and prev[name] > 0.2 and sec >= REGRESS_RATIO * prev[name]
        if sec > OUTLIER_SEC or regressed:
            solo = _run_worker(["--worker", name])["timings"][name]
            if solo < sec:
                timings[name] = solo
            re_measured.append(name)

    streaming = _run_worker(["--stream"])["stream"]
    index_amortization = _run_worker(["--index-split"])["index_split"]

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    record = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "runs_per_query": RUNS,
        "stat": "median",
        "isolation": f"fresh subprocess per <= {CHUNK} queries",
        "re_measured": re_measured,
        "streaming": streaming,
        "index_amortization": index_amortization,
        "load1_at_start": round(load1, 2),
        "ncpus": ncpus,
    }
    if contended:
        record["warning"] = (
            f"system load {load1:.1f} > {LOAD_WARN} at start - "
            "timings likely inflated by a concurrent job; rerun isolated"
        )

    # Record transport (VERDICT r4 item 1): the full per-query dict outgrew
    # the driver's tail-capture window at 71 queries (BENCH_r04 came back
    # "parsed": null). The FULL record goes to a committed file; the LAST
    # stdout line is a compact summary (total, sf, worst-5) that always
    # fits a 2 KB tail.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL_latest.json"
    )
    with open(full_path, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    worst5 = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    summary = {
        "metric": record["metric"],
        "value": record["value"],
        "unit": "sec",
        "queries": worst5,
        "queries_shown": "worst 5 of full set",
        "n_queries": len(timings),
        "sf": record["sf"],
        "runs_per_query": RUNS,
        "stat": "median",
        "isolation": record["isolation"],
        "streaming_total_sec": round(
            sum(v["sec"] for v in streaming.values()), 3
        ),
        "full_record": "BENCH_LOCAL_latest.json",
    }
    if contended:
        summary["warning"] = record["warning"]
    print(json.dumps(summary, separators=(",", ":")))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        print(json.dumps({"timings": _time_queries(sys.argv[2].split(","))}))
    elif len(sys.argv) > 1 and sys.argv[1] == "--stream":
        print(json.dumps({"stream": _stream_throughput()}))
    elif len(sys.argv) > 1 and sys.argv[1] == "--index-split":
        print(json.dumps({"index_split": _index_split()}))
    else:
        main()
