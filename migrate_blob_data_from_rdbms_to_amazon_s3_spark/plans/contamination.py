"""Benchmark decontamination + boilerplate detection — the two n-gram
audits every pretraining corpus runs before training.

- ``decontaminate_ngram`` — flag training documents that share any word
  3-gram with a held-out benchmark corpus (the classic eval-leakage
  check). The benchmark here is the ``src0`` slice of ``documents``; in
  production it is the eval sets themselves.
- ``ngram_topk`` — per-language document-frequency top-k n-grams: the
  boilerplate/stop-phrase detector that feeds MAX_POSTING_DF-style caps
  (see plans/dedup.py) and cleaning rules.

Both reuse the dedup family's shingle machinery (identical tokenization;
shingles shuffle as native xxhash64 ints — the hash stays engine-internal
on both sides, the oracle hashes its own shingles, so only within-engine
injectivity matters) so all four n-gram operators agree on what an
n-gram is. Shuffle shape:

- decontaminate: the benchmark's distinct shingle-hash set is tiny
  relative to the corpus (eval sets are MBs, corpora are TBs) — Catalyst/
  AQE broadcasts it, making contamination a map-side semi-join over the
  exploded training shingles followed by one (doc_id) count shuffle. No
  pair join exists anywhere.
- ngram_topk: one (lang, shingle) count shuffle with map-side partial
  aggregation, then a per-lang top-k window over the already-aggregated
  (distinct-ngram-sized) table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .dedup import (
    _SHINGLES_DUCK,
    _SHINGLES_SPARK,
    SUBSTR_STRIDE,
    SUBSTR_W,
    _barrier,
    _docs,
    _h60_duck,
)

BENCH_SOURCE = "src0"  # fixture stand-in for the held-out eval corpus
NGRAM_TOPK = 5


def _shingled(spark, sf_dir):
    raw = (
        _docs(spark, sf_dir)
        .withColumn("toks", F.split("text", " "))
        .withColumn("sh", F.expr(_SHINGLES_SPARK))
        .withColumn("sh60", F.expr("transform(sh, s -> xxhash64(s))"))
    )
    # doc_id is the PK, so widening the barrier key with (lang, source) is
    # exact and saves a join back for the source column
    return _barrier(raw, ["doc_id", "lang", "source"], ["sh", "sh60"])


def q_decontaminate_ngram(spark, sf_dir):
    """Training docs (source != BENCH_SOURCE) sharing >= 1 word-3-gram
    with the benchmark slice; n_hits = distinct contaminated 3-grams.
    A doc with no overlap is absent (clean)."""
    d = _shingled(spark, sf_dir)
    bench = (
        d.filter(F.col("source") == BENCH_SOURCE)
        .select(F.explode("sh60").alias("s"))
        .distinct()
    )
    train = d.filter(F.col("source") != BENCH_SOURCE).select(
        "doc_id", F.explode("sh60").alias("s")
    )
    # semi-join against the (small) benchmark shingle set; per-doc shingles
    # are already distinct (array_distinct inside the shingle expression)
    return (
        train.join(bench, "s")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


def q_decontaminate_substring(spark, sf_dir):
    """Exact-substring eval-leakage check: training docs sharing any
    SUBSTR_W-char window (every SUBSTR_STRIDE chars) with the benchmark
    slice — the stricter sibling of the 3-gram check (catches verbatim
    quotes even when tokenization differs; any shared exact span of
    length >= W + STRIDE - 1 has an aligned window in both docs, the
    dedup_substring_windows recall bound). n_hits = distinct shared
    window fingerprints.

    Plan: windows shuffle as engine-internal xxhash64 ints (the oracle
    joins its own character windows, so only within-engine injectivity
    matters); the benchmark's distinct fingerprint set is eval-sized —
    tiny next to the corpus — so AQE broadcasts it and contamination is
    a map-side semi-join plus one (doc_id) count shuffle. Same shape as
    the 3-gram check; no pair stage anywhere."""
    from .dedup import SUBSTR_STRIDE, SUBSTR_W

    wins_expr = (
        f"array_distinct(transform("
        f"sequence(1, length(text) - {SUBSTR_W} + 1, {SUBSTR_STRIDE}), "
        f"p -> xxhash64(substring(text, p, {SUBSTR_W}))))"
    )
    docs = (
        _docs(spark, sf_dir)
        .filter(F.length("text") >= SUBSTR_W)
        .withColumn("whs", F.expr(wins_expr))
    )
    d = _barrier(docs, ["doc_id", "source"], ["whs"])
    bench = (
        d.filter(F.col("source") == BENCH_SOURCE)
        .select(F.explode("whs").alias("wh"))
        .distinct()
    )
    train = d.filter(F.col("source") != BENCH_SOURCE).select(
        "doc_id", F.explode("whs").alias("wh")
    )
    return (
        train.join(bench, "wh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


def q_ngram_topk(spark, sf_dir):
    """Per-language top-NGRAM_TOPK word 3-grams by document frequency
    (ties broken lexicographically) — the boilerplate detector."""
    from pyspark.sql import Window

    d = _shingled(spark, sf_dir)
    df_counts = (
        d.select("lang", F.explode("sh").alias("ngram"))
        .groupBy("lang", "ngram")
        .agg(F.count("*").alias("df"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("df"), "ngram")
    return (
        df_counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= NGRAM_TOPK)
        .select("lang", "ngram", "df", "rank")
    )


DECON_EVAL_MOD = 17  # vec_id % MOD == 0 marks the held-out eval set
DECON_COSINE = 0.3   # looser than NEARDUP_COSINE: contamination screens favor recall


def q_decontaminate_embedding(spark, sf_dir):
    """SEMANTIC eval-set decontamination: training vectors whose cosine
    to ANY held-out eval vector (vec_id % DECON_EVAL_MOD == 0 — a
    deterministic stand-in for the benchmark registry) reaches the
    contamination threshold (looser than the near-dup cut: a screen
    prefers false flags over missed leakage), each with its best-matching eval item. This is
    the embedding-level complement of decontaminate_ngram/_substring:
    paraphrased or reformatted benchmark leakage that shares no n-gram
    still collides in embedding space (the SemDeDup observation, Abbas
    et al. 2023, applied to train x eval instead of train x train).

    Candidates come from the SAME corpus-derived multi-probe sign-LSH
    index every similarity consumer uses (`_knn_scored_pairs`) — never
    a train x eval cross join — and ONLY the eval slice probes it
    (``probe_filter``): a candidate pair exists iff an eval vector's
    multi-probe keys hit it, so probe work is |eval|·tables·probes, a
    1/DECON_EVAL_MOD fraction of the corpus-wide probe (the round-10
    sf1 soak measured the probe-everything form at 11x/decade for
    candidates the train x eval filter then discarded; eval-only
    probing is the plan you want at 100 TB, where eval sets are MBs).
    The threshold filter lands on the id-only candidate set before
    re-attachment, and the top-1 window runs over per-vector candidate
    groups. The persisted-index production form (operators/ann_index)
    composes the same way via the sigs/exact injection seam."""
    from .similarity import _emb, _knn_scored_pairs

    scored = _knn_scored_pairs(
        _emb(spark, sf_dir),
        probe_filter=F.col("vec_id") % DECON_EVAL_MOD == 0,
    )
    return decon_from_scored(scored)


def decon_from_scored(scored):
    """(vec_id, eval_id, score) flagged-train rows from a directed
    scored-pair frame — the probe-independent half of the embedding
    decontamination, shared by the in-plan query and the persisted-index
    twin (plans/ann_index_entries.q_ann_index_decon_persisted)."""
    from .similarity import Window

    hits = scored.filter(
        (F.col("vec_a") % DECON_EVAL_MOD != 0)
        & (F.col("vec_b") % DECON_EVAL_MOD == 0)
        & (F.col("score") >= DECON_COSINE)
    )
    w = Window.partitionBy("vec_a").orderBy(F.desc("score"), "vec_b")
    return (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("vec_a").alias("vec_id"),
            F.col("vec_b").alias("eval_id"),
            "score",
        )
        .orderBy("vec_id")
    )


def _decon_embedding_oracle() -> str:
    from .similarity import _knn_cte

    return f"""
        WITH {_knn_cte(f"WHERE vec_id % {DECON_EVAL_MOD} = 0", f"WHERE vec_a % {DECON_EVAL_MOD} != 0 AND vec_b % {DECON_EVAL_MOD} = 0 AND score >= {DECON_COSINE}")}
        SELECT vec_a AS vec_id, vec_b AS eval_id, score
        FROM knn WHERE nn_rank = 1
        ORDER BY vec_id
    """


QUERIES = {
    "decontaminate_embedding": q_decontaminate_embedding,
    "decontaminate_ngram": q_decontaminate_ngram,
    "decontaminate_substring": q_decontaminate_substring,
    "ngram_topk": q_ngram_topk,
}

_SH_T = f"""
        sh_t AS (
            SELECT doc_id, lang, source, {_SHINGLES_DUCK} AS sh
            FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS toks
                  FROM documents)
        )
"""

ORACLES = {
    "decontaminate_embedding": _decon_embedding_oracle(),
    "decontaminate_ngram": f"""
        WITH {_SH_T},
        hashed AS (
            SELECT doc_id, source,
                   list_transform(sh, s -> {_h60_duck('s')}) AS hs
            FROM sh_t
        ),
        bench AS (
            SELECT DISTINCT u.s FROM hashed,
                   LATERAL (SELECT UNNEST(hs) AS s) u
            WHERE source = '{BENCH_SOURCE}'
        ),
        train AS (
            SELECT doc_id, u.s FROM hashed,
                   LATERAL (SELECT UNNEST(hs) AS s) u
            WHERE source != '{BENCH_SOURCE}'
        )
        SELECT t.doc_id, COUNT(*) AS n_hits
        FROM train t JOIN bench b ON t.s = b.s
        GROUP BY t.doc_id
    """,
    "decontaminate_substring": f"""
        WITH wins AS (
            SELECT DISTINCT doc_id, source, u.w
            FROM (
                SELECT doc_id, source,
                       list_transform(
                           generate_series(1, length(text) - {SUBSTR_W} + 1, {SUBSTR_STRIDE}),
                           p -> substr(text, p, {SUBSTR_W})) AS ws
                FROM documents
                WHERE length(text) >= {SUBSTR_W}
            ), LATERAL (SELECT UNNEST(ws) AS w) u
        ),
        bench AS (
            SELECT DISTINCT w FROM wins WHERE source = '{BENCH_SOURCE}'
        ),
        train AS (
            SELECT doc_id, w FROM wins WHERE source != '{BENCH_SOURCE}'
        )
        SELECT t.doc_id, COUNT(*) AS n_hits
        FROM train t JOIN bench b USING (w)
        GROUP BY t.doc_id
    """,
    "ngram_topk": f"""
        WITH {_SH_T},
        exploded AS (
            SELECT lang, u.ngram FROM sh_t,
                   LATERAL (SELECT UNNEST(sh) AS ngram) u
        ),
        counted AS (
            SELECT lang, ngram, COUNT(*) AS df
            FROM exploded GROUP BY lang, ngram
        )
        SELECT lang, ngram, df, CAST(rank AS INT) AS rank FROM (
            SELECT lang, ngram, df,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY df DESC, ngram) AS rank
            FROM counted
        ) WHERE rank <= {NGRAM_TOPK}
    """,
}
