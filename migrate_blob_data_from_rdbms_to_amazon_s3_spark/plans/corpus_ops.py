"""Corpus-construction operators round 3: unigram LM scoring, embedding
outlier detection, stratified downsampling, and per-source quota
enforcement — the mixing/filtering stages a training-data pipeline runs
after dedup/decontamination (no reference analog; LLM-pipeline extension
like plans/quality.py).

All JVM-side; every operator has a DuckDB value oracle. Shuffle budget
per operator is named in its docstring — each is a shape that survives
100 TB (token-grain aggregation with map-side combine, broadcast scalar
stats, salted two-phase per-key top-K).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.quantiles import distribution_quantiles_duck

# per-language keep-rates (percent) for the stratified downsampler: the
# high-resource languages get downsampled, the tail kept — the standard
# corpus-mixing move. Shared verbatim with the oracle CASE.
STRATA_RATES = {"en": 20, "zh": 35, "de": 50, "fr": 50, "es": 50}
STRATA_DEFAULT_RATE = 80

SOURCE_QUOTA = 40  # max docs kept per source
QUOTA_SALT = 16  # phase-1 shards per source (bounds any hot source's sort)

OUTLIER_TOPK = 10
EMB_DIM = 64


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def _doc_tokens(spark, sf_dir):
    """(doc_id, tok) exploded whitespace tokens — the token-grain view the
    unigram model both trains and scores on. Narrow (explode is pipelined
    into the scan; no shuffle until an aggregation asks for one)."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )


def _unigram_doc_scores(spark, sf_dir, score_name: str):
    """(doc_id, n_tokens, <score_name>) per-doc mean -ln p under the
    corpus's own unigram LM. The vocab table is materialized once
    (``localCheckpoint``): its token-grain aggregation otherwise re-plans
    for every consumer (the scalar total AND the score join), doubling
    the most expensive shuffle in the DAG — Zipf bounds vocab to millions
    of rows at 100 TB, so the materialization is small while the avoided
    re-aggregation is corpus-sized (at scale: persist() or a staging
    table, the tfidf_cosine_pairs discipline)."""
    toks = _doc_tokens(spark, sf_dir)
    vocab = (
        toks.groupBy("tok").agg(F.count("*").alias("c")).localCheckpoint(eager=True)
    )
    total = vocab.agg(F.sum("c").alias("t"))
    scored_vocab = vocab.crossJoin(F.broadcast(total)).select(
        "tok", (-F.log(F.col("c") / F.col("t"))).alias("neg_logp")
    )
    return (
        toks.join(scored_vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("neg_logp"), 3).alias(score_name),
        )
    )


def q_unigram_logprob(spark, sf_dir):
    """Unigram-LM fluency score: train token frequencies on the corpus
    itself (one token-grain aggregation, map-side combine), then score
    every document by its mean negative log-probability — the cheap
    perplexity proxy quality filters threshold on (high avg -ln p =
    rare/garbled tokens). Shuffles: vocab agg on tok (materialized once —
    see _unigram_doc_scores), score join on tok, doc agg on doc_id — all
    equi-key, combiner-friendly; the scalar token total is a broadcast.
    Zipf bounds the vocab table, so at 100 TB the join side stays
    millions of rows, not corpus-sized."""
    return _unigram_doc_scores(spark, sf_dir, "avg_neg_logprob")


def q_quality_percentile_filter(spark, sf_dir):
    """Dynamic-threshold quality filter: drop the worst quartile of
    documents by unigram-LM score (highest avg -ln p = least fluent),
    with the threshold derived FROM the corpus itself, broadcast back as
    a scalar cut (the same no-global-sort shape as customer_rfm_segments;
    a rank/ntile formulation would single-partition every document).

    Round 7: the cut comes from the COUNT-DISTRIBUTION method
    (functions/quantiles). The score is not an arbitrary float — it is
    DEFINED as ``round(avg -ln p, 3)``, a milli-grain domain by
    construction (the previous "no fixed grain" claim was stale), so the
    exact quantile needs no per-group buffering: scale=1000 quantization,
    distributed prefix sum, straddle+interpolate. With p=0.75 the
    grain-space interpolation factor h ∈ {0, .25, .5, .75} — exact binary
    fractions times integer grains — so the cut double is exactly
    representable and the ``<=`` comparison (integer grains vs grain cut)
    can never be decided by an ulp in either engine.
    The per-doc score table is materialized once: both the cut-point
    aggregate and the per-language report read it, and without the
    barrier the whole token->vocab->score DAG re-plans (and re-executes)
    per consumer — doc-grain, so the materialization is corpus-row-sized,
    not token-sized. Report: per-language total/kept/kept-token mass —
    the audit a corpus build logs when it applies the filter."""
    from ..functions.quantiles import distribution_quantiles

    doc_scores = _unigram_doc_scores(spark, sf_dir, "score").localCheckpoint(
        eager=True
    )
    cut = distribution_quantiles(
        doc_scores, None, "score", (0.75,), scale=1000, grain_space=True
    ).select(F.col("q0").alias("cut"))
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    kept = F.round(F.col("score") * 1000) <= F.col("cut")
    return (
        doc_scores.crossJoin(F.broadcast(cut))
        .join(docs, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept.cast("int")).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_tokens")).otherwise(0)).alias("tokens_kept"),
        )
    )


VOCAB_V = 1000  # vocabulary size for the OOV coverage audit


def q_vocab_oov_audit(spark, sf_dir):
    """Tokenizer-coverage audit: fix the vocabulary at the corpus's top
    VOCAB_V tokens by frequency (ties broken on the token, so the
    boundary is deterministic) and report per source: token mass, OOV
    token mass, OOV rate, and distinct OOV types — the first number a
    tokenizer/vocab decision reads per data source before training
    (type-token coverage per Zipf's law; Heaps' law governs the tail).

    Scale: the vocab candidate table is the token-grain aggregation
    (map-side combine; Zipf-bounded rows), the top-V cut is a
    TakeOrdered (V rows, never a global sort of the corpus), and the
    V-row vocab broadcasts back to the token stream — one corpus-sized
    shuffle total (the vocab agg), everything else bounded."""
    toks = _doc_tokens(spark, sf_dir)
    vocab_top = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(VOCAB_V)
        .select("tok", F.lit(1).alias("in_vocab"))
    )
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    flagged = (
        toks.join(F.broadcast(vocab_top), "tok", "left")
        .join(docs, "doc_id")
        .select(
            "source",
            "tok",
            F.coalesce("in_vocab", F.lit(0)).alias("iv"),
        )
    )
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.lit(1) - F.col("iv")).alias("n_oov_tokens"),
        F.round(F.try_divide(F.sum(F.lit(1) - F.col("iv")), F.count("*")), 4).alias(
            "oov_rate"
        ),
        F.count_distinct(F.when(F.col("iv") == 0, F.col("tok"))).alias(
            "n_oov_types"
        ),
    )


CURR_BUCKETS = 4  # difficulty quartiles for the curriculum schedule
CURR_SUBS = 1 << 8  # coin shards per bucket: rank windows hold n/1024, never n/4


def q_curriculum_order(spark, sf_dir):
    """Curriculum training order (Bengio et al., ICML 2009): every doc
    gets a deterministic global position that anneals easy → hard.
    Difficulty = the corpus's own unigram-LM fluency score (low mean
    -ln p = fluent = easy), cut into CURR_BUCKETS quartiles by the
    count-distribution quantile method; WITHIN a quartile the order is a
    deterministic md5 coin, so no source/topic run survives into the
    training stream (the same coin discipline as dataset_split).

    Scale: the same distributed-rank shape as q_distributed_global_rank,
    but the rank window partitions on (bucket, coin-shard) — the shard is
    the coin's top 8 bits, so (bucket, shard, coin) ordering equals
    (bucket, coin) ordering and the 1024 balanced windows compose into
    one exact global rank via a 1024-row prefix-sum broadcast. No
    corpus-sized window partition anywhere; the naive global ROW_NUMBER
    is the oracle only."""
    from ..functions.quantiles import distribution_quantiles

    doc_scores = _unigram_doc_scores(spark, sf_dir, "score").localCheckpoint(
        eager=True
    )
    ps = tuple(i / CURR_BUCKETS for i in range(1, CURR_BUCKETS))
    cuts = distribution_quantiles(
        doc_scores, None, "score", ps, scale=1000, grain_space=True
    ).select(F.array(*[F.col(f"q{i}") for i in range(len(ps))]).alias("cuts"))
    bucketed = (
        doc_scores.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            # number of quartile cuts strictly below this doc's grain —
            # 0 = easiest quartile; equal grains share a bucket
            F.expr(
                "aggregate(cuts, 0, (acc, c) -> "
                "acc + IF(CAST(round(score * 1000) AS DOUBLE) > c, 1, 0))"
            ).alias("bucket"),
            F.expr(
                "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10)"
                " AS BIGINT)"
            ).alias("coin"),
        )
        .withColumn("coin_shard", F.expr(f"coin div {1 << 52}"))
    )
    counts = bucketed.groupBy("bucket", "coin_shard").agg(F.count("*").alias("n"))
    prev = counts.select(
        F.col("bucket").alias("pb"), F.col("coin_shard").alias("psub"), F.col("n").alias("pn")
    )
    offsets = (
        counts.join(
            F.broadcast(prev),
            (F.col("pb") < F.col("bucket"))
            | ((F.col("pb") == F.col("bucket")) & (F.col("psub") < F.col("coin_shard"))),
            "left",
        )
        .groupBy("bucket", "coin_shard")
        .agg(F.coalesce(F.sum("pn"), F.lit(0)).alias("offset"))
    )
    w = Window.partitionBy("bucket", "coin_shard").orderBy("coin", "doc_id")
    return bucketed.join(F.broadcast(offsets), ["bucket", "coin_shard"]).select(
        "doc_id",
        "bucket",
        (F.col("offset") + F.row_number().over(w)).alias("curriculum_rank"),
    )


def q_embedding_outliers(spark, sf_dir):
    """Embedding-space outlier report: the OUTLIER_TOPK vectors farthest
    (L2) from the corpus centroid — the audit that surfaces corrupt /
    off-distribution embeddings before they poison ANN indexes or
    clustering. Centroid = per-dimension mean (posexplode + (pos) agg —
    k*dim output, rounded 4 so cross-engine summation can't drift),
    broadcast back as a 1-row array; distances are a narrow projection;
    top-k plans as TakeOrdered (no global sort)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    centroid = (
        emb.select(F.posexplode("embedding").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.round(F.avg("v"), 4).alias("m"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), s -> s.m)"
            ).alias("cv")
        )
    )
    dist = (
        "round(sqrt(aggregate(zip_with(embedding, cv, (x, y) -> "
        "(CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        "0D, (acc, v) -> acc + v)), 6)"
    )
    return (
        emb.crossJoin(F.broadcast(centroid))
        .select("vec_id", F.expr(dist).alias("centroid_dist"))
        .orderBy(F.desc("centroid_dist"), "vec_id")
        .limit(OUTLIER_TOPK)
    )


def _rate_case_spark():
    col = F.col("lang")
    expr = None
    for lang, rate in STRATA_RATES.items():
        expr = (
            F.when(col == lang, rate)
            if expr is None
            else expr.when(col == lang, rate)
        )
    return expr.otherwise(STRATA_DEFAULT_RATE)


def q_stratified_sample(spark, sf_dir):
    """Stratified downsampling audit: deterministic per-language keep
    rates (STRATA_RATES — downsample high-resource languages, keep the
    tail) applied by hashing the document key into 100 buckets; a doc is
    kept iff its bucket < the language's rate. No RNG, no sampleBy — the
    same example set survives reruns, engine swaps, and repartitioning
    (the property dataset_split relies on too). Report: per-language
    total/kept/achieved-rate. One combiner-friendly shuffle to the lang
    grain; the keep decision is map-side."""
    docs = _docs(spark, sf_dir)
    bucket = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"
    )
    kept = bucket < _rate_case_spark()
    return (
        docs.select("lang", kept.cast("int").alias("kept"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("kept").alias("n_kept"),
            F.round(F.sum("kept") / F.count("*"), 4).alias("kept_frac"),
        )
    )


# importance sampling: inclusion probability ∝ length, capped at 1; the
# normalizer is a fixed constant so the keep decision stays map-side (no
# extra pass to learn a max/median).
IMPORTANCE_NORM_CHARS = 1000.0


def q_importance_sample(spark, sf_dir):
    """Importance (weighted) sampling with Horvitz-Thompson reweighting —
    the data-mixing primitive: keep doc i with probability
    p_i = min(1, n_chars/NORM) (longer docs carry more tokens per row, so
    sample them preferentially), and weight every kept doc by 1/p_i so
    downstream statistics stay unbiased. The keep decision is the same
    deterministic md5-bucket coin as stratified_sample/dataset_split — no
    RNG, identical sample under reruns, engine swaps, repartitioning.

    Report per language: population, kept count, achieved rate, and the
    HT population estimate Σ_kept 1/p_i — which must land near n_docs;
    that closeness IS the unbiasedness self-check, value-verified against
    the oracle. One combiner-friendly shuffle; everything row-wise is
    map-side."""
    docs = _docs(spark, sf_dir)
    p = F.least(F.lit(1.0), F.col("n_chars") / F.lit(IMPORTANCE_NORM_CHARS))
    u = (
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 10000"
        )
        / 10000.0
    )
    kept = u < p
    return (
        docs.select("lang", p.alias("p"), kept.alias("kept"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("kept").cast("int")).alias("n_kept"),
            F.round(F.sum(F.col("kept").cast("int")) / F.count("*"), 4).alias(
                "kept_frac"
            ),
            F.round(F.sum(F.when(F.col("kept"), 1.0 / F.col("p"))), 2).alias(
                "ht_estimate"
            ),
        )
    )


def q_source_quota(spark, sf_dir):
    """Per-source quota enforcement: keep at most SOURCE_QUOTA docs per
    source, preferring longer documents (n_chars DESC, doc_id tiebreak) —
    the per-domain cap that stops one crawl domain from dominating the
    mix. Two-phase top-K so a hot source never single-sorts its whole
    group at 100 TB: phase 1 ranks within (source, doc_id % QUOTA_SALT)
    shards and keeps each shard's top SOURCE_QUOTA (any global top-K row
    is top-K within its shard, so pruning is lossless); phase 2 ranks the
    <= QUOTA_SALT * SOURCE_QUOTA survivors per source. The oracle is the
    direct single-window top-K — identical output, different (scale-safe)
    plan. Report: per-source kept count + kept chars."""
    docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    order = [F.desc("n_chars"), F.asc("doc_id")]
    w1 = Window.partitionBy("source", F.col("doc_id") % QUOTA_SALT).orderBy(*order)
    phase1 = (
        docs.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= SOURCE_QUOTA)
        .drop("rn1")
    )
    w2 = Window.partitionBy("source").orderBy(*order)
    kept = (
        phase1.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= SOURCE_QUOTA)
    )
    return kept.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum("n_chars").alias("chars_kept"),
    )


TFIDF_MAX_DF = 64  # posting cap, same rationale as dedup.MAX_POSTING_DF
TFIDF_THRESHOLD = 0.15
TFIDF_MIN_COMMON = 2

# word-bigram terms: the fixture's unigram vocabulary is a dense ~31 words
# (every term hot), while bigrams are Zipf-ish (906/916 in the df 2..64
# band at sf0.01) — the term granularity a real TF-IDF index wants anyway
_BIGRAMS_SPARK = (
    "CASE WHEN size(toks) >= 2 THEN transform(sequence(1, size(toks) - 1), "
    "i -> concat_ws(' ', toks[i-1], toks[i])) ELSE array() END"
)


def q_tfidf_cosine_pairs(spark, sf_dir):
    """Sparse TF-IDF cosine near-dup pairs — the weighted complement of
    the dense embedding cosine (plans/similarity.py) and the unweighted
    shingle Jaccard (plans/dedup.py): document pairs whose TF-IDF
    bigram-term vectors have cosine >= TFIDF_THRESHOLD, with candidates
    generated by the inverted term index (postings join on the term),
    never a pair join.

    Plan: one (doc, term) aggregation builds term frequencies; document
    frequencies re-aggregate it; idf = ln(N/df) with the scalar N
    broadcast. The postings join carries (doc_id, weight) only; postings
    hotter than TFIDF_MAX_DF docs are dropped before any pair exists
    (low-idf terms contribute ~nothing to cosine — the exact-mirrored cap
    that bounds Σ|posting|² on adversarial corpora). Norms are computed
    over the FULL vector (including capped terms) and re-attach to the
    deduped pair aggregate by two linear joins. All shuffles equi-key,
    combiner-friendly; Python never touches rows. The bigram array is
    materialized behind the dedup barrier so CollapseProject can't
    re-evaluate it per exploded row."""
    from .dedup import _barrier

    raw = (
        _docs(spark, sf_dir)
        .withColumn("toks", F.expr(r"filter(split(trim(text), '\\s+'), t -> t != '')"))
        .withColumn("grams", F.expr(_BIGRAMS_SPARK))
    )
    toks = _barrier(raw, ["doc_id"], ["grams"]).select(
        "doc_id", F.explode("grams").alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tfc"))
    df = tf.groupBy("tok").agg(F.count("*").alias("dfc"))
    n_docs = toks.select("doc_id").distinct().select(
        F.count("*").alias("n_docs")
    )
    w = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            "dfc",
            (F.col("tfc") * F.log(F.col("n_docs") / F.col("dfc"))).alias("w"),
        )
        # materialize once: norms and BOTH posting join sides read this
        # table — un-truncated, the whole tf/df/idf DAG plans 3x (at scale:
        # persist() or a checkpoint table; same discipline as
        # dedup._component_labels)
        .localCheckpoint(eager=True)
    )
    norms = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    posting = w.filter((F.col("dfc") >= 2) & (F.col("dfc") <= TFIDF_MAX_DF))
    a = posting.select(
        "tok", F.col("doc_id").alias("doc_a"), F.col("w").alias("wa")
    )
    b = posting.select(
        "tok", F.col("doc_id").alias("doc_b"), F.col("w").alias("wb")
    )
    dots = (
        a.join(b, "tok")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count("*").alias("n_common_terms"),
            F.sum(F.col("wa") * F.col("wb")).alias("dot"),
        )
        .filter(F.col("n_common_terms") >= TFIDF_MIN_COMMON)
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_common_terms",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= TFIDF_THRESHOLD)
    )


# DSIR-style domain-importance weighting: hashed-unigram bucket LMs for a
# target domain vs the raw pool; per-doc importance = mean log-ratio.
DSIR_BUCKETS = 1024
DSIR_TARGET_SOURCE = "src0"  # the "looks like what I want" exemplar domain


def q_dsir_importance(spark, sf_dir):
    """Data-selection importance weighting (the hashed n-gram DSIR
    recipe): train two hashed-unigram bucket LMs — target domain
    (source = DSIR_TARGET_SOURCE) vs the raw pool (everything else) —
    and score every document by its mean per-token log importance ratio
    ln p_target(b)/p_raw(b) (add-1 smoothed). Docs scoring high look
    like the target domain; resampling raw data ∝ exp(weight) steers
    the mix toward it without a trained classifier.

    Plan: one token-grain pass buckets tokens (md5 % B, identical in
    both engines) and aggregates target/raw counts per bucket with a
    conditional agg — ONE shuffle to the B-row (1024) grain. Scalar
    totals re-agg the tiny bucket table and broadcast; the per-doc
    score is the exploded tokens broadcast-joined to the 1024-row
    ratio table and re-aggregated to the doc grain (second shuffle).
    Same token-grain cost shape as unigram_logprob_score; the ratio
    table is CONSTANT-sized (B buckets) at any corpus scale — hashing
    is what makes DSIR 100 TB-shaped."""
    toks = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            (F.col("source") == DSIR_TARGET_SOURCE).alias("is_target"),
            F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select(
            "doc_id",
            "is_target",
            F.expr(
                "CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT) % "
                f"{DSIR_BUCKETS}"
            ).alias("b"),
        )
    )
    bstats = toks.groupBy("b").agg(
        F.sum(F.col("is_target").cast("long")).alias("ct"),
        F.sum((~F.col("is_target")).cast("long")).alias("cr"),
    )
    tot = bstats.agg(F.sum("ct").alias("tt"), F.sum("cr").alias("tr"))
    ratios = bstats.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("ct") + 1) / (F.col("tt") + DSIR_BUCKETS))
            - F.log((F.col("cr") + 1) / (F.col("tr") + DSIR_BUCKETS))
        ).alias("lr"),
    )
    return (
        toks.join(F.broadcast(ratios), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("lr"), 3).alias("avg_domain_logratio"),
        )
    )


def q_source_kl_divergence(spark, sf_dir):
    """Mix-drift monitor: KL(source ‖ corpus) over the same hashed-unigram
    bucket space as dsir_importance — the per-source number a corpus
    build tracks to catch a crawl domain drifting away from (or
    collapsing into) the overall mix. Distributions are add-1 smoothed
    over the buckets OBSERVED IN THE CORPUS (a deterministic support
    set, identical in both engines); a source missing a bucket
    contributes its smoothed floor.

    Plan: ONE token-grain pass aggregates (source, bucket) counts —
    everything after is arithmetic on a <= n_sources x 1024 grid:
    corpus bucket marginals re-agg the tiny table, totals broadcast,
    and the per-source sum is a combiner-friendly agg over the grid.
    At 100 TB the only corpus-sized work is the first shuffle."""
    toks = (
        _docs(spark, sf_dir)
        .select(
            "source",
            F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select(
            "source",
            F.expr(
                "CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT) % "
                f"{DSIR_BUCKETS}"
            ).alias("b"),
        )
    )
    bsource = toks.groupBy("source", "b").agg(F.count("*").alias("csb"))
    bcorpus = bsource.groupBy("b").agg(F.sum("csb").alias("cb"))
    stot = bsource.groupBy("source").agg(F.sum("csb").alias("cs"))
    ctot = bcorpus.agg(F.sum("cb").alias("c"))
    grid = (
        stot.crossJoin(bcorpus)
        .join(bsource, ["source", "b"], "left")
        .crossJoin(F.broadcast(ctot))
        .select(
            "source",
            "cs",
            (
                (F.coalesce("csb", F.lit(0)) + 1)
                / (F.col("cs") + DSIR_BUCKETS)
            ).alias("p"),
            ((F.col("cb") + 1) / (F.col("c") + DSIR_BUCKETS)).alias("q"),
        )
    )
    return (
        grid.select("source", "cs", (F.col("p") * F.log(F.col("p") / F.col("q"))).alias("term"))
        .groupBy("source", "cs")
        .agg(F.round(F.sum("term"), 6).alias("kl_divergence"))
        .select("source", F.col("cs").alias("n_tokens"), "kl_divergence")
    )


# Temperature exponent for the multilingual mixture: p_l ∝ share_l^ALPHA.
# ALPHA = 1 reproduces the corpus as-is; ALPHA -> 0 flattens toward
# uniform; 0.3 is the published multilingual-pretraining default.
MIX_ALPHA = 0.3


def q_temperature_mix(spark, sf_dir):
    """Temperature-based language mixture (multilingual alpha-sampling):
    re-weight languages by p_l ∝ (n_l/N)^ALPHA — the standard move that
    keeps high-resource languages from drowning the tail — then apply
    the implied per-language sampling rate rate_l = p_l * N / n_l with
    the deterministic md5 coin (rate is capped at 1 for the keep
    decision; an uncapped rate > 1 reported in `sample_rate` is the
    upsampling factor — extra epochs — the tail language needs).
    Report per language: population, temperature-adjusted target share,
    sample rate, kept count, achieved rate.

    Plan: the per-language histogram is one combiner-friendly shuffle to
    the lang grain (a handful of rows); the normalizer Z = Σ n^ALPHA is
    a 1-row re-agg of that tiny table, broadcast back via crossJoin
    (data_mix_audit's scalar pattern); the per-doc keep decision is a
    broadcast-joined map-side coin. Nothing beyond the lang-grain agg
    shuffles at corpus scale. Rates round to 4 decimals in BOTH engines
    before the coin comparison so a pow() ulp can't flip a boundary
    doc."""
    docs = _docs(spark, sf_dir)
    counts = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    tot = counts.agg(
        F.sum("n_docs").alias("n_total"),
        F.sum(F.pow("n_docs", F.lit(MIX_ALPHA))).alias("z"),
    )
    rate = (
        F.pow("n_docs", F.lit(MIX_ALPHA))
        / F.col("z")
        * F.col("n_total")
        / F.col("n_docs")
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        F.round(F.pow("n_docs", F.lit(MIX_ALPHA)) / F.col("z"), 6).alias(
            "target_share"
        ),
        F.round(rate, 4).alias("sample_rate"),
        F.round(F.least(F.lit(1.0), rate), 4).alias("keep_rate"),
    )
    u = (
        F.expr(
            "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 10000"
        )
        / 10000.0
    )
    kept = (u < F.col("keep_rate")).cast("int")
    return (
        docs.select("doc_id", "lang")
        .join(F.broadcast(rates), "lang")
        .select("lang", "n_docs", "target_share", "sample_rate", kept.alias("kept"))
        .groupBy("lang", "n_docs", "target_share", "sample_rate")
        .agg(
            F.sum("kept").alias("n_kept"),
            F.round(F.sum("kept") / F.count("*"), 4).alias("kept_frac"),
        )
    )


def q_bigram_logprob(spark, sf_dir):
    """Bigram-LM fluency score: the sharper perplexity proxy next to
    unigram_logprob_score — every document scored by its mean
    -ln p(w_i | w_{i-1}) under the corpus's own bigram model (MLE:
    c(w1,w2) / c(w1·), no smoothing needed since the model trains on the
    corpus it scores, so every observed bigram has mass). Plan: one
    bigram-grain aggregation trains the model (map-side combine), the
    prefix counts re-aggregate IT (bigram-grain, far smaller than token
    grain), and scoring is one equi-join on the bigram string + one doc
    aggregation — the _BIGRAMS_SPARK array materializes behind the dedup
    barrier discipline so the HOF isn't re-evaluated per exploded row.
    Zipf bounds the bigram table; docs with < 2 tokens have no bigrams
    and drop out in both engines."""
    from .dedup import _barrier

    raw = (
        _docs(spark, sf_dir)
        .withColumn("toks", F.expr(r"filter(split(trim(text), '\\s+'), t -> t != '')"))
        .withColumn("bigrams", F.expr(_BIGRAMS_SPARK))
        .select("doc_id", "bigrams")
    )
    bg = _barrier(raw, ["doc_id"], ["bigrams"]).select(
        "doc_id", F.explode("bigrams").alias("bigram")
    )
    model = (
        bg.groupBy("bigram").agg(F.count("*").alias("c2")).localCheckpoint(eager=True)
    )
    prefix = (
        model.withColumn("w1", F.expr("split(bigram, ' ')[0]"))
        .groupBy("w1")
        .agg(F.sum("c2").alias("c1"))
    )
    scored = model.withColumn("w1", F.expr("split(bigram, ' ')[0]")).join(
        prefix, "w1"
    ).select("bigram", (-F.log(F.col("c2") / F.col("c1"))).alias("neg_logp"))
    return (
        bg.join(scored, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("neg_logp"), 3).alias("avg_neg_logprob"),
        )
        .orderBy("doc_id")
    )


KN_DISCOUNT = 0.75  # the Chen & Goodman fixed absolute discount

# -ln P_KN(w2|w1) in integer micros; identical expression text in both
# engines (only CAST spellings differ via the duck twin below)
_KN_LPM_SPARK = (
    f"CAST(floor(-ln(greatest(CAST(c2 AS DOUBLE) - {KN_DISCOUNT}D, 0D) / CAST(c1 AS DOUBLE)"
    f" + ({KN_DISCOUNT}D * CAST(n1w1 AS DOUBLE) / CAST(c1 AS DOUBLE))"
    f" * (CAST(n1pre AS DOUBLE) / CAST(n_types AS DOUBLE)))"
    f" * 1000000D + 0.5D) AS BIGINT)"
)


def q_kn_bigram_score(spark, sf_dir):
    """Interpolated Kneser-Ney bigram fluency score (Kneser & Ney 1995;
    interpolated form and fixed discount D=0.75 per Chen & Goodman,
    "An empirical study of smoothing techniques", 1998):

        P(w2|w1) = max(c12 - D, 0)/c1 + (D·N1+(w1·)/c1) · N1+(·w2)/T

    — the continuation-probability backoff that MLE (`bigram_logprob_
    score`) lacks: a bigram whose second word appears after MANY
    different predecessors backs off high, a word glued to one
    collocation backs off low. The sharper fluency signal for quality
    filtering when the scoring corpus diverges from the training one.

    All model quantities are exact integer counts at the bigram-TYPE
    grain (Zipf-bounded): c12, prefix totals c1, continuation fan-outs
    N1+(w1·)/N1+(·w2) from two re-aggregations of the model table, and
    the global type count T broadcast as one row. Per-bigram -ln P
    quantizes to integer micros (identical IEEE expression both
    engines), so per-doc means are order-free exact sums. Plan: one
    token-sized bigram aggregation, three model-grain contractions, one
    equi-join back to the exploded docs — no windows, no pair joins."""
    from .dedup import _barrier

    raw = (
        _docs(spark, sf_dir)
        .withColumn("toks", F.expr(r"filter(split(trim(text), '\\s+'), t -> t != '')"))
        .withColumn("bigrams", F.expr(_BIGRAMS_SPARK))
        .select("doc_id", "bigrams")
    )
    bg = _barrier(raw, ["doc_id"], ["bigrams"]).select(
        "doc_id", F.explode("bigrams").alias("bigram")
    )
    model = (
        bg.groupBy("bigram").agg(F.count("*").alias("c2")).localCheckpoint(eager=True)
    )
    split = model.select(
        "bigram",
        "c2",
        F.expr("split(bigram, ' ')[0]").alias("w1"),
        F.expr("split(bigram, ' ')[1]").alias("w2"),
    )
    prefix = split.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count("*").alias("n1w1")
    )
    suffix = split.groupBy("w2").agg(F.count("*").alias("n1pre"))
    types = model.agg(F.count("*").alias("n_types"))
    scored = (
        split.join(prefix, "w1")
        .join(suffix, "w2")
        .crossJoin(F.broadcast(types))
        .select("bigram", F.expr(_KN_LPM_SPARK).alias("lpm"))
    )
    return (
        bg.join(scored, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.expr(
                "try_divide(CAST(SUM(lpm) AS DOUBLE), CAST(COUNT(*) AS DOUBLE) * 1000000D)"
            ).alias("kn_neg_logprob"),
        )
        .orderBy("doc_id")
    )


# --- classifier-based quality filter ------------------------------------------
QC_BUCKETS = 512
QC_BIAS = 0.1

# md5-derived per-bucket weight in [-1, 1] — a DETERMINISTIC STAND-IN for
# pretrained fastText-style classifier weights (no model ships in this
# container; in production the weight table is the trained model's hashed
# embedding-bag, loaded as a small DataFrame). Both engines derive the
# same weights from md5("qw-" || bucket), so the oracle is value-exact.
# CAST(1000 AS DOUBLE) divisor: a bare 1000.0 literal is DECIMAL in both
# engines and integral/DECIMAL division carries engine-specific result
# scales — double division is the cross-engine-identical path.
_QC_W_SPARK = (
    "(CAST(conv(substring(md5(concat('qw-', CAST(b AS STRING))), 1, 8), 16, 10) "
    "AS BIGINT) % 2001 - 1000) / CAST(1000 AS DOUBLE)"
)
_QC_W_DUCK = (
    "(CAST('0x' || substr(md5('qw-' || CAST(b AS VARCHAR)), 1, 8) AS BIGINT) "
    "% 2001 - 1000) / CAST(1000 AS DOUBLE)"
)


def q_quality_classifier_filter(spark, sf_dir):
    """Classifier-based quality filter (the CCNet / LLaMA-style fastText
    gate): score every document with a linear model over L1-normalized
    hashed-unigram features and keep docs whose logit clears 0. The
    weights here are a deterministic md5 stand-in (see _QC_W_SPARK); the
    part this operator owns — and what scales — is the INFERENCE
    plumbing: one token-grain bucket pass (md5 % QC_BUCKETS), a
    CONSTANT-size weight table joined broadcast, and a per-doc dot
    product whose per-(doc, bucket) terms QUANTIZE TO INTEGER 1e-8
    units before summing, so the reduction is associative and both
    engines agree bit-for-bit (the grouped_linreg / bm25 discipline).
    Thresholding on the logit (monotone in the sigmoid) avoids exp()
    entirely — no libm in the operator at all.

    At 100 TB: two shuffles (token-grain bucket counts → doc grain),
    weight table B rows regardless of corpus size."""
    toks = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .select(
            "doc_id",
            F.expr(
                "CAST(conv(substring(md5(tok), 1, 8), 16, 10) AS BIGINT) % "
                f"{QC_BUCKETS}"
            ).alias("b"),
        )
    )
    per_bucket = toks.groupBy("doc_id", "b").agg(F.count("*").alias("cnt"))
    dl = per_bucket.groupBy("doc_id").agg(F.sum("cnt").alias("n_tokens"))
    weights = (
        spark.range(QC_BUCKETS)
        .select(F.col("id").alias("b"))
        .select("b", F.expr(_QC_W_SPARK).alias("w"))
    )
    terms = (
        per_bucket.join(F.broadcast(weights), "b")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.expr("CAST(ROUND(cnt * w / n_tokens * 100000000) AS BIGINT)").alias(
                "t8"
            ),
        )
    )
    return (
        terms.groupBy("doc_id", "n_tokens")
        .agg(
            F.round(
                F.sum("t8").cast("double") / F.lit(100000000) + F.lit(QC_BIAS), 6
            ).alias("logit")
        )
        .select(
            "doc_id",
            "n_tokens",
            "logit",
            (F.col("logit") >= 0).alias("keep"),
        )
    )


def q_training_shard_manifest(spark, sf_dir):
    """Deterministic global shuffle into training shards, audited: every
    document gets a pure-function-of-key coin (first 8 md5 hex chars of
    'shard-'||doc_id — no RNG, so assignment and order survive re-reads,
    engine changes, and cluster resizes, unlike rand()/randomSplit whose
    per-partition seeding reshuffles when the input splits change) and a
    shard = coin % TRAIN_SHARDS. Report: per-shard doc count, token
    mass, and the coin-sum fingerprint any engine can recompute from the
    keys alone to verify shard integrity (operators/training_export
    writes the shards; this is its manifest as a pure plan). One
    combiner-friendly shuffle to the shard grain — the uniform coin
    balances shards AND reducers by construction, no salting needed."""
    from ..operators.training_export import TRAIN_SHARDS, with_shard

    docs = _docs(spark, sf_dir)
    n_toks = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    return (
        with_shard(docs.select("doc_id", n_toks.alias("n_toks")), TRAIN_SHARDS)
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
            F.sum("coin").alias("coin_fingerprint"),
            F.min("coin").alias("min_coin"),
            F.max("coin").alias("max_coin"),
        )
    )


QUERIES = {
    "training_shard_manifest": q_training_shard_manifest,
    "quality_classifier_filter": q_quality_classifier_filter,
    "bigram_logprob_score": q_bigram_logprob,
    "kn_bigram_score": q_kn_bigram_score,
    "temperature_mix": q_temperature_mix,
    "dsir_importance": q_dsir_importance,
    "source_kl_divergence": q_source_kl_divergence,
    "unigram_logprob_score": q_unigram_logprob,
    "quality_percentile_filter": q_quality_percentile_filter,
    "curriculum_order": q_curriculum_order,
    "vocab_oov_audit": q_vocab_oov_audit,
    "tfidf_cosine_pairs": q_tfidf_cosine_pairs,
    "embedding_outliers": q_embedding_outliers,
    "stratified_sample": q_stratified_sample,
    "importance_sample": q_importance_sample,
    "source_quota": q_source_quota,
}

_RATE_CASE_SQL = (
    "CASE "
    + " ".join(f"WHEN lang = '{k}' THEN {v}" for k, v in STRATA_RATES.items())
    + f" ELSE {STRATA_DEFAULT_RATE} END"
)

ORACLES = {
    "training_shard_manifest": r"""
        WITH d AS (
            SELECT CAST('0x' || substr(md5('shard-' || CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) AS coin,
                   CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                        AS n_toks
            FROM documents
        )
        SELECT CAST(coin % 16 AS INTEGER) AS shard,
               COUNT(*) AS n_docs,
               CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
               CAST(SUM(coin) AS BIGINT) AS coin_fingerprint,
               MIN(coin) AS min_coin,
               MAX(coin) AS max_coin
        FROM d
        GROUP BY 1
    """,
    "quality_classifier_filter": rf"""
        WITH toks AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5(u.tok), 1, 8) AS BIGINT) % {QC_BUCKETS}
                     AS b
            FROM (
                SELECT doc_id,
                       list_filter(string_split_regex(trim(text), '\s+'),
                                   t -> t != '') AS ts
                FROM documents
            ), LATERAL (SELECT UNNEST(ts) AS tok) u
        ),
        per_bucket AS (
            SELECT doc_id, b, COUNT(*) AS cnt FROM toks GROUP BY 1, 2
        ),
        dl AS (
            SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens
            FROM per_bucket GROUP BY 1
        ),
        weights AS (
            SELECT u.b, {_QC_W_DUCK} AS w
            FROM (SELECT UNNEST(generate_series(0, {QC_BUCKETS - 1})) AS b) u
        ),
        terms AS (
            SELECT p.doc_id, d.n_tokens,
                   CAST(ROUND(p.cnt * w.w / d.n_tokens * 100000000) AS BIGINT)
                     AS t8
            FROM per_bucket p JOIN weights w USING (b) JOIN dl d USING (doc_id)
        )
        SELECT doc_id, n_tokens,
               ROUND(CAST(SUM(t8) AS DOUBLE) / 100000000 + {QC_BIAS}, 6) AS logit,
               (ROUND(CAST(SUM(t8) AS DOUBLE) / 100000000 + {QC_BIAS}, 6) >= 0)
                 AS keep
        FROM terms GROUP BY doc_id, n_tokens
    """,
    "kn_bigram_score": rf"""
        WITH ts_t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(trim(text), '\s+'),
                               t -> t != '') AS ts
            FROM documents
        ),
        bg AS (
            SELECT doc_id, u.bigram
            FROM ts_t, LATERAL (
                SELECT UNNEST(list_transform(generate_series(1, len(ts) - 1),
                                             i -> ts[i] || ' ' || ts[i+1])) AS bigram
            ) u
        ),
        model AS (SELECT bigram, COUNT(*) AS c2 FROM bg GROUP BY 1),
        sp AS (
            SELECT bigram, c2,
                   string_split(bigram, ' ')[1] AS w1,
                   string_split(bigram, ' ')[2] AS w2
            FROM model
        ),
        prefix AS (
            SELECT w1, SUM(c2) AS c1, COUNT(*) AS n1w1 FROM sp GROUP BY 1
        ),
        suffix AS (SELECT w2, COUNT(*) AS n1pre FROM sp GROUP BY 1),
        types AS (SELECT COUNT(*) AS n_types FROM model),
        scored AS (
            SELECT s.bigram,
                   CAST(floor(-ln(greatest(CAST(s.c2 AS DOUBLE) - {KN_DISCOUNT}, 0)
                        / CAST(p.c1 AS DOUBLE)
                        + ({KN_DISCOUNT} * CAST(p.n1w1 AS DOUBLE) / CAST(p.c1 AS DOUBLE))
                        * (CAST(x.n1pre AS DOUBLE) / CAST(t.n_types AS DOUBLE)))
                        * 1000000 + 0.5) AS BIGINT) AS lpm
            FROM sp s JOIN prefix p USING (w1) JOIN suffix x USING (w2), types t
        )
        SELECT bg.doc_id, COUNT(*) AS n_bigrams,
               CASE WHEN COUNT(*) = 0 THEN NULL
                    ELSE CAST(SUM(lpm) AS DOUBLE) /
                         (CAST(COUNT(*) AS DOUBLE) * 1000000)
               END AS kn_neg_logprob
        FROM bg JOIN scored USING (bigram)
        GROUP BY bg.doc_id ORDER BY bg.doc_id
    """,
    "bigram_logprob_score": r"""
        WITH ts_t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(trim(text), '\s+'),
                               t -> t != '') AS ts
            FROM documents
        ),
        bg AS (
            SELECT doc_id, u.bigram
            FROM ts_t, LATERAL (
                SELECT UNNEST(list_transform(generate_series(1, len(ts) - 1),
                                             i -> ts[i] || ' ' || ts[i+1])) AS bigram
            ) u
        ),
        model AS (SELECT bigram, COUNT(*) AS c2 FROM bg GROUP BY 1),
        prefix AS (
            SELECT string_split(bigram, ' ')[1] AS w1, SUM(c2) AS c1
            FROM model GROUP BY 1
        ),
        scored AS (
            SELECT m.bigram, -LN(m.c2 / p.c1) AS neg_logp
            FROM model m JOIN prefix p ON string_split(m.bigram, ' ')[1] = p.w1
        )
        SELECT bg.doc_id, COUNT(*) AS n_bigrams,
               ROUND(AVG(s.neg_logp), 3) AS avg_neg_logprob
        FROM bg JOIN scored s USING (bigram)
        GROUP BY bg.doc_id ORDER BY bg.doc_id
    """,
    "source_kl_divergence": rf"""
        WITH toks AS (
            SELECT source,
                   CAST('0x' || substr(md5(u.tok), 1, 8) AS BIGINT) % {DSIR_BUCKETS} AS b
            FROM (SELECT source,
                         list_filter(string_split_regex(trim(text), '\s+'),
                                     t -> t != '') AS ts
                  FROM documents),
                 LATERAL (SELECT UNNEST(ts) AS tok) u
        ),
        bsource AS (SELECT source, b, COUNT(*) AS csb FROM toks GROUP BY 1, 2),
        bcorpus AS (SELECT b, SUM(csb) AS cb FROM bsource GROUP BY b),
        stot AS (SELECT source, SUM(csb) AS cs FROM bsource GROUP BY source),
        ctot AS (SELECT SUM(cb) AS c FROM bcorpus),
        grid AS (
            SELECT s.source, s.cs,
                   (COALESCE(x.csb, 0) + 1) / (s.cs + {DSIR_BUCKETS}) AS p,
                   (g.cb + 1) / (t.c + {DSIR_BUCKETS}) AS q
            FROM stot s CROSS JOIN bcorpus g
            LEFT JOIN bsource x ON x.source = s.source AND x.b = g.b
            CROSS JOIN ctot t
        )
        SELECT source, cs AS n_tokens,
               ROUND(SUM(p * ln(p / q)), 6) AS kl_divergence
        FROM grid
        GROUP BY source, cs
    """,
    "dsir_importance": rf"""
        WITH toks AS (
            SELECT doc_id,
                   source = '{DSIR_TARGET_SOURCE}' AS is_target,
                   CAST('0x' || substr(md5(u.tok), 1, 8) AS BIGINT) % {DSIR_BUCKETS} AS b
            FROM (SELECT doc_id, source,
                         list_filter(string_split_regex(trim(text), '\s+'),
                                     t -> t != '') AS ts
                  FROM documents),
                 LATERAL (SELECT UNNEST(ts) AS tok) u
        ),
        bstats AS (
            SELECT b,
                   SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
                   SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS cr
            FROM toks GROUP BY b
        ),
        tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM bstats),
        ratios AS (
            SELECT b, ln((ct + 1) / (tt + {DSIR_BUCKETS}))
                      - ln((cr + 1) / (tr + {DSIR_BUCKETS})) AS lr
            FROM bstats, tot
        )
        SELECT doc_id, COUNT(*) AS n_tokens,
               ROUND(AVG(lr), 3) AS avg_domain_logratio
        FROM toks JOIN ratios USING (b)
        GROUP BY doc_id
    """,
    "temperature_mix": f"""
        WITH counts AS (
            SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
        ),
        tot AS (
            SELECT SUM(n_docs) AS n_total, SUM(pow(n_docs, {MIX_ALPHA})) AS z
            FROM counts
        ),
        rates AS (
            SELECT lang, n_docs,
                   ROUND(pow(n_docs, {MIX_ALPHA}) / z, 6) AS target_share,
                   ROUND(pow(n_docs, {MIX_ALPHA}) / z * n_total / n_docs, 4)
                     AS sample_rate,
                   ROUND(LEAST(1.0, pow(n_docs, {MIX_ALPHA}) / z * n_total / n_docs), 4)
                     AS keep_rate
            FROM counts, tot
        ),
        coined AS (
            SELECT r.lang, r.n_docs, r.target_share, r.sample_rate,
                   CASE WHEN (CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000)
                            / 10000.0 < r.keep_rate
                        THEN 1 ELSE 0 END AS kept
            FROM documents d JOIN rates r USING (lang)
        )
        SELECT lang, n_docs, target_share, sample_rate,
               CAST(SUM(kept) AS BIGINT) AS n_kept,
               ROUND(SUM(kept) / COUNT(*), 4) AS kept_frac
        FROM coined
        GROUP BY lang, n_docs, target_share, sample_rate
    """,
    "tfidf_cosine_pairs": rf"""
        WITH ts_t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(trim(text), '\s+'),
                               t -> t != '') AS ts
            FROM documents
        ),
        toks AS (
            SELECT doc_id, u.tok
            FROM ts_t, LATERAL (
                SELECT UNNEST(list_transform(generate_series(1, len(ts) - 1),
                                             i -> ts[i] || ' ' || ts[i+1])) AS tok
            ) u
        ),
        tf AS (SELECT doc_id, tok, COUNT(*) AS tfc FROM toks GROUP BY 1, 2),
        df AS (SELECT tok, COUNT(*) AS dfc FROM tf GROUP BY 1),
        n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks),
        w AS (
            SELECT doc_id, tok, dfc, tfc * ln(n_docs / dfc) AS w
            FROM tf JOIN df USING (tok) CROSS JOIN n
        ),
        norms AS (SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY 1),
        posting AS (
            SELECT * FROM w WHERE dfc BETWEEN 2 AND {TFIDF_MAX_DF}
        ),
        dots AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   COUNT(*) AS n_common_terms, SUM(a.w * b.w) AS dot
            FROM posting a JOIN posting b
              ON a.tok = b.tok AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING COUNT(*) >= {TFIDF_MIN_COMMON}
        )
        SELECT doc_a, doc_b, n_common_terms,
               ROUND(dot / (na.nrm * nb.nrm), 4) AS cosine
        FROM dots
        JOIN norms na ON na.doc_id = doc_a
        JOIN norms nb ON nb.doc_id = doc_b
        WHERE ROUND(dot / (na.nrm * nb.nrm), 4) >= {TFIDF_THRESHOLD}
    """,
    "quality_percentile_filter": rf"""
        WITH toks AS (
            SELECT doc_id, u.tok
            FROM (
                SELECT doc_id,
                       list_filter(string_split_regex(trim(text), '\s+'),
                                   t -> t != '') AS ts
                FROM documents
            ), LATERAL (SELECT UNNEST(ts) AS tok) u
        ),
        vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        tot AS (SELECT SUM(c) AS t FROM vocab),
        doc_scores AS (
            SELECT doc_id, COUNT(*) AS n_tokens,
                   ROUND(AVG(-ln(c / t)), 3) AS score
            FROM toks JOIN vocab USING (tok) CROSS JOIN tot
            GROUP BY doc_id
        ),
        cut AS (
            SELECT q0 AS cut FROM ({distribution_quantiles_duck(
                "SELECT score FROM doc_scores", None, "score", (0.75,),
                scale=1000, grain_space=True,
            )})
        )
        SELECT d.lang, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN round(s.score * 1000) <= cut THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN round(s.score * 1000) <= cut THEN s.n_tokens
                    ELSE 0 END) AS BIGINT) AS tokens_kept
        FROM doc_scores s CROSS JOIN cut JOIN documents d USING (doc_id)
        GROUP BY d.lang
    """,
    "vocab_oov_audit": rf"""
        WITH toks AS (
            SELECT doc_id, u.tok
            FROM (
                SELECT doc_id,
                       list_filter(string_split_regex(trim(text), '\s+'),
                                   t -> t != '') AS ts
                FROM documents
            ), LATERAL (SELECT UNNEST(ts) AS tok) u
        ),
        vocab_top AS (
            SELECT tok FROM (
                SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok
            ) ORDER BY c DESC, tok LIMIT {VOCAB_V}
        ),
        flagged AS (
            SELECT d.source, t.tok,
                   CASE WHEN v.tok IS NULL THEN 0 ELSE 1 END AS iv
            FROM toks t
            JOIN documents d USING (doc_id)
            LEFT JOIN vocab_top v ON t.tok = v.tok
        )
        SELECT source,
               COUNT(*) AS n_tokens,
               SUM(1 - iv) AS n_oov_tokens,
               ROUND(SUM(1 - iv) / COUNT(*), 4) AS oov_rate,
               COUNT(DISTINCT CASE WHEN iv = 0 THEN tok END) AS n_oov_types
        FROM flagged GROUP BY source
    """,
    "curriculum_order": rf"""
        WITH toks AS (
            SELECT doc_id, u.tok
            FROM (
                SELECT doc_id,
                       list_filter(string_split_regex(trim(text), '\s+'),
                                   t -> t != '') AS ts
                FROM documents
            ), LATERAL (SELECT UNNEST(ts) AS tok) u
        ),
        vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        tot AS (SELECT SUM(c) AS t FROM vocab),
        doc_scores AS (
            SELECT doc_id, COUNT(*) AS n_tokens,
                   ROUND(AVG(-ln(c / t)), 3) AS score
            FROM toks JOIN vocab USING (tok) CROSS JOIN tot
            GROUP BY doc_id
        ),
        cuts AS (
            SELECT q0, q1, q2 FROM ({distribution_quantiles_duck(
                "SELECT score FROM doc_scores", None, "score",
                tuple(i / CURR_BUCKETS for i in range(1, CURR_BUCKETS)),
                scale=1000, grain_space=True,
            )})
        ),
        b AS (
            SELECT doc_id,
                   (CASE WHEN round(score * 1000) > q0 THEN 1 ELSE 0 END
                  + CASE WHEN round(score * 1000) > q1 THEN 1 ELSE 0 END
                  + CASE WHEN round(score * 1000) > q2 THEN 1 ELSE 0 END)
                       AS bucket,
                   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                        AS BIGINT) AS coin
            FROM doc_scores CROSS JOIN cuts
        )
        SELECT doc_id, bucket,
               ROW_NUMBER() OVER (ORDER BY bucket, coin, doc_id)
                   AS curriculum_rank
        FROM b
    """,
    "unigram_logprob_score": r"""
        WITH toks AS (
            SELECT doc_id, u.tok
            FROM (
                SELECT doc_id,
                       list_filter(string_split_regex(trim(text), '\s+'),
                                   t -> t != '') AS ts
                FROM documents
            ), LATERAL (SELECT UNNEST(ts) AS tok) u
        ),
        vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        tot AS (SELECT SUM(c) AS t FROM vocab)
        SELECT doc_id, COUNT(*) AS n_tokens,
               ROUND(AVG(-ln(c / t)), 3) AS avg_neg_logprob
        FROM toks JOIN vocab USING (tok) CROSS JOIN tot
        GROUP BY doc_id
    """,
    "embedding_outliers": f"""
        WITH cent AS (
            SELECT array_agg(m ORDER BY pos) AS cv FROM (
                SELECT u.pos AS pos, ROUND(AVG(u.v), 4) AS m
                FROM embeddings,
                     LATERAL (SELECT UNNEST(embedding) AS v,
                                     generate_subscripts(embedding, 1) AS pos) u
                GROUP BY u.pos
            )
        )
        SELECT vec_id,
               ROUND(sqrt(list_reduce(list_transform(generate_series(1, {EMB_DIM}),
                     i -> (embedding[i]::DOUBLE - cv[i]) * (embedding[i]::DOUBLE - cv[i])),
                     (x, y) -> x + y)), 6) AS centroid_dist
        FROM embeddings, cent
        ORDER BY centroid_dist DESC, vec_id
        LIMIT {OUTLIER_TOPK}
    """,
    "stratified_sample": f"""
        WITH d AS (
            SELECT lang,
                   CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100
                        < {_RATE_CASE_SQL} THEN 1 ELSE 0 END AS kept
            FROM documents
        )
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(kept) AS BIGINT) AS n_kept,
               ROUND(SUM(kept) / COUNT(*), 4) AS kept_frac
        FROM d GROUP BY lang
    """,
    "importance_sample": f"""
        WITH d AS (
            SELECT lang,
                   LEAST(1.0, n_chars / {IMPORTANCE_NORM_CHARS}) AS p,
                   (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000)
                       / 10000.0 AS u
            FROM documents
        )
        SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(CASE WHEN u < p THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               ROUND(SUM(CASE WHEN u < p THEN 1 ELSE 0 END) / COUNT(*), 4) AS kept_frac,
               ROUND(SUM(CASE WHEN u < p THEN 1.0 / p END), 2) AS ht_estimate
        FROM d GROUP BY lang
    """,
    "source_quota": f"""
        SELECT source, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS chars_kept
        FROM (
            SELECT source, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id) AS rn
            FROM documents
        ) WHERE rn <= {SOURCE_QUOTA}
        GROUP BY source
    """,
}
