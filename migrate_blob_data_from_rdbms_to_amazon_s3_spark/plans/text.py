"""Text-analysis operators for large-scale training-data pipelines.

All computed with JVM-side built-ins (split/regexp/higher-order array
functions) — no Python in the hot path, so the 100 TB plan is a single
narrow projection over the documents scan, embarrassingly parallel, no
shuffle. The DuckDB oracles mirror the exact token/regex semantics.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.quantiles import distribution_quantiles_duck

# Tiny deterministic English stopword list (language-ID heuristic: n-gram /
# stopword-ratio detectors à la langid; shared verbatim with the oracles).
EN_STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "on", "it")
_SW_SQL = "(" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + ")"
_SW_SPARK = "(" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + ")"

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation marks.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _docs(spark, sf_dir):
    # single-file fixture → repartition so regex/array exprs use all cores
    return spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def _docs_with_toks(spark, sf_dir, extra_cols: tuple[str, ...] = ()):
    """(doc_id [, extra], toks) with toks materialized behind a groupBy-on-PK
    barrier: CollapseProject otherwise inlines the split() into every
    downstream reference (quality score reads toks 6x -> 6 splits per row,
    interpreted because higher-order lambdas don't codegen). One linear
    exchange of the token arrays instead (see plans/dedup._barrier)."""
    raw = _docs(spark, sf_dir).withColumn("toks", F.split(F.trim("text"), r"\s+"))
    keep = ["doc_id", *extra_cols]
    return raw.groupBy(*keep).agg(
        F.first("toks").alias("toks"), F.first("text").alias("text")
    )


def q_token_count(spark, sf_dir):
    """Token counting: whitespace tokens + a BPE-ish regex token count.
    (Reference analog: none — LLM-pipeline extension per BASELINE.json.)"""
    toks = F.split(F.trim("text"), r"\s+")
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(toks).alias("ws_tokens"),
        F.regexp_count("text", F.lit(TOKEN_REGEX)).alias("bpe_tokens"),
        F.length("text").alias("chars"),
    )


def quality_flag():
    """The pass/fail quality Column over a (toks, text) row — shared by
    q_quality_score and the corpus_clean_funnel so both see the exact
    same predicate."""
    n_toks = F.size("toks")
    sw = F.expr(f"size(filter(toks, t -> t in {_SW_SPARK}))")
    alpha_chars = F.length(F.regexp_replace("text", r"[^A-Za-z]", ""))
    return (
        (n_toks >= 5)
        & (F.try_divide(sw, n_toks) > 0.01)
        & (F.try_divide(alpha_chars, F.length("text")) > 0.5)
    )


def q_quality_score(spark, sf_dir):
    """Quality scoring: length, mean word length, stopword ratio, alpha
    ratio — the standard cheap heuristics used to filter web corpora."""
    d = _docs_with_toks(spark, sf_dir)
    n_toks = F.size("toks")
    sw = F.expr(f"size(filter(toks, t -> t in {_SW_SPARK}))")
    alpha_chars = F.length(F.regexp_replace("text", r"[^A-Za-z]", ""))
    return d.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        F.round(F.try_divide(F.length("text"), n_toks), 4).alias("avg_token_len"),
        F.round(F.try_divide(sw, n_toks), 4).alias("stopword_ratio"),
        F.round(F.try_divide(alpha_chars, F.length("text")), 4).alias("alpha_ratio"),
        quality_flag().alias("passes_quality"),
    )


def q_lang_id(spark, sf_dir):
    """Language-ID heuristic (stopword-ratio detector): en stopword share
    of tokens; >= 2% → 'en', else 'unknown'. Reported next to the fixture
    label for agreement analysis."""
    d = _docs_with_toks(spark, sf_dir, extra_cols=("lang",))
    ratio = F.try_divide(
        F.expr(f"size(filter(toks, t -> t in {_SW_SPARK}))"), F.size("toks")
    )
    pred = F.when(ratio >= 0.02, F.lit("en")).otherwise(F.lit("unknown"))
    return d.select(
        "doc_id",
        F.round(ratio, 4).alias("en_stopword_ratio"),
        pred.alias("predicted_lang"),
        F.col("lang").alias("labeled_lang"),
        (pred == F.col("lang")).alias("agrees"),
    )


def q_fingerprint(spark, sf_dir):
    """Document fingerprinting: md5 over case/whitespace-normalized text
    (the exact-dedup key), plus a 64-bit prefix as a compact numeric id."""
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    fp = F.md5(F.encode(norm, "UTF-8"))
    return _docs(spark, sf_dir).select(
        "doc_id",
        fp.alias("fingerprint"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("bigint").alias("fingerprint_60bit"),
    )


FUZZY_MAX_EDIT = 3
FUZZY_SEGMENTS = FUZZY_MAX_EDIT + 1  # pigeonhole: k edits leave >=1 segment intact


def _name_segments_spark(col: str) -> str:
    """Split a string into FUZZY_SEGMENTS aligned contiguous segments
    (PassJoin-style pigeonhole blocking): two equal-length strings within
    FUZZY_MAX_EDIT substitutions must agree on at least one segment, so
    joining on (segment_idx, segment_value) is a sound, content-derived
    block — no content-independent key (the r2 version blocked on
    s_nationkey: a hot nation is near-quadratic at 100 TB regardless of
    what the names look like). Boundaries are length-derived so the same
    fraction of each string lands in the same segment index."""
    return (
        f"transform(sequence(0, {FUZZY_SEGMENTS - 1}), i -> "
        f"substring({col}, CAST(i * length({col}) / {FUZZY_SEGMENTS} AS INT) + 1, "
        f"CAST((i + 1) * length({col}) / {FUZZY_SEGMENTS} AS INT) "
        f"- CAST(i * length({col}) / {FUZZY_SEGMENTS} AS INT)))"
    )


def q_fuzzy_name_pairs(spark, sf_dir):
    """Fuzzy string matching: supplier-name pairs within Levenshtein
    distance 3. Candidates come from the 4-segment pigeonhole block
    (`_name_segments_spark`): each name emits (seg_idx, seg_val) keys,
    pairs sharing any key join, dedup, then exact levenshtein verifies.
    Recall is exact for the substitution regime (equal-length edits —
    the fixture's; full indel-shift tolerance is the positional-q-gram
    PassJoin extension). Output is the TRUE edit<=3 pair set — on a
    corpus where many names genuinely sit within distance 3 the result
    itself is large; the plan stays O(sum of block sizes), never
    all-pairs."""
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    segs = sup.select(
        "s_suppkey",
        F.posexplode(F.expr(_name_segments_spark("s_name"))).alias(
            "seg_idx", "seg_val"
        ),
    )
    a = segs.select(F.col("s_suppkey").alias("sup_a"), "seg_idx", "seg_val")
    b = segs.select(F.col("s_suppkey").alias("sup_b"), "seg_idx", "seg_val")
    cand = (
        a.join(b, ["seg_idx", "seg_val"])
        .filter(F.col("sup_a") < F.col("sup_b"))
        .select("sup_a", "sup_b")
        .distinct()
    )
    na = sup.select(F.col("s_suppkey").alias("sup_a"), F.col("s_name").alias("name_a"))
    nb = sup.select(F.col("s_suppkey").alias("sup_b"), F.col("s_name").alias("name_b"))
    return (
        cand.join(na, "sup_a")
        .join(nb, "sup_b")
        .select(
            "sup_a",
            "sup_b",
            F.levenshtein("name_a", "name_b").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= FUZZY_MAX_EDIT)
    )


# Gopher-style repetition thresholds (Rae et al. 2021 §A1.1 shapes):
# corpora drop docs dominated by repeated tokens / one hot bigram.
REP_MAX_DUP_TOKEN_FRAC = 0.85
REP_MAX_TOP_BIGRAM_FRAC = 0.2

# PII scrubbing patterns — shared verbatim with the oracle; both Java
# regex and RE2 interpret these identically (char classes, \d, \b, {2,}).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def repetition_cols():
    """(dup_token_frac, top_bigram_frac) Columns over a (toks,) row —
    shared by q_repetition_filter and the corpus_clean_funnel. The bigram
    list is bound as a lambda variable (the `transform(array(...))`
    let-binding — see similarity._q8_spark) so CollapseProject can't
    re-inline its construction into every reference; the mode count is
    O(distinct x n) per doc, all JVM-side."""
    n = F.size("toks")
    dup_frac = F.round(
        F.lit(1.0) - F.try_divide(F.size(F.array_distinct("toks")), n), 4
    )
    bigrams = (
        "CASE WHEN size(toks) >= 2 THEN transform(sequence(1, size(toks) - 1), "
        "i -> concat_ws(' ', toks[i-1], toks[i])) ELSE array() END"
    )
    top_bigram = F.expr(
        f"transform(array({bigrams}), g -> CASE WHEN size(g) = 0 THEN CAST(NULL AS DOUBLE) "
        "ELSE round(array_max(transform(array_distinct(g), x -> size(filter(g, y -> y = x)))) "
        "/ CAST(size(g) AS DOUBLE), 4) END)[0]"
    )
    return dup_frac, top_bigram


def repetition_flag():
    dup_frac, top_bigram = repetition_cols()
    return (dup_frac < REP_MAX_DUP_TOKEN_FRAC) & (
        top_bigram < REP_MAX_TOP_BIGRAM_FRAC
    )


def q_repetition_filter(spark, sf_dir):
    """Repetition filter: duplicate-token fraction and hottest-bigram
    fraction per document, with the Gopher-style pass flag. No shuffle
    beyond the token barrier; see repetition_cols for the expression
    shape."""
    d = _docs_with_toks(spark, sf_dir)
    dup_frac, top_bigram = repetition_cols()
    return d.select(
        "doc_id",
        dup_frac.alias("dup_token_frac"),
        top_bigram.alias("top_bigram_frac"),
        repetition_flag().alias("passes_repetition"),
    )


def q_pii_scrub(spark, sf_dir):
    """PII scrubbing: redact emails/phone numbers, report match counts and
    the md5 of the scrubbed text (proves byte-identical scrubbing without
    shipping documents around). Narrow projection, no shuffle; the fixture
    corpus contains no PII (all counts 0 — the positive cases are proven
    in tests/test_text_guards.py on constructed rows)."""
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.regexp_count("text", F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(PHONE_RE)).alias("n_phones"),
        F.md5(F.encode(scrubbed, "UTF-8")).alias("scrubbed_md5"),
    )


PACK_CONTEXT_TOKENS = 4096
# Packing parallelism: each (lang, doc_id % PACK_SHARDS) is an independent
# packing stream with its own window numbering, so the cumsum window sorts
# n_lang x PACK_SHARDS partitions instead of one-per-language — a single
# dominant language can never become one global sort partition. Dial
# PACK_SHARDS so each shard's token mass fits an executor's sort budget
# (shard token mass ~ corpus_tokens / (n_lang x shards)); packing quality
# is unaffected since windows never span shards by construction.
PACK_SHARDS = 8


def q_pack_sequences(spark, sf_dir):
    """Sequence packing for pretraining: within each (lang, shard) stream,
    documents are concatenated in deterministic doc_id order and chunked
    into fixed context windows; a doc's window = its start offset //
    context_len (streaming concat-and-chunk semantics — docs may straddle
    a boundary, exactly like a real packer). One window-cumsum per
    (lang, shard) partition — see PACK_SHARDS. Output: per-window doc
    count + token fill (the packing-efficiency audit), keyed by
    (lang, shard_id, window_id)."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    toks = F.size(F.split(F.trim("text"), r"\s+"))
    w = Window.partitionBy("lang", "shard_id").orderBy("doc_id")
    sharded = docs.select(
        "lang",
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard_id"),
        toks.alias("n_toks"),
    )
    with_off = sharded.select(
        "lang",
        "shard_id",
        "doc_id",
        "n_toks",
        (F.sum("n_toks").over(w) - F.col("n_toks")).alias("start_off"),
    )
    win = F.floor(F.col("start_off") / PACK_CONTEXT_TOKENS)
    return (
        with_off.groupBy("lang", "shard_id", win.alias("window_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("n_tokens"),
        )
    )


def q_length_percentiles(spark, sf_dir):
    """Per-language token-length distribution: exact p25/p50/p75/p95 plus
    mean — the corpus-shape audit that sizes context windows and packing
    (see PACK_CONTEXT_TOKENS). Exact percentiles come from the
    COUNT-DISTRIBUTION method (functions/quantiles; round 7): token
    counts are integers, so the per-language (lang, n_toks) count table
    is the full distribution — no per-group value buffering even on a
    one-language corpus, where the previous grouped ``percentile()``
    buffered every document."""
    from ..functions.quantiles import distribution_quantiles

    docs = _docs(spark, sf_dir)
    toks = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    ps = (0.25, 0.5, 0.75, 0.95)
    tok_tbl = docs.select("lang", toks.alias("n_toks")).localCheckpoint(eager=False)
    qs = distribution_quantiles(
        tok_tbl,
        "lang",
        "n_toks",
        ps,
        scale=1,
        wide_domain=False,  # token counts are max-doc-length-bounded
    )
    means = tok_tbl.groupBy("lang").agg(F.round(F.avg("n_toks"), 2).alias("mean_toks"))
    return (
        qs.join(means, "lang")
        .select(
            "lang",
            F.col("n_rows").alias("n_docs"),
            *[F.round(F.col(f"q{i}"), 2).alias(f"p{int(p * 100)}") for i, p in enumerate(ps)],
            "mean_toks",
        )
    )


# RAG chunking: fixed-size character windows with overlap. Stride =
# CHUNK_CHARS - CHUNK_OVERLAP; the last chunk may run short.
CHUNK_CHARS = 200
CHUNK_OVERLAP = 50


def q_chunk_documents(spark, sf_dir):
    """RAG document chunking audit: split every document into
    CHUNK_CHARS-char windows overlapping by CHUNK_OVERLAP (the
    retrieval-index prep step), emitting per chunk its index, start
    offset, actual length, and a 60-bit content fingerprint (the join
    key a chunk-level dedup or an embedding cache would use).

    Pure narrow projection: sequence() generates the start offsets,
    one explode emits the chunk grain — no shuffle at all; at 100 TB
    this runs at scan speed and the output partitioning inherits the
    input's. The fingerprint is md5-derived, identical in both
    engines."""
    stride = CHUNK_CHARS - CHUNK_OVERLAP
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    chunk = f"substring(text, p, {CHUNK_CHARS})"
    fp = "CAST(conv(substring(md5(" + chunk + "), 1, 15), 16, 10) AS BIGINT)"
    chunks = F.expr(
        f"transform(sequence(1, greatest(1, length(text)), {stride}), "
        f"p -> struct(p AS start_pos, length({chunk}) AS chunk_chars, {fp} AS chunk_fp))"
    )
    return (
        docs.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "c"))
        .select(
            "doc_id",
            "chunk_idx",
            F.col("c.start_pos").alias("start_pos"),
            F.col("c.chunk_chars").alias("chunk_chars"),
            F.col("c.chunk_fp").alias("chunk_fp"),
        )
        # drop zero-length tails (start beyond end can't happen with the
        # greatest(1, len) floor, but an empty text yields one empty chunk)
        .filter(F.col("chunk_chars") > 0)
    )


def q_ngram_novelty(spark, sf_dir):
    """N-gram novelty score: per document, the share of its word-3-gram
    OCCURRENCES that appear in no other document (corpus df == 1) — high
    novelty marks genuinely new content, low novelty marks boilerplate
    and templated text; the selection signal data-curation pipelines rank
    by before sampling. One gram-grain df aggregation (distinct-doc
    count, combiner-friendly), one score join on the gram, one doc
    aggregation. The gram array materializes behind the dedup barrier so
    the HOF isn't re-evaluated per exploded row; docs under 3 tokens have
    no grams and drop out in both engines."""
    from .dedup import _barrier
    from ..sources.tables import load_table

    raw = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("toks"))
        .select(
            "doc_id",
            F.expr(
                # sequence(1, 0) DESCENDS in Spark — guard short docs explicitly
                "CASE WHEN size(toks) >= 3 THEN transform(sequence(1, size(toks) - 2), "
                "i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])) "
                "ELSE array() END"
            ).alias("grams"),
        )
    )
    grams = _barrier(raw, ["doc_id"], ["grams"]).select(
        "doc_id", F.explode("grams").alias("gram")
    )
    df = grams.groupBy("gram").agg(F.countDistinct("doc_id").alias("df"))
    return (
        grams.join(df, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.round(F.avg((F.col("df") == 1).cast("int")), 4).alias("novelty"),
        )
        .orderBy("doc_id")
    )


DOC_TOP_TOKENS = 3


def q_doc_top_tokens(spark, sf_dir):
    """Per-document top-3 tokens by frequency (keyword extraction's
    zeroth-order baseline): one (doc, token) aggregation, then a window
    PARTITIONED BY doc over the per-doc vocabulary — never a global
    sort; ties break alphabetically so the ranking is deterministic in
    both engines."""
    from ..sources.tables import load_table

    toks = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    counts = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("n"))
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(F.desc("n"), "tok")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= DOC_TOP_TOKENS)
        .select("doc_id", "rk", F.col("tok").alias("token"), "n")
        .orderBy("doc_id", "rk")
    )


# --- BM25 retrieval ----------------------------------------------------------
BM25_K1 = 1.2
BM25_B = 0.75
BM25_QK = 3   # query = the QK highest-df corpus tokens (deterministic)
BM25_TOPK = 10


def q_bm25_topk(spark, sf_dir):
    """BM25 top-k retrieval over the corpus (Robertson/Spärck Jones
    probabilistic ranking, the retrieval baseline every RAG pipeline
    benchmarks against). The query is data-derived and deterministic: the
    BM25_QK most-common corpus tokens (df-ranked, lexicographic
    tie-break), so the operator is self-contained on any corpus.

    Determinism across engines: tf/df/dl/N are exact integers; avgdl is
    SUM(dl)/N on exact longs; idf uses the standard
    ln(1 + (N - df + 0.5)/(df + 0.5)) form; per-(doc, term) partials
    QUANTIZE TO INTEGER MICROS before the per-doc sum (long addition is
    associative — rounded doubles are not), and the final score divides
    back once. Shuffle shape at 100 TB: one token-grain tf
    aggregation, a df contraction, a broadcast of the QK-row query-term
    table, one doc-grain sum, TakeOrdered top-k — no pair joins, no
    global sort."""
    d = _docs_with_toks(spark, sf_dir)
    toks = d.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("tok"))
    tf = toks.groupBy("doc_id", "dl", "tok").agg(F.count("*").alias("tf"))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    stats = d.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("toks")).alias("sum_dl"),
    )
    qterms = (
        df.orderBy(F.desc("df"), "tok")
        .limit(BM25_QK)
        .select("tok", "df")
    )
    scored = (
        tf.join(F.broadcast(qterms), "tok")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.expr(
                f"CAST(ROUND(ln(1 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) * "
                f"(tf / (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * "
                f"dl / (CAST(sum_dl AS DOUBLE) / n_docs)))) * 1000000) AS BIGINT)"
            ).alias("micros"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_query_terms_hit"),
            (F.sum("micros").cast("double") / F.lit(1000000)).alias("bm25"),
        )
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(BM25_TOPK)
    )


ZIPF_TOPV = 100


def q_token_zipf_fit(spark, sf_dir):
    """Zipf's-law fit of the corpus token-frequency curve: least-squares
    slope/intercept/r² of ln(freq) on ln(rank) over the ZIPF_TOPV
    most-frequent tokens — the standard sanity check that a scraped
    corpus has natural-language token statistics (slope ≈ -1) rather
    than boilerplate/spam (flat head) or template explosion (cliff).

    Determinism: ln terms quantize to integer micros (half-up floor) and
    every regression sum (Σx, Σy, Σx², Σxy, Σy²) is an exact BIGINT over
    the rank-bounded 100-row frame; slope/intercept/r² are then single
    identically-shaped double expressions in both engines. Headroom:
    ln(freq) < 37 even at 1e16 tokens ⇒ y-micros < 3.7e7, n·Σy² < 1.4e17
    — inside BIGINT. Scale shape: one token-grain aggregation feeding
    TakeOrdered(TOPV); the row_number window runs on the bounded head
    only. n <= 1 or a degenerate head yields NULL fit fields (try_divide)
    in both engines."""
    d = _docs_with_toks(spark, sf_dir)
    tf = (
        d.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    top = (
        tf.orderBy(F.desc("freq"), "tok")
        .limit(ZIPF_TOPV)
        .withColumn(
            "rank", F.row_number().over(Window.orderBy(F.desc("freq"), "tok"))
        )
    )
    t = top.select(
        F.expr(
            "CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000D + 0.5D) AS BIGINT)"
        ).alias("xm"),
        F.expr(
            "CAST(floor(ln(CAST(freq AS DOUBLE)) * 1000000D + 0.5D) AS BIGINT)"
        ).alias("ym"),
    )
    s = t.agg(
        F.count("*").alias("n"),
        F.sum("xm").alias("sx"),
        F.sum("ym").alias("sy"),
        F.sum(F.expr("xm * xm")).alias("sxx"),
        F.sum(F.expr("xm * ym")).alias("sxy"),
        F.sum(F.expr("ym * ym")).alias("syy"),
    )
    return s.select(
        F.col("n").alias("n_tokens"),
        F.expr(
            "try_divide(CAST(n * sxy - sx * sy AS DOUBLE), CAST(n * sxx - sx * sx AS DOUBLE))"
        ).alias("zipf_slope"),
        F.expr(
            "try_divide(CAST(sy AS DOUBLE) - "
            "try_divide(CAST(n * sxy - sx * sy AS DOUBLE), CAST(n * sxx - sx * sx AS DOUBLE)) "
            "* CAST(sx AS DOUBLE), CAST(n AS DOUBLE) * 1000000D)"
        ).alias("zipf_intercept"),
        F.expr(
            "try_divide(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE), "
            "CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))"
        ).alias("r2"),
    )


def q_lexical_richness_audit(spark, sf_dir):
    """Per-source lexical-richness profile: type-token ratio, hapax
    share (vocabulary still growing ⇒ high hapax share, Zipf's tail),
    and Simpson's repeat-rate diversity Σf(f−1)/(N(N−1)) — the
    corpus-linguistics fingerprint that separates template-generated
    sources from natural ones next to token_zipf_fit's slope.

    Scale shape: one corpus-sized aggregation to the (source, token)
    frequency grain, then a per-source contraction; every statistic is
    a ratio of exact integer sums (f, f², N are bigints) so the floats
    are deterministic cross-engine."""
    tok = (
        _docs(spark, sf_dir)
        .select("source", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count("*").alias("f"))
    )
    per_src = tok.groupBy("source").agg(
        F.sum("f").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum((F.col("f") == 1).cast("long")).alias("n_hapax"),
        F.sum(F.col("f") * (F.col("f") - 1)).alias("rep2"),
    )
    n = F.col("n_tokens")
    return per_src.select(
        "source",
        "n_tokens",
        "n_types",
        "n_hapax",
        F.round(F.col("n_types") / n, 6).alias("ttr"),
        F.round(F.col("n_hapax") / F.col("n_types"), 6).alias("hapax_share"),
        F.round(F.col("rep2") / (n * (n - 1)), 8).alias("simpson_repeat"),
    )


PMI_VOCAB = 50  # co-occurrence restricted to the top-V df vocabulary
PMI_MIN_COOC = 5
PMI_TOPK = 20


def q_token_pmi_topk(spark, sf_dir):
    """Top-|PMI_TOPK| token pairs by document-level pointwise mutual
    information — the word-association screen (collocations, template
    phrases) over the corpus, the text twin of event_type_pmi.

    Scale shape: co-occurrence is restricted to the top-PMI_VOCAB
    document-frequency vocabulary FIRST (a TakeOrdered top-V → V-row
    broadcast, the vocab_oov_audit pattern), so the per-document pair
    fan-out is bounded by V²/2 by construction — never |doc|² over raw
    tokens. One corpus-sized aggregation to the (doc, tok) presence
    grain; everything after lives at ≤V·docs rows. PMI = ln(N·c_ab /
    (c_a·c_b)) from exact integer counts (deterministic cross-engine)."""
    presence = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
    )
    vocab = (
        presence.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), "tok")
        .limit(PMI_VOCAB)
    )
    pv = presence.join(F.broadcast(vocab), "tok")
    a = pv.select("doc_id", F.col("tok").alias("tok_a"), F.col("df").alias("c_a"))
    b = pv.select("doc_id", F.col("tok").alias("tok_b"), F.col("df").alias("c_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b", "c_a", "c_b")
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= PMI_MIN_COOC)
    )
    n_docs = _docs(spark, sf_dir).agg(F.count("*").alias("n_docs"))
    pmi = F.log(
        (F.col("c_ab").cast("double") * F.col("n_docs").cast("double"))
        / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
    )
    return (
        pairs.crossJoin(F.broadcast(n_docs))
        .select(
            "tok_a",
            "tok_b",
            "c_ab",
            "c_a",
            "c_b",
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "tok_a", "tok_b")
        .limit(PMI_TOPK)
    )


def q_text_readability(spark, sf_dir):
    """Flesch reading-ease / Flesch-Kincaid grade per document — the
    classic readability quality signal (Kincaid 1975) next to the
    Gopher-style heuristics in q_quality_score. Syllables are the
    standard cheap proxy: vowel-group runs ([aeiouy]+), counted with the
    replace-length trick so the count is an EXACT integer in both
    engines; sentences are [.!?]+ runs clamped to ≥1. Pure narrow
    projection over the documents scan — no shuffle, no UDF."""
    # one regexp_count pass per metric (the replace-length identity the
    # oracle keeps costs TWO full replace passes + copies per metric —
    # measured 2x the wall on the sf1 soak's regex-bound profile); the
    # match COUNTS are identical integers, so the DuckDB twin stays the
    # independent implementation
    sylls = F.regexp_count(F.lower("text"), F.lit("[aeiouy]+"))
    sents = F.regexp_count("text", F.lit("[.!?]+"))
    words = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))
    )
    d = _docs(spark, sf_dir).select(
        "doc_id",
        words.alias("n_words"),
        F.greatest(sents, F.lit(1)).alias("n_sentences"),
        sylls.alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    wps = F.col("n_words") / F.col("n_sentences")
    spw = F.col("n_syllables") / F.col("n_words")
    return d.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 4).alias(
            "flesch_ease"
        ),
        F.round(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 4).alias(
            "fk_grade"
        ),
    )


QUERIES = {
    "lexical_richness_audit": q_lexical_richness_audit,
    "token_pmi_topk": q_token_pmi_topk,
    "text_readability": q_text_readability,
    "bm25_topk": q_bm25_topk,
    "token_zipf_fit": q_token_zipf_fit,
    "doc_top_tokens": q_doc_top_tokens,
    "ngram_novelty": q_ngram_novelty,
    "text_length_percentiles": q_length_percentiles,
    "text_token_count": q_token_count,
    "chunk_documents": q_chunk_documents,
    "fuzzy_name_pairs": q_fuzzy_name_pairs,
    "pack_sequences": q_pack_sequences,
    "text_quality_score": q_quality_score,
    "text_lang_id": q_lang_id,
    "text_fingerprint": q_fingerprint,
    "text_repetition_filter": q_repetition_filter,
    "text_pii_scrub": q_pii_scrub,
}

ORACLES = {
    "token_zipf_fit": rf"""
        WITH d AS (
            SELECT doc_id,
                   list_filter(string_split_regex(trim(text), '\s+'),
                               t -> t != '') AS toks
            FROM documents
        ),
        tf AS (
            SELECT u.tok, COUNT(*) AS freq
            FROM d, LATERAL (SELECT UNNEST(toks) AS tok) u
            GROUP BY u.tok
        ),
        top AS (
            SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rank
            FROM (SELECT * FROM tf ORDER BY freq DESC, tok LIMIT {ZIPF_TOPV})
        ),
        t AS (
            SELECT CAST(floor(ln(rank::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xm,
                   CAST(floor(ln(freq::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS ym
            FROM top
        ),
        s AS (
            SELECT COUNT(*) AS n,
                   SUM(xm) AS sx, SUM(ym) AS sy,
                   SUM(xm * xm) AS sxx, SUM(xm * ym) AS sxy,
                   SUM(ym * ym) AS syy
            FROM t
        )
        SELECT n AS n_tokens,
               CASE WHEN (n * sxx - sx * sx) = 0 THEN NULL
                    ELSE CAST(n * sxy - sx * sy AS DOUBLE) /
                         CAST(n * sxx - sx * sx AS DOUBLE) END AS zipf_slope,
               CASE WHEN n = 0 THEN NULL
                    ELSE (CAST(sy AS DOUBLE) -
                          (CASE WHEN (n * sxx - sx * sx) = 0 THEN NULL
                                ELSE CAST(n * sxy - sx * sy AS DOUBLE) /
                                     CAST(n * sxx - sx * sx AS DOUBLE) END)
                          * CAST(sx AS DOUBLE)) /
                         (CAST(n AS DOUBLE) * 1000000) END AS zipf_intercept,
               CASE WHEN (CAST(n * sxx - sx * sx AS DOUBLE) *
                          CAST(n * syy - sy * sy AS DOUBLE)) = 0 THEN NULL
                    ELSE (CAST(n * sxy - sx * sy AS DOUBLE) *
                          CAST(n * sxy - sx * sy AS DOUBLE)) /
                         (CAST(n * sxx - sx * sx AS DOUBLE) *
                          CAST(n * syy - sy * sy AS DOUBLE)) END AS r2
        FROM s
    """,
    "bm25_topk": rf"""
        WITH d AS (
            SELECT doc_id,
                   list_filter(string_split_regex(trim(text), '\s+'),
                               t -> t != '') AS toks
            FROM documents
        ),
        tokrows AS (
            SELECT doc_id, len(toks) AS dl, u.tok
            FROM d, LATERAL (SELECT UNNEST(toks) AS tok) u
        ),
        tf AS (
            SELECT doc_id, dl, tok, COUNT(*) AS tf
            FROM tokrows GROUP BY 1, 2, 3
        ),
        dft AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
        stats AS (
            SELECT COUNT(*) AS n_docs, SUM(len(toks)) AS sum_dl FROM d
        ),
        qterms AS (
            SELECT tok, df FROM dft ORDER BY df DESC, tok LIMIT {BM25_QK}
        ),
        scored AS (
            SELECT tf.doc_id,
                   CAST(ROUND(ln(1 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5)) *
                        (tf / (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} *
                         dl / (CAST(sum_dl AS DOUBLE) / n_docs)))) * 1000000)
                        AS BIGINT) AS micros
            FROM tf JOIN qterms USING (tok), stats
        )
        SELECT doc_id, COUNT(*) AS n_query_terms_hit,
               CAST(SUM(micros) AS DOUBLE) / 1000000 AS bm25
        FROM scored GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOPK}
    """,
    "doc_top_tokens": rf"""
        WITH toks AS (
            SELECT doc_id, u.tok
            FROM (
                SELECT doc_id,
                       list_filter(string_split_regex(trim(text), '\s+'),
                                   t -> t != '') AS ts
                FROM documents
            ), LATERAL (SELECT UNNEST(ts) AS tok) u
        ),
        counts AS (
            SELECT doc_id, tok, COUNT(*) AS n FROM toks GROUP BY 1, 2
        )
        SELECT doc_id, rk, tok AS token, n FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY n DESC, tok) AS rk
            FROM counts
        ) WHERE rk <= {DOC_TOP_TOKENS}
        ORDER BY doc_id, rk
    """,
    "ngram_novelty": """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        ),
        g AS (
            SELECT doc_id,
                   UNNEST(list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                                         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                     AS gram
            FROM t
        ),
        d AS (SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY 1)
        SELECT g.doc_id, COUNT(*) AS n_grams,
               ROUND(AVG(CASE WHEN d.df = 1 THEN 1 ELSE 0 END), 4) AS novelty
        FROM g JOIN d USING (gram)
        GROUP BY g.doc_id ORDER BY g.doc_id
    """,
    "chunk_documents": f"""
        WITH c AS (
            SELECT doc_id, text, u.p AS start_pos, u.pos AS pos1
            FROM (SELECT doc_id, text,
                         generate_series(1, greatest(1, length(text)),
                                         {CHUNK_CHARS - CHUNK_OVERLAP}) AS ps
                  FROM documents),
                 LATERAL (SELECT UNNEST(ps) AS p,
                                 generate_subscripts(ps, 1) AS pos) u
        )
        SELECT doc_id, pos1 - 1 AS chunk_idx, start_pos,
               length(substr(text, start_pos, {CHUNK_CHARS})) AS chunk_chars,
               CAST('0x' || substr(md5(substr(text, start_pos, {CHUNK_CHARS})), 1, 15) AS BIGINT)
                 AS chunk_fp
        FROM c
        WHERE length(substr(text, start_pos, {CHUNK_CHARS})) > 0
    """,
    "text_length_percentiles": rf"""
        WITH tok_tbl AS (
            SELECT lang,
                   CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                     AS n_toks
            FROM documents
        ),
        qs AS (
            SELECT lang, n_rows,
                   ROUND(q0, 2) AS p25, ROUND(q1, 2) AS p50,
                   ROUND(q2, 2) AS p75, ROUND(q3, 2) AS p95
            FROM ({distribution_quantiles_duck(
                "SELECT lang, n_toks FROM tok_tbl",
                "lang",
                "n_toks",
                (0.25, 0.5, 0.75, 0.95),
                scale=1,
            )})
        ),
        means AS (
            SELECT lang, ROUND(AVG(n_toks), 2) AS mean_toks
            FROM tok_tbl GROUP BY lang
        )
        SELECT lang, n_rows AS n_docs, p25, p50, p75, p95, mean_toks
        FROM qs JOIN means USING (lang)
    """,
    "text_repetition_filter": rf"""
        WITH t AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM documents
        ),
        g AS (
            SELECT doc_id, toks,
                   CASE WHEN len(toks) >= 2 THEN
                     list_transform(generate_series(1, len(toks) - 1),
                                    i -> toks[i] || ' ' || toks[i+1])
                   ELSE [] END AS bg
            FROM t
        ),
        fr AS (
            SELECT doc_id,
                   ROUND(1.0 - len(list_distinct(toks)) / len(toks), 4)
                     AS dup_token_frac,
                   CASE WHEN len(bg) = 0 THEN NULL
                        ELSE ROUND(list_max(list_transform(list_distinct(bg),
                                 x -> len(list_filter(bg, y -> y = x))))
                             / CAST(len(bg) AS DOUBLE), 4)
                   END AS top_bigram_frac
            FROM g
        )
        SELECT doc_id, dup_token_frac, top_bigram_frac,
               (dup_token_frac < {REP_MAX_DUP_TOKEN_FRAC}
                AND top_bigram_frac < {REP_MAX_TOP_BIGRAM_FRAC})
                 AS passes_repetition
        FROM fr
    """,
    "text_pii_scrub": f"""
        SELECT doc_id,
               len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones,
               md5(regexp_replace(
                     regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                     '{PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5
        FROM documents
    """,
    "pack_sequences": rf"""
        WITH t AS (
            SELECT lang, doc_id, doc_id % {PACK_SHARDS} AS shard_id,
                   len(string_split_regex(trim(text), '\s+')) AS n_toks
            FROM documents
        ),
        off AS (
            SELECT lang, shard_id, doc_id, n_toks,
                   SUM(n_toks) OVER (PARTITION BY lang, shard_id ORDER BY doc_id)
                     - n_toks AS start_off
            FROM t
        )
        SELECT lang, CAST(shard_id AS BIGINT) AS shard_id,
               CAST(start_off // {PACK_CONTEXT_TOKENS} AS BIGINT) AS window_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_toks) AS BIGINT) AS n_tokens
        FROM off
        GROUP BY 1, 2, 3
    """,
    "fuzzy_name_pairs": f"""
        WITH segs AS (
            SELECT s_suppkey, i AS seg_idx,
                   substring(s_name,
                             (i * length(s_name)) // {FUZZY_SEGMENTS} + 1,
                             ((i + 1) * length(s_name)) // {FUZZY_SEGMENTS}
                             - (i * length(s_name)) // {FUZZY_SEGMENTS}) AS seg_val
            FROM supplier, generate_series(0, {FUZZY_SEGMENTS - 1}) t(i)
        ),
        cand AS (
            SELECT DISTINCT a.s_suppkey AS sup_a, b.s_suppkey AS sup_b
            FROM segs a JOIN segs b
              ON a.seg_idx = b.seg_idx AND a.seg_val = b.seg_val
             AND a.s_suppkey < b.s_suppkey
        )
        SELECT sup_a, sup_b,
               CAST(levenshtein(na.s_name, nb.s_name) AS INT) AS edit_dist
        FROM cand
        JOIN supplier na ON na.s_suppkey = sup_a
        JOIN supplier nb ON nb.s_suppkey = sup_b
        WHERE levenshtein(na.s_name, nb.s_name) <= {FUZZY_MAX_EDIT}
    """,
    "lexical_richness_audit": r"""
        WITH tok AS (
            SELECT source, tok, COUNT(*) AS f
            FROM (SELECT source,
                         UNNEST(string_split_regex(trim(text), '\s+')) AS tok
                  FROM documents)
            WHERE tok <> ''
            GROUP BY 1, 2
        ),
        per_src AS (
            SELECT source,
                   SUM(f) AS n_tokens,
                   COUNT(*) AS n_types,
                   SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS n_hapax,
                   SUM(f * (f - 1)) AS rep2
            FROM tok GROUP BY 1
        )
        SELECT source,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_types AS BIGINT) AS n_types,
               CAST(n_hapax AS BIGINT) AS n_hapax,
               ROUND(n_types / CAST(n_tokens AS DOUBLE), 6) AS ttr,
               ROUND(n_hapax / CAST(n_types AS DOUBLE), 6) AS hapax_share,
               ROUND(rep2 / CAST(n_tokens * (n_tokens - 1) AS DOUBLE), 8)
                 AS simpson_repeat
        FROM per_src
    """,
    "token_pmi_topk": rf"""
        WITH presence AS (
            SELECT DISTINCT doc_id, tok
            FROM (SELECT doc_id,
                         UNNEST(string_split_regex(trim(text), '\s+')) AS tok
                  FROM documents)
            WHERE tok <> ''
        ),
        vocab AS (
            SELECT tok, COUNT(*) AS df FROM presence
            GROUP BY tok ORDER BY df DESC, tok LIMIT {PMI_VOCAB}
        ),
        pv AS (
            SELECT p.doc_id, p.tok, v.df
            FROM presence p JOIN vocab v USING (tok)
        ),
        pairs AS (
            SELECT a.tok AS tok_a, b.tok AS tok_b,
                   a.df AS c_a, b.df AS c_b, COUNT(*) AS c_ab
            FROM pv a JOIN pv b
              ON a.doc_id = b.doc_id AND a.tok < b.tok
            GROUP BY 1, 2, 3, 4
            HAVING COUNT(*) >= {PMI_MIN_COOC}
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT tok_a, tok_b,
               CAST(c_ab AS BIGINT) AS c_ab,
               CAST(c_a AS BIGINT) AS c_a,
               CAST(c_b AS BIGINT) AS c_b,
               ROUND(LN((CAST(c_ab AS DOUBLE) * CAST(n_docs AS DOUBLE))
                        / (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE))), 6)
                 AS pmi
        FROM pairs, n
        ORDER BY pmi DESC, tok_a, tok_b
        LIMIT {PMI_TOPK}
    """,
    "text_readability": r"""
        WITH d AS (
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\s+'))
                   END AS n_words,
                   GREATEST(
                       length(regexp_replace(text, '[.!?]+', '#', 'g'))
                       - length(regexp_replace(text, '[.!?]+', '', 'g')),
                       1) AS n_sentences,
                   length(regexp_replace(lower(text), '[aeiouy]+', '#', 'g'))
                   - length(regexp_replace(lower(text), '[aeiouy]+', '', 'g'))
                     AS n_syllables
            FROM documents
        )
        SELECT doc_id,
               CAST(n_words AS INT) AS n_words,
               CAST(n_sentences AS INT) AS n_sentences,
               CAST(n_syllables AS INT) AS n_syllables,
               ROUND(206.835 - 1.015 * (n_words / CAST(n_sentences AS DOUBLE))
                     - 84.6 * (n_syllables / CAST(n_words AS DOUBLE)), 4)
                 AS flesch_ease,
               ROUND(0.39 * (n_words / CAST(n_sentences AS DOUBLE))
                     + 11.8 * (n_syllables / CAST(n_words AS DOUBLE)) - 15.59, 4)
                 AS fk_grade
        FROM d WHERE n_words > 0
    """,
    "text_token_count": rf"""
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS INT) AS ws_tokens,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS bpe_tokens,
               CAST(length(text) AS INT) AS chars
        FROM documents
    """,
    "text_quality_score": rf"""
        WITH t AS (
            SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks
            FROM documents
        )
        SELECT doc_id,
               CAST(len(toks) AS INT) AS n_tokens,
               ROUND(length(text) / len(toks), 4) AS avg_token_len,
               ROUND(len(list_filter(toks, t -> t IN {_SW_SQL})) / len(toks), 4) AS stopword_ratio,
               ROUND(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text), 4) AS alpha_ratio,
               (len(toks) >= 5
                AND len(list_filter(toks, t -> t IN {_SW_SQL})) / len(toks) > 0.01
                AND length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text) > 0.5
               ) AS passes_quality
        FROM t
    """,
    "text_lang_id": rf"""
        WITH t AS (
            SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS toks
            FROM documents
        ),
        r AS (
            SELECT doc_id, lang,
                   len(list_filter(toks, t -> t IN {_SW_SQL})) / len(toks) AS ratio
            FROM t
        )
        SELECT doc_id,
               ROUND(ratio, 4) AS en_stopword_ratio,
               CASE WHEN ratio >= 0.02 THEN 'en' ELSE 'unknown' END AS predicted_lang,
               lang AS labeled_lang,
               (CASE WHEN ratio >= 0.02 THEN 'en' ELSE 'unknown' END = lang) AS agrees
        FROM r
    """,
    "text_fingerprint": r"""
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint,
               CAST('0x' || substr(md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), 1, 15) AS BIGINT) AS fingerprint_60bit
        FROM documents
    """,
}
