"""Deduplication operators for training-data pipelines.

Four families, all shuffle-aware and 100 TB-ready:

- exact          — hash-groupBy on a content fingerprint (one shuffle on the
                   digest, combiner-side partial agg).
- n-gram Jaccard — word-3-gram shingle sets; candidate pairs blocked by a
                   cheap key (language) so the pair join is per-block, never
                   the full cross product.
- MinHash + LSH  — 16 permutation hashes, 4 bands × 4 rows; candidate pairs
                   are the band-bucket join (the scale path: cost is
                   O(docs × bands), not O(docs²)).
- SimHash        — 32-bit signature via per-bit majority over token hashes;
                   Hamming-distance pairs blocked on the top-16 bits.

All hash functions derive from md5 (identical across Spark and DuckDB), so
every operator has a full value-level oracle — no "trust me" checks.
Expressions are JVM-side built-ins (higher-order array functions); Python
never touches row data.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.local_frame import arrow_local_df

# MinHash parameters (fixed, shared with oracles).
MINHASH_P = 2147483647  # 2^31 - 1 (Mersenne prime)
MINHASH_A = [7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67]
MINHASH_B = [3, 5, 7, 9, 11, 13, 15, 17, 19, 21, 23, 25, 27, 29, 31, 33]
N_BANDS, ROWS_PER_BAND = 4, 4
SIMHASH_BITS = 32
JACCARD_THRESHOLD = 0.2

# Document-frequency cap on posting lists: shingles appearing in more than
# this many documents (stop-phrases — "of the and", boilerplate headers) are
# dropped before pair emission. This bounds the Σ|posting|² pair-explosion
# at cap²·n_hot on adversarial corpora while staying a no-op on natural text
# (fixture max |posting| = 14 at sf0.1). Near-dups sharing ONLY stop-phrases
# are below any useful Jaccard threshold anyway, so the cap costs ~nothing
# in recall and is what makes the inverted index safe at 100 TB.
MAX_POSTING_DF = 64

# Hot-bucket cap on LSH band buckets: a band bucket with more than this
# many members is dropped before the pair join. The band-bucket self-join
# is |bucket|² — one degenerate bucket (mass-duplicated boilerplate, 10k
# identical docs) turns O(n·bands) into 50M pairs. Same df-cap discipline
# as MAX_POSTING_DF: a no-op on natural text (measured max bucket = 14 at
# sf0.1, 16x headroom) that bounds pairs-per-bucket at cap² on adversarial
# corpora. Semantics note: >256 docs sharing a full band of MinHash sigs
# are (near-)identical at scale — exact dedup (q_dedup_exact's fingerprint
# groupBy, which has no quadratic stage) is the operator responsible for
# mass-identical content; LSH owns the long tail of near-dups. Both
# engines apply the cap identically, so oracles stay value-exact.
MAX_BAND_BUCKET = 256

# --- shared expression builders (Spark SQL strings) -------------------------

# word 3-gram shingle set from a single-space-tokenized text column
_SHINGLES_SPARK = (
    "array_distinct(CASE WHEN size(toks) >= 3 THEN "
    "transform(sequence(1, size(toks) - 2), "
    "i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])) "
    "ELSE array() END)"
)
_SHINGLES_DUCK = (
    "list_distinct(list_transform(generate_series(1, len(toks) - 2), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
)

# md5-derived 32-bit integer hash of a string expression
def _h32_spark(expr: str) -> str:
    return f"CAST(conv(substring(md5({expr}), 1, 8), 16, 10) AS BIGINT)"


def _h32_duck(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"


# 60-bit variant: posting-list keys (collision odds ~n^2/2^61 — negligible
# even at 10^12 shingles; and both engines hash identically, so the oracle
# match is exact regardless)
def _h60_spark(expr: str) -> str:
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def _h60_duck(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def _minhash_sig_spark(j: int) -> str:
    a, b = MINHASH_A[j], MINHASH_B[j]
    return f"array_min(transform(hs, h -> ({a}L * h + {b}L) % {MINHASH_P}L))"


def _minhash_sig_duck(j: int) -> str:
    a, b = MINHASH_A[j], MINHASH_B[j]
    return f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {MINHASH_P}))"


def _simhash_spark() -> str:
    terms = []
    for b in range(SIMHASH_BITS):
        s = f"aggregate(hs, 0L, (acc, h) -> acc + CASE WHEN (shiftright(h, {b}) & 1) = 1 THEN 1 ELSE -1 END)"
        terms.append(f"CASE WHEN {s} > 0 THEN shiftleft(CAST(1 AS BIGINT), {b}) ELSE 0L END")
    return " + ".join(terms)


def _simhash_duck() -> str:
    terms = []
    for b in range(SIMHASH_BITS):
        s = f"list_sum(list_transform(hs, h -> CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END))"
        terms.append(f"CASE WHEN {s} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE CAST(0 AS BIGINT) END")
    return " + ".join(terms)


def _docs(spark, sf_dir):
    # single-file fixture → single input split; spread the (CPU-heavy)
    # shingle/hash expressions across all cores. At real scale the scan
    # arrives pre-split, making this a no-op-sized shuffle of ids+text.
    return spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def _barrier(df, key_cols: list[str], val_cols: list[str]):
    """Materialization barrier for expensive computed array columns.

    Catalyst's CollapseProject inlines a computed expression into every
    downstream reference — including explode generators, where it gets
    re-evaluated per OUTPUT row (measured: the shingle explode at sf0.1 is
    6.4 s inlined vs 0.6 s materialized), and the 16/64-fold references in
    the MinHash/SimHash signature expressions. A groupBy on the primary key
    forces the values through an exchange, so downstream sees plain
    attributes. Exact because key_cols contain the PK; at scale this is one
    linear combiner-less shuffle of (key, arrays) — the same bytes the
    posting-list shuffle moves anyway.
    """
    return df.groupBy(*key_cols).agg(*[F.first(c).alias(c) for c in val_cols])


def _with_shingles(spark, sf_dir):
    """(doc_id, lang, sh) with sh materialized behind a barrier."""
    raw = (
        _docs(spark, sf_dir)
        .withColumn("toks", F.split("text", " "))
        .withColumn("sh", F.expr(_SHINGLES_SPARK))
    )
    return _barrier(raw, ["doc_id", "lang"], ["sh"])


def _with_shingle_hashes(spark, sf_dir):
    """(doc_id, lang, hs) — md5-derived 32-bit hash per shingle, materialized."""
    raw = (
        _docs(spark, sf_dir)
        .withColumn("toks", F.split("text", " "))
        .withColumn("sh", F.expr(_SHINGLES_SPARK))
        .withColumn("hs", F.expr(f"transform(sh, s -> {_h32_spark('s')})"))
    )
    return _barrier(raw, ["doc_id", "lang"], ["hs"])


# --- exact dedup --------------------------------------------------------------
def q_dedup_exact(spark, sf_dir):
    """Exact dedup: group on content digest, keep the smallest doc_id.
    One shuffle on the digest; at 100 TB pre-hash in the scan projection so
    only (digest, doc_id) shuffles, never the text."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.md5(F.encode("text", "UTF-8")).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


# --- incremental ingest dedup -------------------------------------------------
def q_dedup_incremental(spark, sf_dir):
    """Incremental-ingest dedup: a new crawl drop (here: doc_id % 3 == 0)
    deduped against the fingerprint REGISTRY of the already-ingested
    corpus (the other docs), then within itself — the shape every
    continuously-fed corpus runs per drop, instead of re-deduping 100 TB
    from scratch. Plan: the batch left-anti-joins the registry on the
    content digest (hashes shuffle, never text) and the survivors
    hash-aggregate to first-copy-per-digest. The registry side is the
    100 TB one — it must NEVER broadcast (same direction lesson as
    insert_rows' anti-join, operators/mutation.py:37); plan-guarded by
    test_plan_shapes.test_incremental_dedup_never_broadcasts_registry."""
    docs = _docs(spark, sf_dir)
    fp = F.md5(F.encode("text", "UTF-8"))
    batch = docs.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id", fp.alias("text_hash")
    )
    registry = docs.filter(F.col("doc_id") % 3 != 0).select(fp.alias("text_hash"))
    return (
        batch.join(registry, "text_hash", "left_anti")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_batch_copies"),
        )
    )


# --- n-gram Jaccard near-dup -----------------------------------------------------
def q_dedup_ngram_jaccard(spark, sf_dir, max_posting_df: int = MAX_POSTING_DF):
    """Near-dup pairs by word-3-gram Jaccard >= 0.2 via an inverted shingle
    index: explode (doc, shingle), equi-join on the shingle, count common
    shingles per pair, then Jaccard = c / (|A| + |B| - c).

    EXACT on natural text (a pair needs >= 1 common shingle to have
    Jaccard > 0, so the index generates every qualifying candidate) yet
    never quadratic: cost is Σ_shingle |posting|², which stays linear-ish
    while shingles are near-unique (measured max posting = 14 at sf0.1; a
    blocked pair join was 160 s at sf0.1 — this plan is ~100x cheaper and
    is the one that survives 100x data). Postings hotter than
    ``max_posting_df`` docs (stop-phrases) are dropped before pair
    emission — see MAX_POSTING_DF."""
    common = _ngram_common(spark, sf_dir, max_posting_df)
    jac = F.round(
        F.try_divide(F.col("c"), F.col("na") + F.col("nb") - F.col("c")), 4
    )
    return (
        common.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


# Prefix-filter threshold as an exact rational (7/10) so the prefix length
# n - ceil(t*n) + 1 computes in INTEGER arithmetic on both sides of the
# filter proof — a double `ceil(0.7*n)` can land one ulp high on products
# that are exact in the reals (0.7*30 = 21.000000000000004 → ceil 22), which
# would shorten a prefix below the lossless bound and silently drop pairs.
PREFIX_T_NUM, PREFIX_T_DEN = 7, 10
PREFIX_JACCARD_T = PREFIX_T_NUM / PREFIX_T_DEN


def q_dedup_jaccard_prefix(spark, sf_dir):
    """Exact high-threshold Jaccard near-dup pairs (>= 0.7) via the
    prefix-filtering set-similarity join (All-Pairs / PPJoin family:
    Chaudhuri-Ganti-Kaushik ICDE 2006, Bayardo-Ma-Srikant WWW 2007,
    Xiao et al. WWW 2008) — the LOSSLESS scale path for dedup-grade
    thresholds, complementing q_dedup_ngram_jaccard (whose df-cap trades
    a sliver of stop-phrase recall for a pair bound at its looser 0.2
    threshold).

    Plan: order each doc's shingle set by ascending global document
    frequency (rarest first, ties on the hash — any total order shared by
    a doc pair preserves exactness; df-ascending is the one that keeps
    prefix postings small), keep only the first
    ``n - ceil(t*n) + 1`` shingles as the doc's PREFIX, and emit candidate
    pairs only from prefix postings. The prefix lemma guarantees every
    pair with Jaccard >= t shares at least one prefix token (the smallest
    common token under the shared order is inside both prefixes), so the
    candidate set is a superset of the answer; a per-candidate
    ``array_intersect`` verification then computes the exact score. The
    length filter (10*min >= 7*max, integer-exact) prunes candidates that
    cannot reach t before verification.

    Scale: at t=0.7 each doc indexes only ~30% of its shingles, and the
    indexed ones are its RAREST — prefix postings stay near-singleton on
    natural corpora without any recall-losing cap (stop-phrases sort
    last and never enter a prefix unless a doc is almost all
    boilerplate, in which case exact dedup owns it). Candidate
    verification joins move only id pairs plus the two shingle arrays;
    nothing is quadratic in the corpus."""
    raw = (
        _docs(spark, sf_dir)
        .withColumn("toks", F.split("text", " "))
        .withColumn("sh", F.expr(_SHINGLES_SPARK))
        .withColumn("sh60", F.expr("transform(sh, s -> xxhash64(s))"))
    )
    base = _barrier(raw, ["doc_id", "lang"], ["sh60"]).withColumn(
        "n_sh", F.size("sh60")
    )
    ex = base.select("doc_id", "lang", "n_sh", F.explode("sh60").alias("s"))
    dftab = ex.groupBy("lang", "s").agg(F.count("*").alias("dfc"))
    # integer-exact prefix length: n - ceil(7n/10) + 1 = n - (7n+9) div 10 + 1
    prefix_len = (
        F.col("n_sh")
        - F.expr(f"({PREFIX_T_NUM} * n_sh + {PREFIX_T_DEN - 1}) div {PREFIX_T_DEN}")
        + F.lit(1)
    )
    w = Window.partitionBy("doc_id").orderBy("dfc", "s")
    pref = (
        ex.join(dftab, ["lang", "s"])
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= prefix_len)
        .select("lang", "s", "doc_id", "n_sh")
    )
    # candidate pairs inline from each prefix posting (array_sort on the
    # (doc_id, n_sh) struct ⇒ doc_a < doc_b), with the integer length
    # filter applied before any pair row materializes
    posting = (
        pref.groupBy("lang", "s")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n_sh"))).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    pair = F.explode(
        F.expr(
            "flatten(transform(ds, (x, i) -> "
            "filter(transform(slice(ds, i + 2, size(ds)), y -> "
            "struct(x.doc_id AS doc_a, x.n_sh AS na, "
            "y.doc_id AS doc_b, y.n_sh AS nb)), "
            f"p -> {PREFIX_T_DEN} * p.na >= {PREFIX_T_NUM} * p.nb "
            f"AND {PREFIX_T_DEN} * p.nb >= {PREFIX_T_NUM} * p.na)))"
        )
    ).alias("p")
    cand = posting.select(pair).select("p.doc_a", "p.doc_b").distinct()
    # exact verification: re-attach the two shingle arrays by id (linear
    # equi-joins; candidate count is tiny relative to the corpus)
    da = base.select(
        F.col("doc_id").alias("doc_a"),
        F.col("sh60").alias("sa"),
        F.col("n_sh").alias("na"),
    )
    db = base.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sh60").alias("sb"),
        F.col("n_sh").alias("nb"),
    )
    c = F.size(F.array_intersect("sa", "sb"))
    jac = F.round(F.try_divide(c, F.col("na") + F.col("nb") - c), 4)
    return (
        cand.join(da, "doc_a")
        .join(db, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= PREFIX_JACCARD_T)
    )


def q_dedup_incremental_prefix(spark, sf_dir):
    """Incremental LOSSLESS near-dup ingest: the new batch (doc_id % 3
    == 0, the dedup_incremental slice convention) probes the registry's
    prefix index at Jaccard >= 0.7 — the exact-recall sibling of
    q_dedup_incremental_lsh (which estimates via MinHash bands) and the
    per-drop form of q_dedup_jaccard_prefix (which self-joins the whole
    corpus). Pairs exist only batch×registry, never registry×registry:
    ingesting B docs into an N-doc corpus probes B prefixes against the
    standing index instead of re-running the full self-join.

    The prefix lemma needs one total order SHARED by both sides of a
    pair — here ascending REGISTRY document frequency (ties on the
    hash), with batch-only tokens at df 0: any token order works for
    exactness, and registry-df-ascending keeps the probe join's hot side
    small (a batch-only token matches nothing; a stop-phrase sorts last
    and leaves every prefix). Candidates carry the integer length filter
    before verification; verification re-attaches the two shingle
    arrays by id. Output: (batch_doc, registry_doc, jaccard), exact."""
    raw = (
        _docs(spark, sf_dir)
        .withColumn("toks", F.split("text", " "))
        .withColumn("sh", F.expr(_SHINGLES_SPARK))
        .withColumn("sh60", F.expr("transform(sh, s -> xxhash64(s))"))
    )
    base = _barrier(raw, ["doc_id", "lang"], ["sh60"]).withColumn(
        "n_sh", F.size("sh60")
    )
    ex = base.select("doc_id", "lang", "n_sh", F.explode("sh60").alias("s"))
    dftab = (
        ex.filter(F.col("doc_id") % 3 != 0)
        .groupBy("lang", "s")
        .agg(F.count("*").alias("dfc"))
    )
    prefix_len = (
        F.col("n_sh")
        - F.expr(f"({PREFIX_T_NUM} * n_sh + {PREFIX_T_DEN - 1}) div {PREFIX_T_DEN}")
        + F.lit(1)
    )
    w = Window.partitionBy("doc_id").orderBy("dfc0", "s")
    pref = (
        ex.join(dftab, ["lang", "s"], "left")
        .withColumn("dfc0", F.coalesce("dfc", F.lit(0)))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= prefix_len)
        .select("lang", "s", "doc_id", "n_sh")
    )
    bp = pref.filter(F.col("doc_id") % 3 == 0).select(
        "lang", "s", F.col("doc_id").alias("batch_doc"), F.col("n_sh").alias("na")
    )
    rp = pref.filter(F.col("doc_id") % 3 != 0).select(
        "lang", "s", F.col("doc_id").alias("registry_doc"), F.col("n_sh").alias("nb")
    )
    cand = (
        bp.join(rp, ["lang", "s"])
        .filter(
            (PREFIX_T_DEN * F.col("na") >= PREFIX_T_NUM * F.col("nb"))
            & (PREFIX_T_DEN * F.col("nb") >= PREFIX_T_NUM * F.col("na"))
        )
        .select("batch_doc", "registry_doc")
        .distinct()
    )
    da = base.select(
        F.col("doc_id").alias("batch_doc"),
        F.col("sh60").alias("sa"),
        F.col("n_sh").alias("na"),
    )
    db = base.select(
        F.col("doc_id").alias("registry_doc"),
        F.col("sh60").alias("sb"),
        F.col("n_sh").alias("nb"),
    )
    c = F.size(F.array_intersect("sa", "sb"))
    jac = F.round(F.try_divide(c, F.col("na") + F.col("nb") - c), 4)
    return (
        cand.join(da, "batch_doc")
        .join(db, "registry_doc")
        .select("batch_doc", "registry_doc", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= PREFIX_JACCARD_T)
    )


def q_dedup_source_matrix(spark, sf_dir):
    """Cross-source duplication matrix: the near-dup pairs found by the
    3-gram Jaccard index, contracted to the (source, source) grain — the
    audit that answers "which sources copy from each other" before a
    corpus mixes them. Sources attach to the id-only pair set by two
    linear equi-joins (the LSH re-attach discipline); the unordered
    source pair canonicalizes with least/greatest so the matrix is
    direction-free. Constant-size output regardless of corpus size."""
    from ..sources.tables import load_table

    pairs = q_dedup_ngram_jaccard(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    da = docs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    db = docs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    return (
        pairs.join(da, "doc_a")
        .join(db, "doc_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.avg("jaccard"), 4).alias("avg_jaccard"),
        )
        .orderBy(F.desc("n_pairs"), "source_a", "source_b")
    )


def _ngram_common(spark, sf_dir, max_posting_df: int = MAX_POSTING_DF):
    """(doc_a, doc_b, na, nb, c): common-shingle count per candidate pair
    from the inverted 3-gram index, shared by the Jaccard and containment
    near-dup operators."""
    # Single pass: carry each doc's set size through the posting list as a
    # struct field, so no second subtree and no size-lookup joins exist.
    # Shingles shuffle as 64-bit hashes, not strings: the posting exchange
    # moves 8-byte ints (~3x smaller). xxhash64 (native, codegen-friendly)
    # rather than the md5-hex-conv path: these hashes never escape the
    # operator (the DuckDB oracle joins on raw shingle strings), so the
    # engines need not agree on values — only on set membership, which any
    # injective-enough hash preserves (64-bit collisions ~ n²/2^65). The
    # md5 swap halved the cold-JVM cost (10.2 s → 5.4 s first run at
    # sf0.1) because md5+conv is the JIT-heaviest expression in the tree.
    raw = (
        _docs(spark, sf_dir)
        .withColumn("toks", F.split("text", " "))
        .withColumn("sh", F.expr(_SHINGLES_SPARK))
        .withColumn("sh60", F.expr("transform(sh, s -> xxhash64(s))"))
    )
    ex = _barrier(raw, ["doc_id", "lang"], ["sh60"]).select(
        "doc_id", "lang", F.size("sh60").alias("n_sh"), F.explode("sh60").alias("s")
    )
    # posting list per (lang, shingle); singleton postings (the vast
    # majority) and hot stop-phrase postings (> max_posting_df docs) are
    # dropped before any pair exists. (If a corpus were so degenerate that
    # even collecting a hot posting is a memory risk, detect hot keys with
    # a count-only pre-agg and anti-join them out before the collect — the
    # barrier exchange is reused across both branches.)
    posting = (
        ex.groupBy("lang", "s")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "n_sh"))).alias("ds"))
        .filter((F.size("ds") > 1) & (F.size("ds") <= max_posting_df))
    )
    # emit pairs inline from each posting list (max observed |posting| = 14
    # → <= 91 pairs per shingle; no self-join, no recompute of the index)
    pair = F.explode(
        F.expr(
            "flatten(transform(ds, (x, i) -> "
            "transform(slice(ds, i + 2, size(ds)), y -> "
            "struct(x.doc_id AS doc_a, x.n_sh AS na, "
            "y.doc_id AS doc_b, y.n_sh AS nb))))"
        )
    ).alias("p")
    return (
        posting.select(pair)
        .select("p.doc_a", "p.doc_b", "p.na", "p.nb")
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("c"))
    )


# Threshold sweep for the dedup impact report: what fraction of the corpus
# a near-dup pass would touch at each candidate threshold — the number a
# pipeline owner reads BEFORE picking θ (too low deletes good data, too
# high ships duplicates). Values span the useful Jaccard range.
SWEEP_THRESHOLDS = [0.2, 0.3, 0.5, 0.7, 0.9]


def q_dedup_threshold_sweep(spark, sf_dir):
    """Dedup impact report: for each candidate Jaccard threshold θ, the
    count of near-dup pairs scoring >= θ and the count of distinct
    documents those pairs touch. One pass over the SAME inverted-index
    pair table as q_dedup_ngram_jaccard (computed once); the sweep is a
    broadcast of the |SWEEP_THRESHOLDS|-row θ table against the
    (tiny, post-threshold) pair set — never a data-grain cross join.
    Thresholds with zero pairs still report (0, 0) rows."""
    common = _ngram_common(spark, sf_dir)
    jac = F.round(
        F.try_divide(F.col("c"), F.col("na") + F.col("nb") - F.col("c")), 4
    )
    pairs = common.select("doc_a", "doc_b", jac.alias("j")).filter(
        F.col("j") >= min(SWEEP_THRESHOLDS)
    )
    thetas = arrow_local_df(
        spark, [(t,) for t in SWEEP_THRESHOLDS], "theta double"
    )
    hits = pairs.crossJoin(F.broadcast(thetas)).filter(F.col("j") >= F.col("theta"))
    aggp = hits.groupBy("theta").agg(F.count("*").alias("n_pairs"))
    aggd = (
        hits.select("theta", F.explode(F.array("doc_a", "doc_b")).alias("doc"))
        .groupBy("theta")
        .agg(F.countDistinct("doc").alias("n_docs_affected"))
    )
    return (
        thetas.join(aggp, "theta", "left")
        .join(aggd, "theta", "left")
        .select(
            "theta",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_docs_affected", F.lit(0)).alias("n_docs_affected"),
        )
        .orderBy("theta")
    )


# --- LSH banding planner -----------------------------------------------------
# Candidate configs for a 16-signature MinHash index: (bands, rows/band)
# with bands*rows = 16. The s-curve P(candidate | jaccard s) =
# 1 - (1 - s^r)^b decides the recall/cost trade; this operator applies it
# to the corpus's MEASURED pair-similarity distribution instead of a
# guessed one. Powers are all powers of two, so both engines evaluate
# them as explicit squaring chains — plain IEEE multiplication, identical
# bit-for-bit, where libm pow() can differ by an ulp between engines.
LSH_CONFIGS = [(16, 1), (8, 2), (4, 4), (2, 8)]
LSH_DUP_CUT = 0.5  # pairs at/above are "true dups" for the recall column


def _sq_chain(expr: str, n: int) -> str:
    """(expr)^n for power-of-two n as an explicit squaring chain."""
    assert n & (n - 1) == 0 and n >= 1
    while n > 1:
        expr = f"(({expr})*({expr}))"
        n //= 2
    return expr


def _lsh_curve_cases() -> tuple[str, str]:
    t_case = "CASE " + " ".join(
        f"WHEN rows_per_band = {r} THEN {_sq_chain('s', r)}"
        for r in sorted({r for _, r in LSH_CONFIGS})
    ) + " END"
    miss_case = "CASE " + " ".join(
        f"WHEN bands = {b} THEN {_sq_chain('1.0 - t', b)}"
        for b in sorted({b for b, _ in LSH_CONFIGS})
    ) + " END"
    return t_case, miss_case


def q_lsh_tuning_curve(spark, sf_dir):
    """MinHash-LSH parameter planner: for each (bands, rows/band) config
    of a 16-signature index, the expected candidate recall over the
    corpus's measured near-dup pairs (jaccard >= LSH_DUP_CUT) and the
    expected candidate rate over its sub-threshold pairs — the two
    numbers that pick the banding before anyone re-indexes 100 TB.

    Input is the SAME inverted-index pair table as q_dedup_ngram_jaccard
    (exact jaccards, post-index — tiny); the config sweep is a broadcast
    of the |LSH_CONFIGS|-row table. Note the sub-threshold column is a
    lower bound on false-candidate cost: pairs sharing no 3-gram never
    enter this table (their s-curve mass is ~0 anyway)."""
    common = _ngram_common(spark, sf_dir)
    jac = F.round(
        F.try_divide(F.col("c"), F.col("na") + F.col("nb") - F.col("c")), 4
    )
    pairs = common.select(jac.alias("s"))
    configs = arrow_local_df(
        spark, LSH_CONFIGS, "bands int, rows_per_band int"
    )
    t_case, miss_case = _lsh_curve_cases()
    curved = (
        pairs.crossJoin(F.broadcast(configs))
        .withColumn("t", F.expr(t_case))
        .withColumn("p_cand", F.expr(f"1.0 - {miss_case}"))
    )
    return (
        curved.groupBy("bands", "rows_per_band")
        .agg(
            F.sum((F.col("s") >= LSH_DUP_CUT).cast("int")).alias("n_dup_pairs"),
            F.sum((F.col("s") < LSH_DUP_CUT).cast("int")).alias("n_nondup_pairs"),
            F.round(
                F.avg(F.when(F.col("s") >= LSH_DUP_CUT, F.col("p_cand"))), 4
            ).alias("exp_dup_recall"),
            F.round(
                F.avg(F.when(F.col("s") < LSH_DUP_CUT, F.col("p_cand"))), 4
            ).alias("exp_nondup_rate"),
        )
        .orderBy("rows_per_band")
    )


# --- containment near-dup (substring-style duplication) ----------------------
CONTAINMENT_THRESHOLD = 0.6


def q_dedup_containment(spark, sf_dir):
    """Asymmetric near-dup: containment(A, B) = |A∩B| / min(|A|, |B|) over
    the same word-3-gram shingle sets. Catches the duplication symmetric
    Jaccard misses — a short document quoted whole inside a long one
    (boilerplate licence blocks, syndicated article + commentary) scores
    containment ≈ 1 while its Jaccard is tiny. `contained_doc` names the
    smaller set, i.e. the doc to drop when deduping by containment.

    Same inverted-index plan (and cost bound) as q_dedup_ngram_jaccard:
    the pair grain is reached through postings, never a pair join."""
    common = _ngram_common(spark, sf_dir)
    cont = F.round(F.try_divide(F.col("c"), F.least("na", "nb")), 4)
    contained = (
        F.when(F.col("na") <= F.col("nb"), F.col("doc_a")).otherwise(F.col("doc_b"))
    )
    return (
        common.select(
            "doc_a",
            "doc_b",
            cont.alias("containment"),
            contained.alias("contained_doc"),
        )
        .filter(F.col("containment") >= CONTAINMENT_THRESHOLD)
    )


# --- exact-substring duplication (windowed rolling fingerprints) -------------
# Character-window approximation of suffix-array substring dedup (the
# "deduplicating training data" recipe): hash fixed W-char windows every
# STRIDE chars; any exact duplicated span of length >= W + STRIDE - 1
# contains at least one aligned window, so its fingerprint collides
# across documents. W/STRIDE trade recall floor vs index size.
SUBSTR_W = 40
SUBSTR_STRIDE = 20


def q_dedup_substring_windows(spark, sf_dir):
    """Exact-substring duplication audit: per-document fraction of W-char
    windows (every STRIDE chars) whose fingerprint appears in >= 2
    distinct documents — the signal substring-level dedup trims on
    (copied license blocks, syndicated paragraphs, boilerplate) that
    document-level exact dedup can't see.

    Plan: windows explode as 64-bit xxhash64 fingerprints (8-byte ints,
    never text; the hash stays engine-internal — the oracle hashes its
    own windows and only counts cross, so the engines need not agree on
    values, only on within-engine injectivity),
    one hash-grain groupBy counts distinct docs per fingerprint, and the
    flags join back on the same hash key — there is NO pair stage at
    all (unlike Jaccard/LSH this operator never emits doc pairs), so
    cost is linear in corpus chars at any scale. The (doc_id, wh) rows
    repartition on the fingerprint ONCE and MATERIALIZE there
    (localCheckpoint): the frequency agg and the flag join both consume
    that hashpartitioning, so neither re-runs the window-hash subtree
    (column pruning makes the two branches canonically different, which
    defeats ReuseExchange — measured: the whole fingerprint projection
    executed twice without the checkpoint) and no further exchange
    exists until the final doc-grain agg — three corpus-grain
    exchanges total (barrier, fingerprint, doc). Window hashes are de-duplicated per doc first, so `n_windows`
    counts distinct fingerprints per doc and a within-doc repeat can't
    self-inflate the cross-doc frequency."""
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .filter(F.length("text") >= SUBSTR_W)
    )
    wins_expr = (
        f"array_distinct(transform("
        f"sequence(1, length(text) - {SUBSTR_W} + 1, {SUBSTR_STRIDE}), "
        f"p -> xxhash64(substring(text, p, {SUBSTR_W}))))"
    )
    raw = docs.withColumn("whs", F.expr(wins_expr))
    wins = (
        _barrier(raw, ["doc_id"], ["whs"])
        .select("doc_id", F.explode("whs").alias("wh"))
        .repartition("wh")
        .localCheckpoint(eager=False)
    )
    # per-doc-distinct already, so count(*) per hash == distinct-doc count
    dfreq = wins.groupBy("wh").agg(F.count("*").alias("nd"))
    flagged = wins.join(dfreq, "wh").select(
        "doc_id", (F.col("nd") >= 2).cast("int").alias("dup")
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_windows"),
        F.sum("dup").alias("n_dup_windows"),
        F.round(F.sum("dup") / F.count("*"), 4).alias("dup_frac"),
    )


# --- winnowing fingerprints ---------------------------------------------------
# k-gram length and winnowing window: any exact substring match of at
# least WINNOW_K + WINNOW_W - 1 = 23 chars is GUARANTEED to share a
# selected fingerprint (the winnowing theorem), at an expected
# fingerprint density of 2/(WINNOW_W + 1).
WINNOW_K, WINNOW_W = 16, 8


def q_dedup_winnowing(spark, sf_dir):
    """Winnowing fingerprint audit (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): per document, the fraction of
    SELECTED fingerprints shared with >= 2 documents. Unlike
    q_dedup_substring_windows' fixed-stride sampling (which can MISS a
    copied span that straddles its stride), winnowing selects the
    minimum k-gram hash in every window of WINNOW_W consecutive
    positions, guaranteeing any exact match of >= K+W-1 chars shares a
    fingerprint while storing only ~2/(W+1) of positions.

    The selection depends on hash VALUES (the min), so the hash must
    agree across engines: md5-derived 60-bit (the MinHash-sig
    discipline), NOT engine-internal xxhash64 — that is the measured
    JIT-heavy path, the honest price of value-level selection parity.
    Plan shape is q_dedup_substring_windows': fingerprints explode as
    8-byte ints, one hash-grain frequency agg, flag join back on the
    materialized exchange, doc-grain rollup — NO pair stage, linear in
    corpus chars."""
    docs = (
        _docs(spark, sf_dir)
        .select("doc_id", "text")
        .filter(F.length("text") >= WINNOW_K + WINNOW_W - 1)
    )
    kg_expr = (
        f"transform(sequence(1, length(text) - {WINNOW_K} + 1), "
        f"p -> {_h60_spark(f'substring(text, p, {WINNOW_K})')})"
    )
    fp_expr = (
        f"array_distinct(transform(sequence(1, size(kgs) - {WINNOW_W} + 1), "
        f"i -> array_min(slice(kgs, i, {WINNOW_W}))))"
    )
    raw = (
        docs.withColumn("kgs", F.expr(kg_expr))
        .withColumn("fps", F.expr(fp_expr))
        .select("doc_id", "fps")
    )
    fps = (
        _barrier(raw, ["doc_id"], ["fps"])
        .select("doc_id", F.explode("fps").alias("fp"))
        .repartition("fp")
        .localCheckpoint(eager=False)
    )
    dfreq = fps.groupBy("fp").agg(F.count("*").alias("nd"))
    flagged = fps.join(dfreq, "fp").select(
        "doc_id", (F.col("nd") >= 2).cast("int").alias("dup")
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_fingerprints"),
        F.sum("dup").alias("n_dup_fingerprints"),
        F.round(F.sum("dup") / F.count("*"), 4).alias("dup_frac"),
    )


# --- MinHash signatures ------------------------------------------------------------
def q_minhash_signatures(spark, sf_dir):
    """MinHash signature table (first 4 of 16 permutations exposed;
    signature j = min over shingles of (a_j*h + b_j) mod p)."""
    d = _with_shingle_hashes(spark, sf_dir)
    return d.select(
        "doc_id",
        *[F.expr(_minhash_sig_spark(j)).alias(f"sig_{j}") for j in range(4)],
    )


# --- MinHash + LSH candidate pairs ---------------------------------------------------
def q_dedup_minhash_lsh(spark, sf_dir):
    """LSH banding: 16 sigs → 4 bands of 4; docs sharing any band bucket are
    candidate duplicates. The band-bucket equi-join is the whole point:
    O(n·bands) shuffle instead of O(n²) compare. Pairs are then verified
    with the signature-estimated Jaccard (share of matching sigs).

    Docs with < 3 tokens have no shingles → all-NULL signatures; they are
    excluded before banding (size(hs) > 0). Without the guard Spark's
    concat_ws skips NULLs, landing every such doc in one '' bucket, while
    the SQL twin's || yields NULL band_val that never joins — a
    cross-engine divergence and an all-pairs bucket of empty docs."""
    d = _with_shingle_hashes(spark, sf_dir).filter(F.size("hs") > 0)
    sigs = d.select(
        "doc_id", *[F.expr(_minhash_sig_spark(j)).alias(f"sig_{j}") for j in range(16)]
    )
    # candidate generation is id-only (the id-only-pairs discipline of
    # q_neardup_embedding): the band join shuffles (doc_id, band_idx,
    # band_val), never the 16 signature columns; signatures re-attach by
    # two equi-joins after the pair dedup, so the estimated-Jaccard
    # expression also runs once per distinct pair instead of once per
    # band collision. The three references to `sigs` share one physical
    # barrier exchange (ReuseExchange).
    band_cols = [
        F.concat_ws(
            "-", *[F.col(f"sig_{k}") for k in range(b * ROWS_PER_BAND, (b + 1) * ROWS_PER_BAND)]
        ).alias(f"band_{b}")
        for b in range(N_BANDS)
    ]
    exploded = sigs.select(
        "doc_id",
        F.posexplode(F.array(*band_cols)).alias("band_idx", "band_val"),
    )
    # hot-bucket guard (see MAX_BAND_BUCKET): one partitioned-window count
    # on the band key — the same shuffle partitioning the self-join needs,
    # so the cap adds no extra exchange to either join input
    bucket_w = Window.partitionBy("band_idx", "band_val")
    exploded = (
        exploded.withColumn("bdf", F.count("*").over(bucket_w))
        .filter(F.col("bdf") <= MAX_BAND_BUCKET)
        .drop("bdf")
    )
    lhs = exploded.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_val")
    rhs = exploded.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_val")
    cand = (
        lhs.join(rhs, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"sig_{j}").alias(f"la_{j}") for j in range(16)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"sig_{j}").alias(f"lb_{j}") for j in range(16)],
    )
    matches = (
        F.lit(0)
        + sum((F.col(f"la_{j}") == F.col(f"lb_{j}")).cast("int") for j in range(16))
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(matches / 16.0, 4).alias("est_jaccard"),
        )
    )


def q_dedup_incremental_lsh(spark, sf_dir):
    """Incremental NEAR-dup ingest check: the new batch (doc_id % 3 == 0,
    the dedup_incremental slice convention) probes the existing corpus's
    MinHash-LSH band index — candidate pairs exist only BETWEEN batch
    and registry, never registry×registry, so ingesting B docs into an
    N-doc corpus costs O(B·bands) probe rows against the standing index
    instead of re-running the full O(N·bands) self-join. The exact-hash
    sibling is dedup_incremental; this catches the near-dups it can't.

    Same discipline as q_dedup_minhash_lsh: id-only band join, hot-bucket
    cap on the REGISTRY side (a degenerate registry bucket caps the probe
    fan-out at cap·bands per batch doc), signatures re-attach per
    distinct pair. Output: (batch_doc, registry_doc, est_jaccard)."""
    d = _with_shingle_hashes(spark, sf_dir).filter(F.size("hs") > 0)
    sigs = d.select(
        "doc_id", *[F.expr(_minhash_sig_spark(j)).alias(f"sig_{j}") for j in range(16)]
    )
    band_cols = [
        F.concat_ws(
            "-", *[F.col(f"sig_{k}") for k in range(b * ROWS_PER_BAND, (b + 1) * ROWS_PER_BAND)]
        ).alias(f"band_{b}")
        for b in range(N_BANDS)
    ]
    exploded = sigs.select(
        "doc_id",
        F.posexplode(F.array(*band_cols)).alias("band_idx", "band_val"),
    )
    corpus = exploded.filter(F.col("doc_id") % 3 != 0)
    batch = exploded.filter(F.col("doc_id") % 3 == 0)
    bucket_w = Window.partitionBy("band_idx", "band_val")
    corpus = (
        corpus.withColumn("bdf", F.count("*").over(bucket_w))
        .filter(F.col("bdf") <= MAX_BAND_BUCKET)
        .drop("bdf")
    )
    cand = (
        batch.select(F.col("doc_id").alias("batch_doc"), "band_idx", "band_val")
        .join(
            corpus.select(
                F.col("doc_id").alias("registry_doc"), "band_idx", "band_val"
            ),
            ["band_idx", "band_val"],
        )
        .select("batch_doc", "registry_doc")
        .distinct()
    )
    sa = sigs.select(
        F.col("doc_id").alias("batch_doc"),
        *[F.col(f"sig_{j}").alias(f"la_{j}") for j in range(16)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("registry_doc"),
        *[F.col(f"sig_{j}").alias(f"lb_{j}") for j in range(16)],
    )
    matches = (
        F.lit(0)
        + sum((F.col(f"la_{j}") == F.col(f"lb_{j}")).cast("int") for j in range(16))
    )
    return (
        cand.join(sa, "batch_doc")
        .join(sb, "registry_doc")
        .select(
            "batch_doc",
            "registry_doc",
            F.round(matches / 16.0, 4).alias("est_jaccard"),
        )
    )


# --- MinHash estimation-error audit ------------------------------------------
def q_minhash_estimate_error(spark, sf_dir):
    """MinHash calibration table: for every LSH candidate pair, the
    signature-estimated Jaccard (matching sigs / 16) next to the EXACT
    hash-set Jaccard and the absolute estimation error — the audit that
    justifies trusting 16 permutations (expected |err| ~ 1/sqrt(16))
    before thresholding candidate pairs on the estimate at scale.

    Plan: the candidate pairs and estimates come from the banded-LSH
    machinery (id-only band join, hot-bucket cap); the exact side
    re-attaches each doc's shingle-hash SET by two linear equi-joins
    and intersects per pair — pair-grain work on the LSH candidate
    set only, never all pairs."""
    est = q_dedup_minhash_lsh(spark, sf_dir)
    d = _with_shingle_hashes(spark, sf_dir).filter(F.size("hs") > 0)
    ha = d.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("ha"))
    hb = d.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("hb"))
    inter = F.size(F.array_intersect("ha", "hb"))
    na = F.size(F.array_distinct("ha"))
    nb = F.size(F.array_distinct("hb"))
    exact = F.round(inter / (na + nb - inter), 4)
    return (
        est.join(ha, "doc_a")
        .join(hb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "est_jaccard",
            exact.alias("exact_jaccard"),
            F.round(F.abs(F.col("est_jaccard") - exact), 4).alias("abs_err"),
        )
    )


# --- SimHash ----------------------------------------------------------------------------
def q_simhash(spark, sf_dir):
    """32-bit SimHash per document: per-bit majority vote over md5-derived
    token hashes (with multiplicity). Near-dup docs land within a small
    Hamming distance; pairing blocks on the top-16 bits."""
    raw = _docs(spark, sf_dir).withColumn("toks", F.split("text", " ")).withColumn(
        "hs", F.expr(f"transform(toks, t -> {_h32_spark('t')})")
    )
    # barrier: the majority-vote expression references hs 64×; without it
    # the split+md5 chain is re-evaluated per reference (see _barrier)
    d = _barrier(raw, ["doc_id"], ["hs"])
    return d.select("doc_id", F.expr(_simhash_spark()).alias("simhash"))


def q_dedup_simhash_pairs(spark, sf_dir):
    """Candidate pairs with Hamming(simhash_a, simhash_b) <= 6, blocked on
    the high 16 bits (near-dups agree there with high probability)."""
    sh = q_simhash(spark, sf_dir).withColumn(
        "block", F.expr("shiftright(simhash, 16)")
    )
    a = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "block"
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "block"
    )
    ham = F.expr("CAST(bit_count(sh_a ^ sh_b) AS INT)")
    return (
        a.join(b, "block")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= 6)
    )


CC_ITERS = 6  # label-propagation rounds; exact while component diameter <= 6


def _component_labels(spark, sf_dir):
    """(id, label) connected-component assignment over the MinHash-LSH
    candidate-pair graph via iterative min-label propagation (the
    alternating small-star/large-star idea specialized to tiny dedup
    clusters). Each round: every node takes the min label among itself
    and its neighbors — one join + one groupBy per round, unrolled
    CC_ITERS times. Exact whenever the component diameter <= CC_ITERS
    (duplicate clusters are near-cliques from the band join, diameter
    ~2)."""
    # materialize the pair list once: the unrolled rounds reference the
    # edge set 2x per round, and recomputing the whole LSH DAG each time
    # measured 12x slower. (At scale: persist() / a checkpoint table.)
    pairs = (
        q_dedup_minhash_lsh(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    labels = (
        edges.select(F.col("doc_a").alias("id")).distinct()
        .select("id", F.col("id").alias("label"))
    )
    for rnd in range(CC_ITERS):
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.id)
            .groupBy(F.col("doc_a").alias("id"))
            .agg(F.min("label").alias("nlabel"))
        )
        labels = (
            labels.join(neighbor_min, "id", "left")
            .select("id", F.least("label", F.coalesce("nlabel", "label")).alias("label"))
        )
        # truncate lineage EVERY round that feeds another round (the
        # MLlib iterative-algorithm discipline): labels(k+1) references
        # labels(k) twice, so the un-truncated plan doubles per round —
        # 2^CC_ITERS subtrees to plan (the r2 audit counted 191 planned
        # shuffles here). Each round's label table is tiny (one row per
        # clustered doc). The LAST round's labels feed a single consumer
        # in every caller (components agg / canonical join / split
        # join), so its checkpoint bought no dedup — just one more eager
        # planning-plus-job pass (r13, the khop last-hop precedent).
        if rnd < CC_ITERS - 1:
            labels = labels.localCheckpoint(eager=True)
    return labels


def q_dedup_components(spark, sf_dir):
    """Duplicate-cluster table: per-cluster size and canonical (min) doc,
    the table a dedup pipeline keeps. See _component_labels."""
    return (
        _component_labels(spark, sf_dir)
        .groupBy(F.col("label").alias("component"))
        .agg(F.count("*").alias("n_docs"), F.min("id").alias("canonical_doc"))
    )


def q_dedup_keep_best(spark, sf_dir):
    """Canonical SELECTION (not just min-id): within each near-dup
    cluster, keep the doc with the most tokens (ties → smallest doc_id) —
    the policy real pipelines want ("keep the longest copy"). Labels come
    from the same propagation as dedup_components; the quality signal is
    a narrow second scan joined on the (tiny) clustered-doc id set; the
    argmax is a per-component window over cluster-sized groups."""
    from pyspark.sql import Window

    labels = _component_labels(spark, sf_dir)
    toks = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("id"),
        F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_toks"),
    )
    w = Window.partitionBy("label").orderBy(F.desc("n_toks"), "id")
    return (
        labels.join(toks, "id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("label").alias("component"),
            F.col("id").alias("keep_doc"),
            F.col("n_toks").alias("keep_n_toks"),
        )
    )


def q_leakage_safe_split(spark, sf_dir):
    """Train/val/test split that CANNOT leak near-duplicates across the
    boundary: the 80/10/10 assignment coin hashes the near-dup COMPONENT
    (min-reachable doc_id over the MinHash-LSH pair graph, same labels as
    dedup_components), not the document — so every member of a component
    lands in the same split. A per-doc coin (q_dataset_split,
    plans/quality.py) lets one copy of a near-dup pair train while its
    twin sits in the eval set — silent benchmark inflation; this operator
    is the fix a real LLM data pipeline ships. Unclustered docs are
    singleton components (coin on their own id). Deterministic md5 coin:
    reproducible across runs, engines, and cluster sizes.

    Plan shape: the label table is one narrow (id, label) per CLUSTERED
    doc — tiny next to the corpus — joined to the doc ids by one linear
    equi-join; the coin is a map-side expression. Nothing here adds a
    corpus-grain shuffle beyond the join on doc_id."""
    docs = _docs(spark, sf_dir).select("doc_id")
    labels = _component_labels(spark, sf_dir).select(
        F.col("id").alias("doc_id"), "label"
    )
    comp = F.coalesce("label", "doc_id")
    bucket = F.expr(
        "CAST(conv(substring(md5(CAST(component AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.join(labels, "doc_id", "left")
        .select("doc_id", comp.alias("component"))
        .select("doc_id", "component", split.alias("split"))
    )


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_substring_windows": q_dedup_substring_windows,
    "dedup_winnowing": q_dedup_winnowing,
    "leakage_safe_split": q_leakage_safe_split,
    "dedup_incremental": q_dedup_incremental,
    "dedup_components": q_dedup_components,
    "dedup_keep_best": q_dedup_keep_best,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_jaccard_prefix": q_dedup_jaccard_prefix,
    "dedup_incremental_prefix": q_dedup_incremental_prefix,
    "dedup_source_matrix": q_dedup_source_matrix,
    "dedup_containment": q_dedup_containment,
    "dedup_threshold_sweep": q_dedup_threshold_sweep,
    "lsh_tuning_curve": q_lsh_tuning_curve,
    "minhash_signatures": q_minhash_signatures,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_incremental_lsh": q_dedup_incremental_lsh,
    "minhash_estimate_error": q_minhash_estimate_error,
    "simhash": q_simhash,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
}

_DOCS_SH_DUCK = f"""
        sh_t AS (
            SELECT doc_id, lang, {_SHINGLES_DUCK} AS sh
            FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents)
        )
"""

_SIGS_DUCK = ",\n".join(
    f"               {_minhash_sig_duck(j)} AS sig_{j}" for j in range(16)
)

_SIGS4_DUCK = ",\n".join(
    f"               {_minhash_sig_duck(j)} AS sig_{j}" for j in range(4)
)

_BANDS_DUCK = "\n            UNION ALL\n".join(
    f"            SELECT doc_id, {b} AS band_idx, "
    + " || '-' || ".join(
        f"CAST(sig_{k} AS VARCHAR)" for k in range(b * ROWS_PER_BAND, (b + 1) * ROWS_PER_BAND)
    )
    + " AS band_val, "
    + ", ".join(f"sig_{j}" for j in range(16))
    + " FROM sigs"
    for b in range(N_BANDS)
)

_N_MATCH_DUCK = " + ".join(
    f"CASE WHEN a.sig_{j} = b.sig_{j} THEN 1 ELSE 0 END" for j in range(16)
)

def _components_oracle() -> str:
    """Recursive-CTE transitive closure over the same LSH pair graph:
    component id = min reachable doc id (what label propagation converges
    to)."""
    return f"""
        WITH RECURSIVE pairs AS (
            SELECT doc_a, doc_b FROM ({{lsh}}) lsh_pairs
        ),
        edges AS (
            SELECT doc_a, doc_b FROM pairs
            UNION ALL
            SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
        ),
        nodes AS (SELECT DISTINCT doc_a AS id FROM edges),
        reach(id, label) AS (
            SELECT id, id FROM nodes
            UNION
            SELECT e.doc_b, r.label
            FROM reach r JOIN edges e ON e.doc_a = r.id
        ),
        comp AS (SELECT id, MIN(label) AS component FROM reach GROUP BY id)
        SELECT component, COUNT(*) AS n_docs, MIN(id) AS canonical_doc
        FROM comp GROUP BY component
    """


ORACLES = {
    "dedup_substring_windows": f"""
        WITH wins AS (
            SELECT DISTINCT doc_id, u.wh
            FROM (
                SELECT doc_id,
                       list_transform(
                           generate_series(1, length(text) - {SUBSTR_W} + 1, {SUBSTR_STRIDE}),
                           p -> {_h60_duck(f"substr(text, p, {SUBSTR_W})")}) AS whs
                FROM documents
                WHERE length(text) >= {SUBSTR_W}
            ), LATERAL (SELECT UNNEST(whs) AS wh) u
        ),
        dfreq AS (SELECT wh, COUNT(*) AS nd FROM wins GROUP BY wh)
        SELECT doc_id,
               COUNT(*) AS n_windows,
               SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS n_dup_windows,
               ROUND(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) / COUNT(*), 4)
                 AS dup_frac
        FROM wins JOIN dfreq USING (wh)
        GROUP BY doc_id
    """,
    "dedup_winnowing": f"""
        WITH base AS (
            SELECT doc_id, text FROM documents
            WHERE length(text) >= {WINNOW_K + WINNOW_W - 1}
        ),
        kg AS (
            SELECT doc_id,
                   list_transform(
                       generate_series(1, length(text) - {WINNOW_K - 1}),
                       p -> {_h60_duck(f"substr(text, p, {WINNOW_K})")}) AS kgs
            FROM base
        ),
        fps AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(1, len(kgs) - {WINNOW_W - 1}),
                       i -> list_aggregate(kgs[i:i + {WINNOW_W - 1}], 'min')))
                       AS fps
            FROM kg
        ),
        ex AS (
            SELECT doc_id, u.fp
            FROM fps, LATERAL (SELECT UNNEST(fps) AS fp) u
        ),
        dfreq AS (SELECT fp, COUNT(*) AS nd FROM ex GROUP BY fp)
        SELECT doc_id,
               COUNT(*) AS n_fingerprints,
               SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS n_dup_fingerprints,
               ROUND(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) / COUNT(*), 4)
                   AS dup_frac
        FROM ex JOIN dfreq USING (fp)
        GROUP BY doc_id
    """,
    "dedup_exact": """
        SELECT md5(text) AS text_hash,
               MIN(doc_id) AS keep_doc_id,
               COUNT(*) AS n_copies
        FROM documents
        GROUP BY 1
    """,
    "dedup_incremental": """
        WITH batch AS (
            SELECT doc_id, md5(text) AS text_hash
            FROM documents WHERE doc_id % 3 = 0
        ),
        registry AS (
            SELECT DISTINCT md5(text) AS text_hash
            FROM documents WHERE doc_id % 3 != 0
        )
        SELECT text_hash, MIN(doc_id) AS keep_doc_id,
               COUNT(*) AS n_batch_copies
        FROM batch ANTI JOIN registry USING (text_hash)
        GROUP BY text_hash
    """,
    "dedup_ngram_jaccard": f"""
        WITH {_DOCS_SH_DUCK},
        ex AS (
            SELECT t.doc_id, t.lang, len(t.sh) AS n_sh, u.s
            FROM sh_t t, LATERAL (SELECT UNNEST(sh) AS s) u
        ),
        df AS (SELECT lang, s, COUNT(*) AS dfc FROM ex GROUP BY 1, 2),
        -- mirror of the engine's posting filter: singleton postings emit
        -- no pair, postings hotter than MAX_POSTING_DF are dropped
        surv AS (
            SELECT ex.doc_id, ex.lang, ex.n_sh, ex.s
            FROM ex JOIN df USING (lang, s)
            WHERE df.dfc BETWEEN 2 AND {MAX_POSTING_DF}
        ),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.n_sh AS na, b.n_sh AS nb, COUNT(*) AS c
            FROM surv a JOIN surv b
              ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4
        )
        SELECT doc_a, doc_b, ROUND(c / (na + nb - c), 4) AS jaccard
        FROM common
        WHERE ROUND(c / (na + nb - c), 4) >= {JACCARD_THRESHOLD}
    """,
    # the prefix filter is LOSSLESS, so the oracle is the plain exact
    # pair computation at the same threshold — no engine-side heuristic
    # (cap, prefix, length filter) needs mirroring
    "dedup_jaccard_prefix": f"""
        WITH {_DOCS_SH_DUCK},
        ex AS (
            SELECT t.doc_id, t.lang, len(t.sh) AS n_sh, u.s
            FROM sh_t t, LATERAL (SELECT UNNEST(sh) AS s) u
        ),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.n_sh AS na, b.n_sh AS nb, COUNT(*) AS c
            FROM ex a JOIN ex b
              ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4
        )
        SELECT doc_a, doc_b, ROUND(c / (na + nb - c), 4) AS jaccard
        FROM common
        WHERE ROUND(c / (na + nb - c), 4) >= {PREFIX_JACCARD_T}
    """,
    # lossless like dedup_jaccard_prefix's: plain exact cross-set pairs
    "dedup_incremental_prefix": f"""
        WITH {_DOCS_SH_DUCK},
        ex AS (
            SELECT t.doc_id, t.lang, len(t.sh) AS n_sh, u.s
            FROM sh_t t, LATERAL (SELECT UNNEST(sh) AS s) u
        ),
        common AS (
            SELECT a.doc_id AS batch_doc, b.doc_id AS registry_doc,
                   a.n_sh AS na, b.n_sh AS nb, COUNT(*) AS c
            FROM ex a JOIN ex b
              ON a.lang = b.lang AND a.s = b.s
             AND a.doc_id % 3 = 0 AND b.doc_id % 3 != 0
            GROUP BY 1, 2, 3, 4
        )
        SELECT batch_doc, registry_doc,
               ROUND(c / (na + nb - c), 4) AS jaccard
        FROM common
        WHERE ROUND(c / (na + nb - c), 4) >= {PREFIX_JACCARD_T}
    """,
    "dedup_source_matrix": f"""
        WITH {_DOCS_SH_DUCK},
        ex AS (
            SELECT t.doc_id, t.lang, len(t.sh) AS n_sh, u.s
            FROM sh_t t, LATERAL (SELECT UNNEST(sh) AS s) u
        ),
        df AS (SELECT lang, s, COUNT(*) AS dfc FROM ex GROUP BY 1, 2),
        surv AS (
            SELECT ex.doc_id, ex.lang, ex.n_sh, ex.s
            FROM ex JOIN df USING (lang, s)
            WHERE df.dfc BETWEEN 2 AND {MAX_POSTING_DF}
        ),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.n_sh AS na, b.n_sh AS nb, COUNT(*) AS c
            FROM surv a JOIN surv b
              ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4
        ),
        pairs AS (
            SELECT doc_a, doc_b, ROUND(c / (na + nb - c), 4) AS jaccard
            FROM common
            WHERE ROUND(c / (na + nb - c), 4) >= {JACCARD_THRESHOLD}
        ),
        m AS (
            SELECT LEAST(da.source, db.source) AS source_a,
                   GREATEST(da.source, db.source) AS source_b,
                   p.jaccard
            FROM pairs p
            JOIN documents da ON da.doc_id = p.doc_a
            JOIN documents db ON db.doc_id = p.doc_b
        )
        SELECT source_a, source_b, COUNT(*) AS n_pairs,
               ROUND(AVG(jaccard), 4) AS avg_jaccard
        FROM m GROUP BY 1, 2
        ORDER BY n_pairs DESC, source_a, source_b
    """,
    "dedup_threshold_sweep": f"""
        WITH {_DOCS_SH_DUCK},
        ex AS (
            SELECT t.doc_id, t.lang, len(t.sh) AS n_sh, u.s
            FROM sh_t t, LATERAL (SELECT UNNEST(sh) AS s) u
        ),
        df AS (SELECT lang, s, COUNT(*) AS dfc FROM ex GROUP BY 1, 2),
        surv AS (
            SELECT ex.doc_id, ex.lang, ex.n_sh, ex.s
            FROM ex JOIN df USING (lang, s)
            WHERE df.dfc BETWEEN 2 AND {MAX_POSTING_DF}
        ),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.n_sh AS na, b.n_sh AS nb, COUNT(*) AS c
            FROM surv a JOIN surv b
              ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4
        ),
        pairs AS (
            SELECT doc_a, doc_b, ROUND(c / (na + nb - c), 4) AS j
            FROM common WHERE ROUND(c / (na + nb - c), 4) >= {min(SWEEP_THRESHOLDS)}
        ),
        thetas AS (
            SELECT CAST(UNNEST({SWEEP_THRESHOLDS}) AS DOUBLE) AS theta
        ),
        hits AS (
            SELECT t.theta, p.doc_a, p.doc_b
            FROM thetas t JOIN pairs p ON p.j >= t.theta
        ),
        aggp AS (SELECT theta, COUNT(*) AS n_pairs FROM hits GROUP BY 1),
        aggd AS (
            SELECT theta, COUNT(DISTINCT doc) AS n_docs_affected
            FROM (SELECT theta, UNNEST([doc_a, doc_b]) AS doc FROM hits)
            GROUP BY 1
        )
        SELECT t.theta,
               COALESCE(p.n_pairs, 0) AS n_pairs,
               COALESCE(d.n_docs_affected, 0) AS n_docs_affected
        FROM thetas t
        LEFT JOIN aggp p USING (theta)
        LEFT JOIN aggd d USING (theta)
        ORDER BY t.theta
    """,
    "lsh_tuning_curve": f"""
        WITH {_DOCS_SH_DUCK},
        ex AS (
            SELECT t.doc_id, t.lang, len(t.sh) AS n_sh, u.s
            FROM sh_t t, LATERAL (SELECT UNNEST(sh) AS s) u
        ),
        df AS (SELECT lang, s, COUNT(*) AS dfc FROM ex GROUP BY 1, 2),
        surv AS (
            SELECT ex.doc_id, ex.lang, ex.n_sh, ex.s
            FROM ex JOIN df USING (lang, s)
            WHERE df.dfc BETWEEN 2 AND {MAX_POSTING_DF}
        ),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.n_sh AS na, b.n_sh AS nb, COUNT(*) AS c
            FROM surv a JOIN surv b
              ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4
        ),
        pairs AS (SELECT ROUND(c / (na + nb - c), 4) AS s FROM common),
        configs AS (
            SELECT * FROM (VALUES {", ".join(f"({b}, {r})" for b, r in LSH_CONFIGS)})
                   AS t(bands, rows_per_band)
        ),
        curved AS (
            SELECT bands, rows_per_band, s, {_lsh_curve_cases()[0]} AS t
            FROM pairs, configs
        ),
        p AS (
            SELECT bands, rows_per_band, s,
                   1.0 - {_lsh_curve_cases()[1]} AS p_cand
            FROM curved
        )
        SELECT bands, rows_per_band,
               CAST(SUM(CASE WHEN s >= {LSH_DUP_CUT} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup_pairs,
               CAST(SUM(CASE WHEN s < {LSH_DUP_CUT} THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_nondup_pairs,
               ROUND(AVG(CASE WHEN s >= {LSH_DUP_CUT} THEN p_cand END), 4)
                 AS exp_dup_recall,
               ROUND(AVG(CASE WHEN s < {LSH_DUP_CUT} THEN p_cand END), 4)
                 AS exp_nondup_rate
        FROM p GROUP BY bands, rows_per_band
        ORDER BY rows_per_band
    """,
    "dedup_containment": f"""
        WITH {_DOCS_SH_DUCK},
        ex AS (
            SELECT t.doc_id, t.lang, len(t.sh) AS n_sh, u.s
            FROM sh_t t, LATERAL (SELECT UNNEST(sh) AS s) u
        ),
        df AS (SELECT lang, s, COUNT(*) AS dfc FROM ex GROUP BY 1, 2),
        surv AS (
            SELECT ex.doc_id, ex.lang, ex.n_sh, ex.s
            FROM ex JOIN df USING (lang, s)
            WHERE df.dfc BETWEEN 2 AND {MAX_POSTING_DF}
        ),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.n_sh AS na, b.n_sh AS nb, COUNT(*) AS c
            FROM surv a JOIN surv b
              ON a.lang = b.lang AND a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4
        )
        SELECT doc_a, doc_b, ROUND(c / LEAST(na, nb), 4) AS containment,
               CASE WHEN na <= nb THEN doc_a ELSE doc_b END AS contained_doc
        FROM common
        WHERE ROUND(c / LEAST(na, nb), 4) >= {CONTAINMENT_THRESHOLD}
    """,
    "minhash_signatures": f"""
        WITH {_DOCS_SH_DUCK},
        hashed AS (
            SELECT doc_id, list_transform(sh, s -> {_h32_duck('s')}) AS hs FROM sh_t
        )
        SELECT doc_id,
{_SIGS4_DUCK}
        FROM hashed
    """,
    "dedup_minhash_lsh": f"""
        WITH {_DOCS_SH_DUCK},
        hashed AS (
            SELECT doc_id, list_transform(sh, s -> {_h32_duck('s')}) AS hs
            FROM sh_t WHERE len(sh) > 0
        ),
        sigs AS (
            SELECT doc_id,
{_SIGS_DUCK}
            FROM hashed
        ),
        bands AS (
{_BANDS_DUCK}
        ),
        bands_capped AS (
            SELECT * FROM (
                SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_val) AS bdf
                FROM bands
            ) WHERE bdf <= {MAX_BAND_BUCKET}
        )
        SELECT doc_a, doc_b, ROUND(MAX(n_match) / 16.0, 4) AS est_jaccard
        FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   {_N_MATCH_DUCK} AS n_match
            FROM bands_capped a JOIN bands_capped b
              ON a.band_idx = b.band_idx AND a.band_val = b.band_val
             AND a.doc_id < b.doc_id
        )
        GROUP BY doc_a, doc_b
    """,
    "dedup_incremental_lsh": f"""
        WITH {_DOCS_SH_DUCK},
        hashed AS (
            SELECT doc_id, list_transform(sh, s -> {_h32_duck('s')}) AS hs
            FROM sh_t WHERE len(sh) > 0
        ),
        sigs AS (
            SELECT doc_id,
{_SIGS_DUCK}
            FROM hashed
        ),
        bands AS (
{_BANDS_DUCK}
        ),
        corpus AS (
            SELECT * FROM (
                SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_val) AS bdf
                FROM bands WHERE doc_id % 3 != 0
            ) WHERE bdf <= {MAX_BAND_BUCKET}
        ),
        batch AS (SELECT * FROM bands WHERE doc_id % 3 = 0)
        SELECT batch_doc, registry_doc,
               ROUND(MAX(n_match) / 16.0, 4) AS est_jaccard
        FROM (
            SELECT a.doc_id AS batch_doc, b.doc_id AS registry_doc,
                   {_N_MATCH_DUCK} AS n_match
            FROM batch a JOIN corpus b
              ON a.band_idx = b.band_idx AND a.band_val = b.band_val
        )
        GROUP BY batch_doc, registry_doc
    """,
    "minhash_estimate_error": f"""
        WITH {_DOCS_SH_DUCK},
        hashed AS (
            SELECT doc_id, list_transform(sh, s -> {_h32_duck('s')}) AS hs
            FROM sh_t WHERE len(sh) > 0
        ),
        sigs AS (
            SELECT doc_id,
{_SIGS_DUCK}
            FROM hashed
        ),
        bands AS (
{_BANDS_DUCK}
        ),
        bands_capped AS (
            SELECT * FROM (
                SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_val) AS bdf
                FROM bands
            ) WHERE bdf <= {MAX_BAND_BUCKET}
        ),
        est AS (
            SELECT doc_a, doc_b, ROUND(MAX(n_match) / 16.0, 4) AS est_jaccard
            FROM (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       {_N_MATCH_DUCK} AS n_match
                FROM bands_capped a JOIN bands_capped b
                  ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                 AND a.doc_id < b.doc_id
            )
            GROUP BY doc_a, doc_b
        )
        SELECT e.doc_a, e.doc_b, e.est_jaccard,
               ROUND(len(list_intersect(a.hs, b.hs))
                     / (len(list_distinct(a.hs)) + len(list_distinct(b.hs))
                        - len(list_intersect(a.hs, b.hs))), 4) AS exact_jaccard,
               ROUND(ABS(e.est_jaccard
                     - ROUND(len(list_intersect(a.hs, b.hs))
                             / (len(list_distinct(a.hs)) + len(list_distinct(b.hs))
                                - len(list_intersect(a.hs, b.hs))), 4)), 4)
                 AS abs_err
        FROM est e
        JOIN hashed a ON a.doc_id = e.doc_a
        JOIN hashed b ON b.doc_id = e.doc_b
    """,
    "simhash": f"""
        WITH hashed AS (
            SELECT doc_id,
                   list_transform(string_split(text, ' '), t -> {_h32_duck('t')}) AS hs
            FROM documents
        )
        SELECT doc_id, {_simhash_duck()} AS simhash
        FROM hashed
    """,
    "dedup_simhash_pairs": f"""
        WITH hashed AS (
            SELECT doc_id,
                   list_transform(string_split(text, ' '), t -> {_h32_duck('t')}) AS hs
            FROM documents
        ),
        sh AS (
            SELECT doc_id, {_simhash_duck()} AS simhash FROM hashed
        ),
        blocked AS (
            SELECT doc_id, simhash, simhash >> 16 AS block FROM sh
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM blocked a JOIN blocked b ON a.block = b.block AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
    """,
}

ORACLES["dedup_components"] = _components_oracle().format(
    lsh=ORACLES["dedup_minhash_lsh"]
)


def _keep_best_oracle() -> str:
    """Transitive-closure components (same as dedup_components) joined to
    token counts; per-component argmax by (n_toks DESC, id)."""
    return r"""
        WITH RECURSIVE pairs AS (
            SELECT doc_a, doc_b FROM ({lsh}) lsh_pairs
        ),
        edges AS (
            SELECT doc_a, doc_b FROM pairs
            UNION ALL
            SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
        ),
        nodes AS (SELECT DISTINCT doc_a AS id FROM edges),
        reach(id, label) AS (
            SELECT id, id FROM nodes
            UNION
            SELECT e.doc_b, r.label
            FROM reach r JOIN edges e ON e.doc_a = r.id
        ),
        comp AS (SELECT id, MIN(label) AS component FROM reach GROUP BY id),
        t AS (
            SELECT doc_id AS id,
                   CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                     AS n_toks
            FROM documents
        )
        SELECT component, keep_doc, keep_n_toks FROM (
            SELECT c.component, c.id AS keep_doc, t.n_toks AS keep_n_toks,
                   ROW_NUMBER() OVER (PARTITION BY c.component
                                      ORDER BY t.n_toks DESC, c.id) AS rn
            FROM comp c JOIN t ON c.id = t.id
        ) WHERE rn = 1
    """


ORACLES["dedup_keep_best"] = _keep_best_oracle().format(
    lsh=ORACLES["dedup_minhash_lsh"]
)


def _leakage_safe_split_oracle() -> str:
    """Transitive-closure components (same as dedup_components), singleton
    fallback via LEFT JOIN, then the identical md5 coin on the component."""
    return """
        WITH RECURSIVE pairs AS (
            SELECT doc_a, doc_b FROM ({lsh}) lsh_pairs
        ),
        edges AS (
            SELECT doc_a, doc_b FROM pairs
            UNION ALL
            SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
        ),
        nodes AS (SELECT DISTINCT doc_a AS id FROM edges),
        reach(id, label) AS (
            SELECT id, id FROM nodes
            UNION
            SELECT e.doc_b, r.label
            FROM reach r JOIN edges e ON e.doc_a = r.id
        ),
        comp AS (SELECT id, MIN(label) AS component FROM reach GROUP BY id),
        assigned AS (
            SELECT d.doc_id,
                   COALESCE(c.component, d.doc_id) AS component
            FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
        )
        SELECT doc_id, component,
               CASE WHEN bucket < 80 THEN 'train'
                    WHEN bucket < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id, component,
                   CAST('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 8)
                        AS BIGINT) % 100 AS bucket
            FROM assigned
        )
    """


ORACLES["leakage_safe_split"] = _leakage_safe_split_oracle().format(
    lsh=ORACLES["dedup_minhash_lsh"]
)
