"""Distributed subword (BPE) tokenizer — train and apply.

Reference analog: none (the reference has no text surface; SURVEY §7/M2
extension). Every token-priced operator in the registry (`pack_sequences`,
`data_mix_audit`, `temperature_mix`, BM25 document lengths) counts
whitespace tokens, which systematically misprices CJK/code corpora. This
module trains a byte-pair-encoding merge table on the corpus (Sennrich,
Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
Subword Units", ACL) and applies it with JVM-side built-ins only, so the
registry's mixing/packing audits can price real subword tokens.

Scale shape (what survives 100 TB):

- **Train** = ONE corpus-sized contraction (explode pre-tokens → count by
  token, map-side partial) followed by a distributed top-W prune
  (`ORDER BY cnt DESC, tok LIMIT BPE_TOP_W` — Spark TakeOrdered, never a
  global sort). Only the bounded W-row word-frequency table is collected
  (W=4096 rows × ≤ token bytes ≈ 100 KB — the same driver-coordination
  grade as `_kmeans_fit`'s k×dim centroid collect); the greedy merge loop
  then runs in pure Python over that bounded table. Frequency pruning is
  standard practice in every public BPE trainer (min-frequency /
  max-vocab caps in subword-nmt and HuggingFace tokenizers): merge
  selection is dominated by high-frequency words, and the cap makes the
  driver step corpus-size-independent.
- **Apply** is pure whole-stage-codegen string arithmetic — no Python,
  no shuffle: each document becomes a symbol-delimited string and the
  frozen merge list becomes BPE_MERGES chained literal `replace()` calls
  (see the encoding invariant below), then the token count is one
  split-on-whitespace `size()`. A 100 TB apply is a narrow projection.

Encoding invariant (the whole trick): a word's symbol sequence is stored
as `' ' + '  '.join(symbols) + ' '` — every symbol carries its own
leading AND trailing space, with TWO spaces between adjacent symbols.
Merging pair (x, y) is then the literal string replacement
`' x  y ' → ' xy '`, which (a) can never match across pre-token
boundaries (documents join pre-tokens with ' \\n ' — the pattern has no
newline), and (b) is exactly greedy left-to-right non-overlapping BPE
merge application: `replace()` in Spark, DuckDB, and Python all scan
left-to-right and resume AFTER the replacement, and the replacement
restores the invariant (own trailing space; the remainder starts with
the next symbol's leading space). `tests/test_bpe.py` pins the chain
against an independent symbol-list reference encoder.

Determinism: pair counts are exact integer sums; argmax ties break on
(count DESC, lhs ASC, rhs ASC) — Python tuple comparison of str is
code-point order, identical to the UTF-8 binary collation both engines
sort strings with. The DuckDB oracles re-run the ENTIRE training loop as
BPE_MERGES unrolled CTE rounds (pairs_k → best_k → words_k), the same
discipline as the kmeans oracle's unrolled Lloyd rounds, so the gate
verifies training AND apply end-to-end, not just the apply.

Caveat (documented seam): symbols are split with regex `(.)`, a UTF-16
code unit in Spark/Java vs a codepoint in DuckDB/Python — identical on
the Basic Multilingual Plane; astral-plane input (emoji) would diverge.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .text import TOKEN_REGEX, _docs

BPE_TOP_W = 4096
BPE_MERGES = 32


# --------------------------------------------------------------------------
# pure-Python training core (shared by the Spark plan and the tests)
# --------------------------------------------------------------------------


def merge_word(syms: list[str], lhs: str, rhs: str) -> list[str]:
    """Greedy left-to-right non-overlapping merge of (lhs, rhs) in one
    symbol sequence — the list-level semantics the string `replace()`
    chain implements (pinned equal in tests/test_bpe.py)."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
            out.append(lhs + rhs)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_merges(word_counts) -> list[tuple[int, str, str, str, int]]:
    """BPE_MERGES greedy rounds over a (word, freq) table: count adjacent
    symbol pairs weighted by word frequency, merge the (count DESC,
    lhs ASC, rhs ASC) winner everywhere, repeat. Stops early when no
    adjacent pair remains. Returns [(rank, lhs, rhs, merged, pair_count)].
    """
    words = [(list(w), int(c)) for w, c in word_counts]
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, BPE_MERGES + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in words:
            for pair in zip(syms, syms[1:]):
                counts[pair] = counts.get(pair, 0) + f
        if not counts:
            break
        (lhs, rhs), pc = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, lhs, rhs, lhs + rhs, pc))
        words = [(merge_word(s, lhs, rhs), f) for s, f in words]
    return merges


def encode_word(word: str, merges) -> list[str]:
    """Independent reference encoder: apply the merge list in rank order
    to one word's character sequence (Sennrich's apply semantics)."""
    syms = list(word)
    for _rank, lhs, rhs, _m, _c in merges:
        syms = merge_word(syms, lhs, rhs)
    return syms


# --------------------------------------------------------------------------
# Spark plans
# --------------------------------------------------------------------------


def _word_counts(spark, sf_dir):
    """Corpus → pre-token frequency table, pruned to the TOP-W words.
    The ONE data-sized stage of training: explode + count(tok) with
    map-side partials, then TakeOrdered(W) — no global sort."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        F.explode(F.regexp_extract_all("text", F.lit(TOKEN_REGEX), 0)).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(BPE_TOP_W)
    )


# Session-lifetime memo keyed by fixture dir: the four registry
# consumers (vocab table, token count, mix audit, packer) share one
# training run per corpus, which is the production lifecycle (train
# once, apply everywhere). Safe because training is a deterministic
# pure function of the fixture bytes and fixture dirs are immutable
# (testdata is read-only; test fixtures use unique tmp paths).
_MERGES_MEMO: dict[str, list] = {}


def trained_merges(spark, sf_dir):
    """Collect the bounded word table (≤ BPE_TOP_W rows) and run the
    pure-Python merge loop — the documented iterative-fit pattern
    (cf. `_kmeans_fit`'s per-round centroid collect)."""
    if sf_dir not in _MERGES_MEMO:
        rows = _word_counts(spark, sf_dir).collect()
        _MERGES_MEMO[sf_dir] = train_merges([(r.tok, r.cnt) for r in rows])
    return _MERGES_MEMO[sf_dir]


def _encoded_doc(merges):
    """Whole-document encoded-string Column: pre-tokens joined with the
    ' \\n ' boundary, each as a '  '-delimited symbol run, then the
    frozen merge list as chained literal replaces (all JVM built-ins)."""
    toks = F.regexp_extract_all("text", F.lit(TOKEN_REGEX), 0)
    syms = F.transform(toks, lambda t: F.rtrim(F.regexp_replace(t, "(.)", "$1  ")))
    s = F.when(F.size(toks) == 0, F.lit("")).otherwise(
        F.concat(F.lit(" "), F.array_join(syms, " \n "), F.lit(" "))
    )
    for _rank, lhs, rhs, merged, _c in merges:
        s = F.replace(s, F.lit(f" {lhs}  {rhs} "), F.lit(f" {merged} "))
    return s


def bpe_token_count(merges):
    """Per-document BPE token count Column (long)."""
    s = _encoded_doc(merges)
    return (
        F.when(F.trim(s) == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim(s), r"\s+")))
        .cast("long")
    )


def q_bpe_vocab_train(spark, sf_dir):
    """The trained merge table itself: (merge_rank, lhs, rhs, merged,
    pair_count). The DuckDB oracle re-derives it with the full unrolled
    training loop, so this query value-gates the trainer end-to-end."""
    rows = trained_merges(spark, sf_dir)
    return spark.createDataFrame(
        rows, "merge_rank int, lhs string, rhs string, merged string, pair_count bigint"
    )


def q_text_bpe_token_count(spark, sf_dir):
    """Per-language corpus pricing with REAL subword tokens: document
    count, total BPE tokens, total whitespace tokens, and the BPE-per-
    whitespace inflation ratio — the number that shows how far
    whitespace counting misprices each language slice."""
    merges = trained_merges(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    ws = (
        F.when(F.trim("text") == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
        .cast("long")
    )
    per = docs.select(
        "lang", bpe_token_count(merges).alias("bpe"), ws.alias("ws")
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("bpe").alias("bpe_tokens"),
            F.sum("ws").alias("ws_tokens"),
            F.round(
                F.try_divide(
                    F.sum("bpe").cast("double"), F.sum("ws").cast("double")
                ),
                4,
            ).alias("bpe_per_ws"),
        )
    )


def q_data_mix_audit_bpe(spark, sf_dir):
    """`data_mix_audit` twin priced in BPE tokens: tokens and documents
    per (source, lang) with each cell's share of the total SUBWORD token
    mass — the mixing-weight table a pretraining recipe actually wants
    (whitespace counts misprice CJK/code slices; the bpe_per_ws column
    of text_bpe_token_count quantifies by how much). Same plan shape as
    the whitespace twin: one combiner-friendly shuffle to the
    (source, lang) grain + a 1-row broadcast total."""
    merges = trained_merges(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    mix = (
        docs.select("source", "lang", bpe_token_count(merges).alias("n_toks"))
        .groupBy("source", "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_toks").alias("n_tokens"))
    )
    total = mix.agg(F.sum("n_tokens").alias("t"))
    return mix.crossJoin(F.broadcast(total)).select(
        "source",
        "lang",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("t"), 6).alias("token_share"),
    )


def q_temperature_mix_bpe(spark, sf_dir):
    """`temperature_mix` twin weighted by SUBWORD TOKEN MASS: published
    multilingual alpha-sampling (p_l ∝ size_l^α) weights languages by
    corpus size in tokens, not documents — and whitespace token counts
    misprice exactly the languages the temperature is meant to protect.
    Per language: doc/token population, the token-mass temperature
    share, the token-weighted sampling rate (expected token mass
    preserved), the md5-coin kept-doc count and achieved kept-token
    fraction. Same plan scale shape as the doc-count twin: lang-grain
    contraction, 1-row Z broadcast, map-side coin; the only addition is
    the encode chain inside the contraction's map side."""
    merges = trained_merges(spark, sf_dir)
    from .corpus_ops import MIX_ALPHA

    docs = _docs(spark, sf_dir).select(
        "doc_id", "lang", bpe_token_count(merges).alias("n_toks")
    )
    counts = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_toks").alias("n_tokens")
    )
    tot = counts.agg(
        F.sum("n_tokens").alias("t_total"),
        F.sum(F.pow("n_tokens", F.lit(MIX_ALPHA))).alias("z"),
    )
    rate = (
        F.pow("n_tokens", F.lit(MIX_ALPHA))
        / F.col("z")
        * F.col("t_total")
        / F.col("n_tokens")
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_tokens",
        F.round(F.pow("n_tokens", F.lit(MIX_ALPHA)) / F.col("z"), 6).alias(
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
        docs.join(F.broadcast(rates), "lang")
        .select(
            "lang", "n_docs", "n_tokens", "target_share", "sample_rate",
            kept.alias("kept"), "n_toks",
        )
        .groupBy("lang", "n_docs", "n_tokens", "target_share", "sample_rate")
        .agg(
            F.sum("kept").alias("n_kept"),
            F.round(
                F.try_divide(
                    F.sum(F.col("kept") * F.col("n_toks")).cast("double"),
                    F.sum("n_toks").cast("double"),
                ),
                4,
            ).alias("kept_token_frac"),
        )
    )


def q_pack_sequences_bpe(spark, sf_dir):
    """`pack_sequences` twin priced in BPE tokens: same streaming
    concat-and-chunk packer (per-(lang, shard) cumsum window, shards per
    plans/text.PACK_SHARDS), but window fill is measured in real subword
    tokens — the fill number a pretraining packer actually needs."""
    from .text import PACK_CONTEXT_TOKENS, PACK_SHARDS

    merges = trained_merges(spark, sf_dir)
    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("lang", "shard_id").orderBy("doc_id")
    sharded = docs.select(
        "lang",
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard_id"),
        bpe_token_count(merges).alias("n_toks"),
    )
    with_off = sharded.select(
        "lang",
        "shard_id",
        "n_toks",
        (F.sum("n_toks").over(w) - F.col("n_toks")).alias("start_off"),
    )
    win = F.floor(F.col("start_off") / PACK_CONTEXT_TOKENS)
    return with_off.groupBy("lang", "shard_id", win.alias("window_id")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# DuckDB oracles: the training loop unrolled as CTE rounds
# --------------------------------------------------------------------------


def _words0_cte() -> str:
    return f"""
    words_0 AS MATERIALIZED (
        SELECT ' ' || rtrim(regexp_replace(tok, '(.)', '\\1  ', 'g')) || ' '
                   AS w,
               cnt
        FROM (
            SELECT tok, COUNT(*) AS cnt
            FROM (
                SELECT unnest(regexp_extract_all(text, '{TOKEN_REGEX}'))
                       AS tok
                FROM documents
            )
            GROUP BY tok
            ORDER BY cnt DESC, tok
            LIMIT {BPE_TOP_W}
        )
    )"""


def _round_ctes(k: int) -> str:
    p = k - 1
    return f"""
    pairs_{k} AS (
        SELECT lhs, rhs, CAST(SUM(cnt) AS BIGINT) AS pc
        FROM (
            SELECT unnest(arr[1:len(arr) - 1]) AS lhs,
                   unnest(arr[2:len(arr)]) AS rhs,
                   cnt
            FROM (
                SELECT string_split(trim(w), '  ') AS arr, cnt FROM words_{p}
            )
        )
        GROUP BY 1, 2
    ),
    best_{k} AS MATERIALIZED (
        SELECT lhs, rhs, pc FROM pairs_{k} ORDER BY pc DESC, lhs, rhs LIMIT 1
    ),
    words_{k} AS MATERIALIZED (
        SELECT CASE WHEN b.lhs IS NULL THEN w
                    ELSE replace(w, ' ' || b.lhs || '  ' || b.rhs || ' ',
                                    ' ' || b.lhs || b.rhs || ' ')
               END AS w,
               cnt
        FROM words_{p} LEFT JOIN best_{k} b ON TRUE
    )"""


def _train_ctes() -> str:
    return ",".join([_words0_cte()] + [_round_ctes(k) for k in range(1, BPE_MERGES + 1)])


def _enc_ctes(carry: str) -> str:
    """Per-document encode CTE chain: enc_0 builds the boundary-joined
    symbol string, enc_k applies round k's winner (empty-round-safe via
    LEFT JOIN ON TRUE). ``carry`` = comma-joined columns to thread
    through (must exist on documents)."""
    parts = [
        f"""
    enc_0 AS MATERIALIZED (
        SELECT {carry},
               CASE WHEN len(toks) = 0 THEN ''
                    ELSE ' ' || array_to_string(
                             list_transform(toks, t ->
                                 rtrim(regexp_replace(t, '(.)', '\\1  ', 'g'))),
                             ' ' || chr(10) || ' ') || ' '
               END AS s
        FROM (
            SELECT {carry},
                   regexp_extract_all(text, '{TOKEN_REGEX}') AS toks
            FROM documents
        )
    )"""
    ]
    for k in range(1, BPE_MERGES + 1):
        parts.append(
            f"""
    enc_{k} AS MATERIALIZED (
        SELECT {carry},
               CASE WHEN b.lhs IS NULL THEN s
                    ELSE replace(s, ' ' || b.lhs || '  ' || b.rhs || ' ',
                                    ' ' || b.lhs || b.rhs || ' ')
               END AS s
        FROM enc_{k - 1} LEFT JOIN best_{k} b ON TRUE
    )"""
        )
    return ",".join(parts)


_BPE_COUNT_SQL = (
    "CASE WHEN trim(s) = '' THEN 0 "
    "ELSE len(string_split_regex(trim(s), '\\s+')) END"
)
_WS_COUNT_SQL = (
    "CASE WHEN trim(text) = '' THEN 0 "
    "ELSE len(string_split_regex(trim(text), '\\s+')) END"
)


def _vocab_train_oracle() -> str:
    rows = "\n            UNION ALL ".join(
        f"SELECT CAST({k} AS INTEGER) AS merge_rank, lhs, rhs, "
        f"lhs || rhs AS merged, pc AS pair_count FROM best_{k}"
        for k in range(1, BPE_MERGES + 1)
    )
    return f"""
        WITH {_train_ctes()}
        SELECT * FROM (
            {rows}
        )
        ORDER BY merge_rank
    """


def _token_count_oracle() -> str:
    return f"""
        WITH {_train_ctes()},{_enc_ctes("doc_id, lang")},
        per AS (
            SELECT e.lang,
                   CAST({_BPE_COUNT_SQL} AS BIGINT) AS bpe,
                   CAST({_WS_COUNT_SQL} AS BIGINT) AS ws
            FROM enc_{BPE_MERGES} e
            JOIN documents USING (doc_id)
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
               CAST(SUM(ws) AS BIGINT) AS ws_tokens,
               ROUND(CAST(SUM(bpe) AS DOUBLE) /
                     NULLIF(CAST(SUM(ws) AS DOUBLE), 0), 4) AS bpe_per_ws
        FROM per
        GROUP BY lang
    """


def _pack_bpe_oracle() -> str:
    from .text import PACK_CONTEXT_TOKENS, PACK_SHARDS

    return f"""
        WITH {_train_ctes()},{_enc_ctes("doc_id, lang")},
        per AS (
            SELECT lang, doc_id,
                   CAST(doc_id % {PACK_SHARDS} AS BIGINT) AS shard_id,
                   CAST({_BPE_COUNT_SQL} AS BIGINT) AS n_toks
            FROM enc_{BPE_MERGES}
        ),
        with_off AS (
            SELECT lang, shard_id, n_toks,
                   SUM(n_toks) OVER (
                       PARTITION BY lang, shard_id ORDER BY doc_id
                   ) - n_toks AS start_off
            FROM per
        )
        SELECT lang, shard_id,
               CAST(start_off // {PACK_CONTEXT_TOKENS} AS BIGINT) AS window_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_toks) AS BIGINT) AS n_tokens
        FROM with_off
        GROUP BY 1, 2, 3
    """


def _mix_bpe_oracle() -> str:
    return f"""
        WITH {_train_ctes()},{_enc_ctes("doc_id, source, lang")},
        per AS (
            SELECT source, lang,
                   CAST({_BPE_COUNT_SQL} AS BIGINT) AS n_toks
            FROM enc_{BPE_MERGES}
        ),
        mix AS (
            SELECT source, lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_toks) AS BIGINT) AS n_tokens
            FROM per GROUP BY 1, 2
        ),
        tot AS (SELECT SUM(n_tokens) AS t FROM mix)
        SELECT source, lang, n_docs, n_tokens,
               ROUND(CAST(n_tokens AS DOUBLE) / CAST(t AS DOUBLE), 6)
                 AS token_share
        FROM mix CROSS JOIN tot
    """


def _temperature_mix_bpe_oracle() -> str:
    from .corpus_ops import MIX_ALPHA

    return f"""
        WITH {_train_ctes()},{_enc_ctes("doc_id, lang")},
        per AS (
            SELECT doc_id, lang,
                   CAST({_BPE_COUNT_SQL} AS BIGINT) AS n_toks
            FROM enc_{BPE_MERGES}
        ),
        counts AS (
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_toks) AS BIGINT) AS n_tokens
            FROM per GROUP BY lang
        ),
        tot AS (
            SELECT SUM(n_tokens) AS t_total,
                   SUM(pow(n_tokens, {MIX_ALPHA})) AS z
            FROM counts
        ),
        rates AS (
            SELECT lang, n_docs, n_tokens,
                   ROUND(pow(n_tokens, {MIX_ALPHA}) / z, 6) AS target_share,
                   ROUND(pow(n_tokens, {MIX_ALPHA}) / z * t_total / n_tokens, 4)
                     AS sample_rate,
                   ROUND(LEAST(1.0, pow(n_tokens, {MIX_ALPHA}) / z
                                    * t_total / n_tokens), 4) AS keep_rate
            FROM counts, tot
        ),
        coined AS (
            SELECT r.lang, r.n_docs, r.n_tokens, r.target_share,
                   r.sample_rate, p.n_toks,
                   CASE WHEN (CAST('0x' || substr(md5(CAST(p.doc_id AS VARCHAR)), 1, 8)
                                   AS BIGINT) % 10000) / 10000.0 < r.keep_rate
                        THEN 1 ELSE 0 END AS kept
            FROM per p JOIN rates r USING (lang)
        )
        SELECT lang, n_docs, n_tokens, target_share, sample_rate,
               CAST(SUM(kept) AS BIGINT) AS n_kept,
               ROUND(CAST(SUM(kept * n_toks) AS DOUBLE)
                     / NULLIF(CAST(SUM(n_toks) AS DOUBLE), 0), 4)
                 AS kept_token_frac
        FROM coined
        GROUP BY lang, n_docs, n_tokens, target_share, sample_rate
    """


QUERIES = {
    "bpe_vocab_train": q_bpe_vocab_train,
    "text_bpe_token_count": q_text_bpe_token_count,
    "data_mix_audit_bpe": q_data_mix_audit_bpe,
    "temperature_mix_bpe": q_temperature_mix_bpe,
    "pack_sequences_bpe": q_pack_sequences_bpe,
}

ORACLES = {
    "bpe_vocab_train": _vocab_train_oracle(),
    "text_bpe_token_count": _token_count_oracle(),
    "data_mix_audit_bpe": _mix_bpe_oracle(),
    "temperature_mix_bpe": _temperature_mix_bpe_oracle(),
    "pack_sequences_bpe": _pack_bpe_oracle(),
}
