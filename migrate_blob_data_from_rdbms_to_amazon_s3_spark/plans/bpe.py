"""Distributed subword (BPE) tokenizer — train and apply at vocabulary scale.

Reference analog: none (the reference has no text surface; SURVEY §7/M2
extension). Every token-priced operator in the registry (`pack_sequences`,
`data_mix_audit`, `temperature_mix`, BM25 document lengths) counts
whitespace tokens, which systematically misprices CJK/code corpora. This
module trains a byte-pair-encoding merge table on the corpus (Sennrich,
Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
Subword Units", ACL) and applies it through a distinct-word contraction,
so the registry's mixing/packing audits can price real subword tokens —
at merge-table sizes three orders of magnitude past the r11 replace-chain
ceiling.

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
- **Apply** (r12, the vocabulary-scale path) contracts the corpus to its
  DISTINCT pre-tokens — Zipf/Heaps makes that table sublinear in token
  mass — and encodes each distinct word ONCE with an Arrow-batched
  kernel driven by a pair→rank dict (the iterative lowest-rank-first
  merge of the public GPT-2 encoder / subword-nmt `apply_bpe`,
  O(merges-applied × word-len) per word, NOT O(|merge table|) string
  passes). Per-document counts come back via one join on the token and
  one doc-keyed aggregation; docs with zero pre-tokens are preserved by
  a left join. The kernel cost is per distinct WORD; a 100 TB corpus
  pays the same vocabulary bill as a 100 GB one, plus a narrow
  explode-join-reduce over token occurrences. The r11 whole-document
  replace-chain apply (32 chained literal `replace()`s — right at 32
  merges, O(merges) full string passes per document at a production
  32 k-merge vocab) is kept below as the value-oracled 32-merge twin,
  pinned equal to the kernel in tests/test_bpe.py.

Encoding invariant of the chain twin (and the DuckDB oracles): a word's
symbol sequence is stored as `' ' + '  '.join(symbols) + ' '` — every
symbol carries its own leading AND trailing space, with TWO spaces
between adjacent symbols. Merging pair (x, y) is then the literal string
replacement `' x  y ' → ' xy '`, which (a) can never match across
pre-token boundaries (documents join pre-tokens with ' \\n ' — the
pattern has no newline), and (b) is exactly greedy left-to-right
non-overlapping BPE merge application: `replace()` in Spark, DuckDB, and
Python all scan left-to-right and resume AFTER the replacement, and the
replacement restores the invariant. `tests/test_bpe.py` pins chain,
kernel, and the independent symbol-list reference encoder all equal.

Determinism: pair counts are exact integer sums; argmax ties break on
(count DESC, lhs ASC, rhs ASC) — Python tuple comparison of str is
code-point order, identical to the UTF-8 binary collation both engines
sort strings with. The DuckDB oracles re-run the ENTIRE training loop —
as a recursive CTE whose working table is the evolving word table (one
aggregate-subquery argmax per iteration; early-stops on pair exhaustion
exactly like the Python trainer's `break`), replacing r11's unrolled CTE
chain whose planner cost grew quadratically in rounds — so the gate
verifies training AND apply end-to-end at the full 256-round cap.

r11's astral-plane caveat is CLOSED by the kernel: symbols come from
Python `list(word)` (code points), matching DuckDB's `(.)`; the chain
twin's Spark-side `regexp_replace(tok, "(.)", ...)` remains BMP-exact
only and is confined to the 32-merge twin (fixtures are BMP; the kernel
path is pinned on astral input in tests/test_bpe.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.local_frame import arrow_local_df
from .text import TOKEN_REGEX, _docs

BPE_TOP_W = 4096
# Vocabulary-scale cap (r12): the kernel apply is O(merges-applied), so the
# cap is a training-round budget, not an apply cost. The synthetic fixture
# corpus (31 distinct tokens) exhausts its pair supply at 89 merges — every
# word collapses to a single symbol, so at this cap bpe == pre-token count
# by construction there; tests/test_bpe.py pins the kernel at vocabulary
# scale on a generated large-vocab corpus where the cap binds.
BPE_MERGES = 256
# The r11 whole-document replace-chain apply survives as a value-oracled
# twin at its documented ceiling (O(merges) string passes per document).
BPE_CHAIN_MERGES = 32


# --------------------------------------------------------------------------
# pure-Python training + encoding core (shared by Spark plans and tests)
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


def encode_word_ranked(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Production-shaped encoder: iteratively merge the lowest-RANK pair
    present (the public GPT-2 / subword-nmt apply algorithm). Equivalent
    to rank-order sequential application for TRAINED merge tables (any
    compound symbol in a pair was created by an earlier-rank merge, so a
    merge can never re-enable a lower-rank pair) — an equivalence the
    DuckDB oracle gate enforces end-to-end and tests/test_bpe.py pins on
    randomized trained tables. Cost is O(merges-APPLIED × len), not
    O(|merge table|): a 50 k-merge vocabulary costs a short word a
    handful of dict probes, which is what makes BPE_MERGES a free dial.
    """
    syms = list(word)
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        syms = merge_word(syms, best_pair[0], best_pair[1])
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


# Session-lifetime memo keyed by fixture dir: the registry consumers
# (vocab table, token count, mix audits, packer) share one training run
# per corpus, which is the production lifecycle (train once, apply
# everywhere). Safe because training is a deterministic pure function of
# the fixture bytes and fixture dirs are immutable (testdata is
# read-only; test fixtures use unique tmp paths). `q_bpe_vocab_train`
# deliberately drops the memo entry first so ITS wall time always prices
# a real training run (r11 advice: the headline/SCALING number must
# measure training, not a dict hit).
_MERGES_MEMO: dict[str, list] = {}


def trained_merges(spark, sf_dir):
    """Collect the bounded word table (≤ BPE_TOP_W rows) and run the
    pure-Python merge loop — the documented iterative-fit pattern
    (cf. `_kmeans_fit`'s per-round centroid collect)."""
    if sf_dir not in _MERGES_MEMO:
        rows = _word_counts(spark, sf_dir).collect()
        _MERGES_MEMO[sf_dir] = train_merges([(r.tok, r.cnt) for r in rows])
    return _MERGES_MEMO[sf_dir]


def bpe_len_udf(merges):
    """Arrow-batched kernel: distinct pre-token → subword count under the
    frozen merge table (broadcast via closure: ≤ BPE_MERGES tuples)."""
    ranks = {(lhs, rhs): rank for rank, lhs, rhs, _m, _c in merges}

    @pandas_udf("long")
    def bpe_len(toks: pd.Series) -> pd.Series:
        return toks.map(lambda w: len(encode_word_ranked(w, ranks)))

    return bpe_len


def _tok_lens(spark, sf_dir, merges):
    """(tok, n_sub) for every DISTINCT pre-token in the corpus — the
    vocabulary contraction that makes apply cost sublinear in token
    mass. One exchange (the distinct), one Arrow kernel pass."""
    docs = _docs(spark, sf_dir)
    dtok = docs.select(
        F.explode(F.regexp_extract_all("text", F.lit(TOKEN_REGEX), 0)).alias("tok")
    ).distinct()
    return dtok.select("tok", bpe_len_udf(merges)("tok").alias("n_sub"))


def bpe_doc_counts(spark, sf_dir, merges, *carry, barrier: bool = True):
    """Per-document subword token count at the doc grain: explode token
    occurrences, join the distinct-token length table (tiny vs the
    occurrence stream — AQE broadcasts it at runtime; falls back to a
    shuffle join if the vocabulary ever outgrows the threshold), sum per
    doc, and LEFT-join back so zero-token documents keep n_toks = 0.
    ``carry`` = extra Columns evaluated on the documents scan (already
    aliased) to thread through."""
    docs = _docs(spark, sf_dir)
    occ = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all("text", F.lit(TOKEN_REGEX), 0)).alias("tok"),
    )
    per = (
        occ.join(_tok_lens(spark, sf_dir, merges), "tok")
        .groupBy("doc_id")
        .agg(F.sum("n_sub").alias("__bpe"))
    )
    out = (
        docs.select("doc_id", *carry)
        .join(per, "doc_id", "left")
        .withColumn("n_toks", F.coalesce("__bpe", F.lit(0)).cast("long"))
        .drop("__bpe")
    )
    if barrier:
        # Lazy checkpoint: consumers that read this frame on two plan
        # branches (mix + its broadcast total; counts + the coin join)
        # would otherwise re-run the explode/kernel/join subtree per
        # branch — each bpe_len_udf() call mints fresh expression ids,
        # so Spark's ReuseExchange can never canonicalize the copies
        # (observed: 4 ArrowEvalPython stages in data_mix_audit_bpe's
        # plan). One materialization of the narrow doc-grain table
        # (ids + n_toks, no text) is the honest single-pass answer —
        # the stat_tests grain-checkpoint precedent. Single-branch
        # consumers pass barrier=False so the full subtree stays
        # visible to the fleet plan linter.
        out = out.localCheckpoint(eager=False)
    return out


def _ws_count():
    return (
        F.when(F.trim("text") == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), r"\s+")))
        .cast("long")
    )


def q_bpe_vocab_train(spark, sf_dir):
    """The trained merge table itself: (merge_rank, lhs, rhs, merged,
    pair_count). Always retrains (memo dropped) so its wall time prices
    a real training run; the DuckDB oracle re-derives it with the full
    recursive training loop, so this query value-gates the trainer
    end-to-end."""
    _MERGES_MEMO.pop(sf_dir, None)
    rows = trained_merges(spark, sf_dir)
    return arrow_local_df(
        spark,
        rows,
        "merge_rank int, lhs string, rhs string, merged string, pair_count bigint",
    )


def q_text_bpe_token_count(spark, sf_dir):
    """Per-language corpus pricing with REAL subword tokens: document
    count, total BPE tokens, total whitespace tokens, and the BPE-per-
    whitespace inflation ratio — the number that shows how far
    whitespace counting misprices each language slice. Distinct-word
    kernel apply at the full BPE_MERGES cap."""
    merges = trained_merges(spark, sf_dir)
    per = bpe_doc_counts(
        spark, sf_dir, merges, F.col("lang"), _ws_count().alias("ws"), barrier=False
    )
    return per.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("bpe_tokens"),
        F.sum("ws").alias("ws_tokens"),
        F.round(
            F.try_divide(F.sum("n_toks").cast("double"), F.sum("ws").cast("double")),
            4,
        ).alias("bpe_per_ws"),
    )


def q_text_bpe_token_count_chain(spark, sf_dir):
    """The r11 whole-document replace-chain apply, kept as a value-oracled
    twin at its documented 32-merge ceiling (O(merges) string passes per
    document — the reason the kernel path exists). Same output schema as
    `text_bpe_token_count`; tests/test_bpe.py pins chain == kernel at
    BPE_CHAIN_MERGES. Training is prefix-stable, so the twin's table is
    exactly the first 32 rows of the full run."""
    merges = trained_merges(spark, sf_dir)[:BPE_CHAIN_MERGES]
    docs = _docs(spark, sf_dir)
    per = docs.select(
        "lang", bpe_token_count(merges).alias("bpe"), _ws_count().alias("ws")
    )
    return per.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("bpe").alias("bpe_tokens"),
        F.sum("ws").alias("ws_tokens"),
        F.round(
            F.try_divide(F.sum("bpe").cast("double"), F.sum("ws").cast("double")),
            4,
        ).alias("bpe_per_ws"),
    )


def q_data_mix_audit_bpe(spark, sf_dir):
    """`data_mix_audit` twin priced in BPE tokens: tokens and documents
    per (source, lang) with each cell's share of the total SUBWORD token
    mass — the mixing-weight table a pretraining recipe actually wants
    (whitespace counts misprice CJK/code slices; the bpe_per_ws column
    of text_bpe_token_count quantifies by how much). Same plan shape as
    the whitespace twin past the count stage: one combiner-friendly
    shuffle to the (source, lang) grain + a 1-row broadcast total."""
    merges = trained_merges(spark, sf_dir)
    per = bpe_doc_counts(spark, sf_dir, merges, F.col("source"), F.col("lang"))
    mix = per.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_toks").alias("n_tokens")
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
    contraction, 1-row Z broadcast, map-side coin — fed by the
    distinct-word kernel counts."""
    merges = trained_merges(spark, sf_dir)
    from .corpus_ops import MIX_ALPHA

    docs = bpe_doc_counts(spark, sf_dir, merges, F.col("lang"))
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
    tokens — the fill number a pretraining packer actually needs. The
    kernel counts arrive MATERIALIZED through the doc-grain aggregation
    before the window stage (r11 verdict item 2: the encode is never
    re-evaluated inside the window)."""
    from .text import PACK_CONTEXT_TOKENS, PACK_SHARDS

    merges = trained_merges(spark, sf_dir)
    sharded = bpe_doc_counts(spark, sf_dir, merges, F.col("lang"), barrier=False).select(
        "lang",
        "doc_id",
        (F.col("doc_id") % PACK_SHARDS).alias("shard_id"),
        "n_toks",
    )
    w = Window.partitionBy("lang", "shard_id").orderBy("doc_id")
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
# the 32-merge replace-chain twin (r11 apply path, JVM built-ins only)
# --------------------------------------------------------------------------


def _encoded_doc(merges):
    """Whole-document encoded-string Column: pre-tokens joined with the
    ' \\n ' boundary, each as a '  '-delimited symbol run, then the
    frozen merge list as chained literal replaces (all JVM built-ins).
    O(len(merges)) full string passes per document — the twin's
    documented ceiling; the kernel path is the scale answer."""
    toks = F.regexp_extract_all("text", F.lit(TOKEN_REGEX), 0)
    syms = F.transform(toks, lambda t: F.rtrim(F.regexp_replace(t, "(.)", "$1  ")))
    s = F.when(F.size(toks) == 0, F.lit("")).otherwise(
        F.concat(F.lit(" "), F.array_join(syms, " \n "), F.lit(" "))
    )
    for _rank, lhs, rhs, merged, _c in merges:
        s = F.replace(s, F.lit(f" {lhs}  {rhs} "), F.lit(f" {merged} "))
    return s


def bpe_token_count(merges):
    """Per-document BPE token count Column (long) via the replace chain."""
    s = _encoded_doc(merges)
    return (
        F.when(F.trim(s) == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim(s), r"\s+")))
        .cast("long")
    )


# --------------------------------------------------------------------------
# DuckDB oracles
#
# Training is a recursive CTE: the working table is the evolving
# (word, cnt) table tagged with the round number; each iteration joins
# the single argmax row (aggregate subquery over the working table —
# DuckDB evaluates it against the PREVIOUS iteration's rows, exactly the
# loop-carried state) and rewrites every word with one literal replace.
# The inner join makes recursion stop the moment no adjacent pair
# remains — the Python trainer's early `break`. Planner cost is O(1) in
# rounds (r11's unrolled chain was quadratic: 14 s at 256 rounds vs
# 0.4 s here). Encoding replays the merge table in rank order over the
# DISTINCT token table with a second recursive CTE — the same
# vocabulary contraction as the Spark plan.
# --------------------------------------------------------------------------


def _train_rec_ctes(n_rounds: int = BPE_MERGES) -> str:
    """words0 → st (the recursive trainer) → merges(rank, lhs, rhs, pc)
    → nm (merge count, for selecting the final encode round)."""
    return f"""
    words0 AS (
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
    ),
    st AS (
        SELECT 0 AS r, w, cnt,
               CAST(NULL AS VARCHAR) AS mlhs,
               CAST(NULL AS VARCHAR) AS mrhs,
               CAST(NULL AS BIGINT) AS mpc
        FROM words0
      UNION ALL
        SELECT st.r + 1,
               replace(st.w, ' ' || b.lhs || '  ' || b.rhs || ' ',
                             ' ' || b.lhs || b.rhs || ' '),
               st.cnt, b.lhs, b.rhs, b.pc
        FROM st JOIN (
            SELECT lhs, rhs, CAST(SUM(cnt) AS BIGINT) AS pc
            FROM (
                SELECT unnest(arr[1:len(arr) - 1]) AS lhs,
                       unnest(arr[2:len(arr)]) AS rhs,
                       cnt
                FROM (
                    SELECT string_split(trim(w), '  ') AS arr, cnt FROM st
                )
            )
            GROUP BY 1, 2
            ORDER BY pc DESC, lhs, rhs
            LIMIT 1
        ) b ON TRUE
        WHERE st.r < {n_rounds}
    ),
    merges AS MATERIALIZED (
        SELECT r AS rank, ANY_VALUE(mlhs) AS lhs, ANY_VALUE(mrhs) AS rhs,
               ANY_VALUE(mpc) AS pc
        FROM st WHERE r > 0 GROUP BY r
    ),
    nm AS (SELECT COUNT(*) AS n FROM merges)"""


def _lens_ctes() -> str:
    """dtok → enc (recursive rank-order replay) → lens(tok, n): subword
    count per DISTINCT pre-token — the oracle's vocabulary contraction."""
    return f"""
    dtok AS (
        SELECT DISTINCT tok FROM (
            SELECT unnest(regexp_extract_all(text, '{TOKEN_REGEX}')) AS tok
            FROM documents
        )
    ),
    enc AS (
        SELECT 0 AS r, tok,
               ' ' || rtrim(regexp_replace(tok, '(.)', '\\1  ', 'g')) || ' '
                   AS s
        FROM dtok
      UNION ALL
        SELECT e.r + 1, e.tok,
               replace(e.s, ' ' || m.lhs || '  ' || m.rhs || ' ',
                            ' ' || m.lhs || m.rhs || ' ')
        FROM enc e JOIN merges m ON m.rank = e.r + 1
    ),
    lens AS (
        SELECT tok,
               CAST(len(string_split_regex(trim(s), '\\s+')) AS BIGINT) AS n
        FROM enc, nm WHERE r = nm.n
    )"""


def _perdoc_ctes(carry: str) -> str:
    """occ → perdoc: per-document subword count with zero-token docs kept
    (LEFT JOIN), threading ``carry`` columns from documents through."""
    return f"""
    occ AS (
        SELECT doc_id,
               unnest(regexp_extract_all(text, '{TOKEN_REGEX}')) AS tok
        FROM documents
    ),
    perdoc AS (
        SELECT d.doc_id, {carry}, COALESCE(s.bpe, 0) AS n_toks
        FROM documents d LEFT JOIN (
            SELECT occ.doc_id, CAST(SUM(l.n) AS BIGINT) AS bpe
            FROM occ JOIN lens l USING (tok)
            GROUP BY occ.doc_id
        ) s USING (doc_id)
    )"""


_WS_COUNT_SQL = (
    "CASE WHEN trim(text) = '' THEN 0 "
    "ELSE len(string_split_regex(trim(text), '\\s+')) END"
)


def _vocab_train_oracle() -> str:
    return f"""
        WITH RECURSIVE {_train_rec_ctes()}
        SELECT CAST(rank AS INTEGER) AS merge_rank, lhs, rhs,
               lhs || rhs AS merged, pc AS pair_count
        FROM merges
        ORDER BY merge_rank
    """


def _token_count_oracle() -> str:
    return f"""
        WITH RECURSIVE {_train_rec_ctes()},{_lens_ctes()},{_perdoc_ctes("d.lang")},
        per AS (
            SELECT p.lang, p.n_toks AS bpe,
                   CAST({_WS_COUNT_SQL} AS BIGINT) AS ws
            FROM perdoc p JOIN documents USING (doc_id)
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
        WITH RECURSIVE {_train_rec_ctes()},{_lens_ctes()},{_perdoc_ctes("d.lang")},
        per AS (
            SELECT lang, doc_id,
                   CAST(doc_id % {PACK_SHARDS} AS BIGINT) AS shard_id,
                   n_toks
            FROM perdoc
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
        WITH RECURSIVE {_train_rec_ctes()},{_lens_ctes()},{_perdoc_ctes("d.source, d.lang")},
        mix AS (
            SELECT source, lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_toks) AS BIGINT) AS n_tokens
            FROM perdoc GROUP BY 1, 2
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
        WITH RECURSIVE {_train_rec_ctes()},{_lens_ctes()},{_perdoc_ctes("d.lang")},
        counts AS (
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(n_toks) AS BIGINT) AS n_tokens
            FROM perdoc GROUP BY lang
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
            FROM perdoc p JOIN rates r USING (lang)
        )
        SELECT lang, n_docs, n_tokens, target_share, sample_rate,
               CAST(SUM(kept) AS BIGINT) AS n_kept,
               ROUND(CAST(SUM(kept * n_toks) AS DOUBLE)
                     / NULLIF(CAST(SUM(n_toks) AS DOUBLE), 0), 4)
                 AS kept_token_frac
        FROM coined
        GROUP BY lang, n_docs, n_tokens, target_share, sample_rate
    """


# ---- the 32-merge chain twin's oracle: same recursive trainer capped at
# BPE_CHAIN_MERGES, whole-document replace-chain replay (the r11 shape,
# but recursive instead of unrolled) ----


def _doc_enc_ctes() -> str:
    """Whole-document encode replay: denc_0 builds the boundary-joined
    symbol string per document, each iteration applies one merge rank."""
    return f"""
    denc AS (
        SELECT 0 AS r, doc_id, lang,
               CASE WHEN len(toks) = 0 THEN ''
                    ELSE ' ' || array_to_string(
                             list_transform(toks, t ->
                                 rtrim(regexp_replace(t, '(.)', '\\1  ', 'g'))),
                             ' ' || chr(10) || ' ') || ' '
               END AS s
        FROM (
            SELECT doc_id, lang,
                   regexp_extract_all(text, '{TOKEN_REGEX}') AS toks
            FROM documents
        )
      UNION ALL
        SELECT e.r + 1, e.doc_id, e.lang,
               replace(e.s, ' ' || m.lhs || '  ' || m.rhs || ' ',
                            ' ' || m.lhs || m.rhs || ' ')
        FROM denc e JOIN merges m ON m.rank = e.r + 1
    )"""


_BPE_COUNT_SQL = (
    "CASE WHEN trim(s) = '' THEN 0 "
    "ELSE len(string_split_regex(trim(s), '\\s+')) END"
)


def _token_count_chain_oracle() -> str:
    return f"""
        WITH RECURSIVE {_train_rec_ctes(BPE_CHAIN_MERGES)},{_doc_enc_ctes()},
        per AS (
            SELECT e.lang,
                   CAST({_BPE_COUNT_SQL} AS BIGINT) AS bpe,
                   CAST({_WS_COUNT_SQL} AS BIGINT) AS ws
            FROM denc e
            JOIN documents USING (doc_id)
            CROSS JOIN nm
            WHERE e.r = nm.n
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


QUERIES = {
    "bpe_vocab_train": q_bpe_vocab_train,
    "text_bpe_token_count": q_text_bpe_token_count,
    "text_bpe_token_count_chain": q_text_bpe_token_count_chain,
    "data_mix_audit_bpe": q_data_mix_audit_bpe,
    "temperature_mix_bpe": q_temperature_mix_bpe,
    "pack_sequences_bpe": q_pack_sequences_bpe,
}

ORACLES = {
    "bpe_vocab_train": _vocab_train_oracle(),
    "text_bpe_token_count": _token_count_oracle(),
    "text_bpe_token_count_chain": _token_count_chain_oracle(),
    "data_mix_audit_bpe": _mix_bpe_oracle(),
    "temperature_mix_bpe": _temperature_mix_bpe_oracle(),
    "pack_sequences_bpe": _pack_bpe_oracle(),
}
