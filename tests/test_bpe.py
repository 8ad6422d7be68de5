"""BPE tokenizer: the string-replace apply chain must implement exactly
the symbol-list greedy merge semantics, and training must be
deterministic under the documented tie-break."""

import re

from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.bpe import (
    BPE_MERGES,
    bpe_token_count,
    encode_word,
    merge_word,
    train_merges,
    trained_merges,
)
from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.text import TOKEN_REGEX


def test_merge_word_greedy_left_to_right():
    assert merge_word(list("aaa"), "a", "a") == ["aa", "a"]
    assert merge_word(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert merge_word(list("abab"), "a", "b") == ["ab", "ab"]
    # merged symbol never re-pairs with the next symbol in the same pass
    assert merge_word(["a", "b", "b"], "a", "b") == ["ab", "b"]
    assert merge_word([], "a", "b") == []
    assert merge_word(["x"], "a", "b") == ["x"]


def test_train_merges_tie_break_and_early_stop():
    # 'ab'x2 and 'cd'x2 tie at count 2 -> lexicographically smallest pair
    merges = train_merges([("ab", 2), ("cd", 2)])
    assert merges[0][1:4] == ("a", "b", "ab")
    # single-char words have no pairs: training stops with zero merges
    assert train_merges([("a", 5), ("b", 3)]) == []
    # exhaustion: one 2-char word trains exactly 1 merge, not BPE_MERGES
    assert len(train_merges([("xy", 7)])) == 1


def test_apply_chain_matches_reference_encoder(spark, sf_dir):
    """The JVM replace-chain token count must equal the independent
    pure-Python encoder (greedy rank-order merge over symbol lists) on
    every fixture document."""
    merges = trained_merges(spark, sf_dir)
    assert 0 < len(merges) <= BPE_MERGES
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", bpe_token_count(merges).alias("n")
        ).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        toks = re.findall(TOKEN_REGEX, row.text or "")
        want = sum(len(encode_word(t, merges)) for t in toks)
        assert got[row.doc_id] == want, row.doc_id


def test_merge_table_ranks_are_contiguous(spark, sf_dir):
    merges = trained_merges(spark, sf_dir)
    assert [m[0] for m in merges] == list(range(1, len(merges) + 1))
    # merged symbol is always the concatenation of its parts
    for _rank, lhs, rhs, merged, cnt in merges:
        assert merged == lhs + rhs and cnt >= 1


def test_bpe_never_exceeds_char_count(spark, sf_dir):
    """Subword tokens are bounded below by pre-token count and above by
    character count of the pre-tokens."""
    merges = trained_merges(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chk = docs.select(
        bpe_token_count(merges).alias("bpe"),
        F.regexp_count("text", F.lit(TOKEN_REGEX)).alias("pre"),
        F.length(F.regexp_replace("text", r"\s", "")).alias("chars"),
    ).agg(
        F.sum((F.col("bpe") < F.col("pre")).cast("int")).alias("under"),
        F.sum((F.col("bpe") > F.col("chars")).cast("int")).alias("over"),
    ).collect()[0]
    assert chk.under == 0 and chk.over == 0
