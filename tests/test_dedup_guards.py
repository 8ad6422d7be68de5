"""Adversarial-corpus guards on the dedup operators: the hot-shingle
document-frequency cap (stop-phrase postings) and the empty-shingle
banding guard (docs too short to shingle)."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans import dedup


def _write_docs(tmp_path, rows):
    """rows: list of (doc_id, text). Writes a documents.parquet fixture."""
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["test"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, f"{tmp_path}/documents.parquet")
    return str(tmp_path)


@pytest.fixture()
def stop_phrase_corpus(tmp_path):
    """10 docs sharing a 6-token stop-phrase prefix (every prefix shingle
    has document frequency 10) plus a unique 2-token tail (so pairwise
    Jaccard = 4/8 = 0.5 via the hot shingles alone)."""
    prefix = "terms of service apply to all"
    rows = [(i, f"{prefix} tail{i} end{i}") for i in range(10)]
    return _write_docs(tmp_path, rows)


def test_hot_shingle_cap_drops_stop_phrase_pairs(spark, stop_phrase_corpus):
    # uncapped (cap above DF=10): every pair qualifies via the shared prefix
    uncapped = dedup.q_dedup_ngram_jaccard(
        spark, stop_phrase_corpus, max_posting_df=64
    ).collect()
    assert len(uncapped) == 45  # C(10,2)
    assert all(abs(r.jaccard - 0.5) < 1e-9 for r in uncapped)

    # capped below the stop-phrase DF: the hot postings vanish before pair
    # emission, and with them every pair whose overlap was only boilerplate
    capped = dedup.q_dedup_ngram_jaccard(
        spark, stop_phrase_corpus, max_posting_df=4
    ).collect()
    assert capped == []


def test_hot_shingle_cap_keeps_genuine_neardups(spark, tmp_path):
    """A true near-dup pair (unique shared content) must survive a cap that
    kills the stop-phrase block around it."""
    prefix = "terms of service apply to all"
    rows = [(i, f"{prefix} tail{i} end{i}") for i in range(10)]
    # docs 100/101: same unique 8-token body, differing tail — their common
    # shingles have DF=2, far below the cap
    body = "quick brown foxes jump over the lazy dog"
    rows += [(100, f"{body} alpha"), (101, f"{body} beta")]
    sf = _write_docs(tmp_path, rows)
    got = dedup.q_dedup_ngram_jaccard(spark, sf, max_posting_df=4).collect()
    assert [(r.doc_a, r.doc_b) for r in got] == [(100, 101)]
    # 9 tokens -> 7 shingles each, 6 shared: 6/(7+7-6)
    assert abs(got[0].jaccard - round(6 / 8, 4)) < 1e-9


def test_default_cap_is_noop_on_fixture(spark, sf_dir):
    """MAX_POSTING_DF sits above the fixture's max posting size, so the cap
    must not change results on natural text."""
    capped = dedup.q_dedup_ngram_jaccard(spark, sf_dir).collect()
    uncapped = dedup.q_dedup_ngram_jaccard(
        spark, sf_dir, max_posting_df=1 << 30
    ).collect()
    key = lambda r: (r.doc_a, r.doc_b)
    assert sorted(map(key, capped)) == sorted(map(key, uncapped))
    assert len(capped) > 0


def test_minhash_lsh_excludes_shingleless_docs(spark, tmp_path):
    """Docs with < 3 tokens have no shingles → NULL signatures. They must
    not band (pre-guard they all landed in one '' bucket in Spark while the
    SQL twin's NULL band_val never joined — cross-engine divergence)."""
    rows = [
        (1, "hi"),
        (2, "a b"),
        (3, ""),
        (4, "the quick brown fox jumps high"),
        (5, "the quick brown fox jumps high"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = dedup.q_dedup_minhash_lsh(spark, sf).collect()
    # the two real duplicates pair; the shingleless docs pair with nothing
    assert [(r.doc_a, r.doc_b, r.est_jaccard) for r in got] == [(4, 5, 1.0)]

    # cross-engine: the DuckDB twin agrees on the same corpus
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    oracle = con.execute(dedup.ORACLES["dedup_minhash_lsh"]).fetchall()
    assert [(a, b, float(j)) for a, b, j in oracle] == [(4, 5, 1.0)]


def test_containment_catches_substring_dup_jaccard_misses(spark, tmp_path):
    """A short doc quoted whole inside a much longer one: containment = 1.0
    (every shingle of the short doc appears in the long one) while Jaccard
    stays below the 0.2 threshold — the case the asymmetric operator
    exists for. An unrelated third doc must pair with neither."""
    short = "the quick brown fox jumps over the lazy dog tonight"  # 10 toks
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(30))  # 90 unique toks
    rows = [
        (1, short),
        (2, f"{filler} {short}"),
        (3, "completely different text about something else entirely here"),
    ]
    sf = _write_docs(tmp_path, rows)

    cont = {
        (r.doc_a, r.doc_b): r
        for r in dedup.q_dedup_containment(spark, sf).collect()
    }
    assert (1, 2) in cont
    assert cont[(1, 2)].containment == 1.0
    assert cont[(1, 2)].contained_doc == 1  # the short doc is the one to drop
    assert all(3 not in pair for pair in cont)

    jac = {
        (r.doc_a, r.doc_b)
        for r in dedup.q_dedup_ngram_jaccard(spark, sf).collect()
    }
    assert (1, 2) not in jac  # symmetric Jaccard misses it (8/92 < 0.2)


# --- hot-bucket guard: degenerate LSH band buckets ---------------------------


def test_minhash_lsh_hot_bucket_capped(spark, tmp_path):
    """Adversarial corpus: 2,000 IDENTICAL docs (mass-duplicated
    boilerplate). All share every band bucket, so an uncapped band join
    emits C(2000,2) ≈ 2M pairs — the |bucket|² blowup MAX_BAND_BUCKET
    exists to stop. With the cap the degenerate buckets drop before the
    join (0 pairs from the mass), while a genuine near-dup pair elsewhere
    in the corpus (bucket size 2) must still be found, and exact dedup —
    the operator responsible for identical content — must collapse the
    mass to one keeper."""
    boiler = "this content is copyright of the site and may not be reproduced"
    rows = [(i, boiler) for i in range(2000)]
    # genuine near-dup pair: long shared body, one differing tail token
    body = "the quick brown fox jumps over the lazy dog near the river bank"
    rows += [(9001, f"{body} alpha"), (9002, f"{body} beta")]
    sf = _write_docs(tmp_path, rows)

    pairs = [
        (r.doc_a, r.doc_b)
        for r in dedup.q_dedup_minhash_lsh(spark, sf).collect()
    ]
    assert (9001, 9002) in pairs
    assert all(a >= 9001 for a, _ in pairs)  # no pair from the capped mass

    exact = {
        r.keep_doc_id: r.n_copies for r in dedup.q_dedup_exact(spark, sf).collect()
    }
    assert exact[0] == 2000  # identical mass handled where it belongs


def test_minhash_lsh_cap_noop_on_fixture(spark, sf_dir):
    """MAX_BAND_BUCKET sits far above the fixture's max band bucket
    (measured 14 at sf0.1), so the cap must not change natural results."""
    import migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.dedup as D

    baseline = {
        (r.doc_a, r.doc_b) for r in D.q_dedup_minhash_lsh(spark, sf_dir).collect()
    }
    orig = D.MAX_BAND_BUCKET
    try:
        D.MAX_BAND_BUCKET = 1 << 30
        uncapped = {
            (r.doc_a, r.doc_b)
            for r in D.q_dedup_minhash_lsh(spark, sf_dir).collect()
        }
    finally:
        D.MAX_BAND_BUCKET = orig
    assert baseline == uncapped


def test_neardup_embedding_hot_bucket_capped(spark, tmp_path):
    """2,000 identical embeddings collapse into ONE bucket per LSH table;
    the probe x build join on that bucket is quadratic uncapped. With the
    build-side cap the mass yields no pairs, while a genuine near-dup pair
    under a different label (its buckets hold only 2 vectors) survives."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans import similarity as S

    rng = np.random.default_rng(7)
    hot = rng.standard_normal(64).astype("float32")
    base = rng.standard_normal(64).astype("float32")
    near = base + 0.01 * rng.standard_normal(64).astype("float32")

    vec_ids = list(range(2000)) + [9001, 9002]
    embs = [hot.tolist()] * 2000 + [base.tolist(), near.tolist()]
    labels = [1] * 2000 + [2, 2]
    table = pa.table(
        {
            "vec_id": pa.array(vec_ids, pa.int64()),
            "embedding": pa.array(embs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(table, f"{tmp_path}/embeddings.parquet")

    got = S.q_neardup_embedding(spark, str(tmp_path)).collect()
    pairs = {(r.vec_a, r.vec_b) for r in got}
    assert (9001, 9002) in pairs
    assert all(a >= 9001 for a, _ in pairs)  # nothing from the capped mass


# --- leakage-safe split ------------------------------------------------------


def test_leakage_safe_split_invariants(spark, sf_dir):
    """The whole point of the operator: no near-dup component straddles
    the train/val/test boundary, every doc is assigned exactly once, and
    every LSH candidate pair lands on one side."""
    from pyspark.sql import functions as F

    assigned = dedup.q_leakage_safe_split(spark, sf_dir)
    assigned.cache()

    n_docs = dedup._docs(spark, sf_dir).count()
    assert assigned.count() == n_docs
    assert assigned.select("doc_id").distinct().count() == n_docs

    straddling = (
        assigned.groupBy("component")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddling == 0

    pairs = dedup.q_dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    sa = assigned.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    sb = assigned.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    leaked = pairs.join(sa, "doc_a").join(sb, "doc_b").filter("sa != sb").count()
    assert leaked == 0

    # the coin still produces a usable split on the fixture
    sizes = {r.split: r.n for r in assigned.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sizes.get("train", 0) > sizes.get("val", 0)
    assert sizes.get("train", 0) > sizes.get("test", 0)
    assigned.unpersist()


# --- prefix-filtered exact Jaccard join (All-Pairs / PPJoin family) ----------


def test_prefix_join_exact_vs_bruteforce(spark, sf_dir):
    """The prefix filter is LOSSLESS: on the real fixture the prefix-join
    pair set must equal the exact uncapped inverted-index computation at
    the same threshold — identical (doc_a, doc_b) keys AND identical
    rounded scores. This is the lemma the plan's candidate pruning rests
    on, checked end-to-end."""
    from pyspark.sql import functions as F

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.q_dedup_jaccard_prefix(spark, sf_dir).collect()
    }
    jac = F.round(
        F.try_divide(F.col("c"), F.col("na") + F.col("nb") - F.col("c")), 4
    )
    want = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in (
            dedup._ngram_common(spark, sf_dir, max_posting_df=1 << 40)
            .select("doc_a", "doc_b", jac.alias("jaccard"))
            .filter(F.col("jaccard") >= dedup.PREFIX_JACCARD_T)
        ).collect()
    }
    assert got == want
    assert len(got) > 0  # fixture has dedup-grade near-dups; non-vacuous


def test_prefix_join_boundary_docs(spark, tmp_path):
    """Boundary shapes: a doc with exactly one shingle (prefix length
    formula bottoms out at 1), an identical twin (jaccard 1.0), a
    non-qualifying sibling, and stop-phrase-only overlap (0.5 < 0.7)
    that the prefix index must still score correctly as absent."""
    prefix = "terms of service apply to all"
    rows = [
        (1, "alpha beta gamma"),          # 1 shingle
        (2, "alpha beta gamma"),          # identical twin of 1
        (3, "alpha beta delta"),          # shares no full 3-gram with 1/2
        (10, f"{prefix} tail10 end10"),   # stop-phrase family: pairwise 0.5
        (11, f"{prefix} tail11 end11"),
    ]
    path = _write_docs(tmp_path, rows)
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.q_dedup_jaccard_prefix(spark, path).collect()
    }
    assert got == {(1, 2): 1.0}


def test_incremental_prefix_exact_vs_bruteforce(spark, sf_dir):
    """The batch-probe variant must find exactly the cross-set pairs the
    full uncapped computation finds at the same threshold — no
    registry-x-registry pairs, no misses (cross-set prefix lemma under
    the shared registry-df order)."""
    from pyspark.sql import functions as F

    got = {
        (r.batch_doc, r.registry_doc): r.jaccard
        for r in dedup.q_dedup_incremental_prefix(spark, sf_dir).collect()
    }
    assert all(a % 3 == 0 and b % 3 != 0 for a, b in got)
    jac = F.round(
        F.try_divide(F.col("c"), F.col("na") + F.col("nb") - F.col("c")), 4
    )
    full = (
        dedup._ngram_common(spark, sf_dir, max_posting_df=1 << 40)
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= dedup.PREFIX_JACCARD_T)
    ).collect()
    want = {}
    for r in full:
        sides = {r.doc_a % 3 == 0, r.doc_b % 3 == 0}
        if sides == {True, False}:  # exactly one side in the batch
            b, reg = (r.doc_a, r.doc_b) if r.doc_a % 3 == 0 else (r.doc_b, r.doc_a)
            want[(b, reg)] = r.jaccard
    assert got == want
    assert len(got) > 0


# --- winnowing fingerprints ---------------------------------------------------


def test_winnowing_guarantee_and_density(spark, tmp_path):
    """The winnowing theorem, end-to-end: any exact shared substring of
    >= K+W-1 chars MUST produce a shared fingerprint in both docs; docs
    with no long shared span stay clean; selected density is near the
    expected 2/(W+1)."""
    copied = "the quick brown fox jumps over the lazy dog tonight"  # 52 chars
    rows = [
        (1, f"unique preamble one {copied} unique tail alpha"),
        (2, f"completely different opening text {copied} other ending beta"),
        (3, "this document shares nothing with the others at all here"),
    ]
    path = _write_docs(tmp_path, rows)
    got = {r.doc_id: r for r in dedup.q_dedup_winnowing(spark, path).collect()}
    assert got[1].n_dup_fingerprints >= 1
    assert got[2].n_dup_fingerprints >= 1
    assert got[3].n_dup_fingerprints == 0 and got[3].dup_frac == 0.0
    # density: fingerprints per k-gram position ~ 2/(W+1), loose band
    for doc_id, text in rows:
        n_pos = len(text) - dedup.WINNOW_K + 1
        density = got[doc_id].n_fingerprints / n_pos
        assert 0.05 < density < 0.8
