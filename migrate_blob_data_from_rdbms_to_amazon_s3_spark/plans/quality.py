"""Data-quality / pipeline-maintenance operators: column profiling,
snapshot diffing (CDC-style), and contribution-share filters.

These are the operational queries a migration pipeline (the reference's
whole domain) runs around the data movement itself: profile the source,
diff two snapshots to find what changed, find the heavy hitters.
"""

from __future__ import annotations

from pyspark.sql import Window as _W
from pyspark.sql import functions as F

from ..sources.tables import load_table as _t


def q_profile_orders(spark, sf_dir):
    """Column profile in ONE pass (single partial+final aggregate, no
    per-column scans): null counts, distinct, min/max, mean."""
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("int")).alias("null_custkey"),
        F.countDistinct("o_custkey").alias("distinct_custkey"),
        F.countDistinct("o_orderstatus").alias("distinct_status"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("min_date"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("max_date"),
    )


def _snapshots(spark, sf_dir):
    """Two deterministic orders snapshots (old = orders minus a key slice
    with some prices shifted) — derived so the oracle can rebuild them.
    Shared by snapshot_diff and scd2_orders."""
    new = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    old = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 11 != 0)  # rows "inserted" since old
        .select(
            "o_orderkey",
            # every 7th key's price "changed" since the old snapshot
            F.when(
                F.col("o_orderkey") % 7 == 0, F.round(F.col("o_totalprice") + 1.5, 2)
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )
    # rows "deleted" since old: present in old only
    new = new.filter(F.col("o_orderkey") % 13 != 0)
    return old, new


def q_snapshot_diff(spark, sf_dir):
    """CDC-style diff of two table snapshots. Full-outer join on the PK
    classifies every key as inserted / deleted / updated / unchanged; one
    shuffle.

    At 100 TB this is the reconciliation pass of the migration pipeline
    (validate_migration's big sibling): hash-partition both snapshots on
    the PK and the diff never materializes matched-unchanged rows."""
    old, new = _snapshots(spark, sf_dir)
    j = old.alias("o").join(
        new.alias("n"), F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer"
    )
    status = (
        F.when(F.col("o.o_orderkey").isNull(), F.lit("inserted"))
        .when(F.col("n.o_orderkey").isNull(), F.lit("deleted"))
        .when(F.col("o.o_totalprice") != F.col("n.o_totalprice"), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(status.alias("change"))
        .groupBy("change")
        .agg(F.count("*").alias("n_keys"))
    )


def q11_top_suppliers_by_share(spark, sf_dir):
    """TPC-H Q11 shape: suppliers whose revenue share exceeds a global
    fraction — grouped agg HAVING > scalar subquery over the same fact.
    Catalyst computes the total once (scalar subquery, broadcast as a
    literal); the fact shuffles once."""
    li = _t(spark, sf_dir, "lineitem")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    per_supp = li.groupBy("l_suppkey").agg(F.round(rev, 2).alias("supp_revenue"))
    total = li.agg(rev.alias("t"))
    return (
        per_supp.crossJoin(F.broadcast(total))
        .filter(F.col("supp_revenue") > 0.0015 * F.col("t"))
        .select("l_suppkey", "supp_revenue")
    )


def q_dataset_split(spark, sf_dir):
    """Deterministic train/val/test split (80/10/10) by hashing the
    document key — reproducible across runs, engines, and cluster sizes
    (no RNG, no sampleBy), the property a training pipeline needs so
    examples never migrate between splits. Report: per-(split, lang)
    counts — the stratification audit."""
    docs = _t(spark, sf_dir, "documents")
    bucket = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
    )


def q_data_mix_audit(spark, sf_dir):
    """Data-mixing audit: tokens and documents per (source, lang) with
    each cell's share of the total token mass — the table that sets (and
    later verifies) corpus mixing weights. One combiner-friendly shuffle
    to the (source, lang) grain; the global total re-aggregates the
    already-aggregated (tiny) mix table and broadcasts as a 1-row
    crossJoin (same shape as q11's scalar total — an unpartitioned
    window here would be harmless post-agg but single-partitions the
    mix table and spams WindowExec warnings)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    mix = (
        docs.select("source", "lang", toks.alias("n_toks"))
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


def q_scd2_orders(spark, sf_dir):
    """SCD Type-2 dimension build from two CDC snapshots: one row per
    (key, version) with version number and is_current — the warehouse
    pattern that turns keyed mutations into an immutable history table
    (the 100 TB-native answer to the reference's in-place UPDATE,
    order.js:707-718). One full-outer join on the PK, then each change
    class emits its version rows:

      unchanged → (v1, current)           inserted → (v1, current)
      deleted   → (v1, closed)            updated  → (v1, closed) + (v2, current)

    At scale this is the same single-shuffle plan as snapshot_diff; the
    updated keys' two rows come from one flatMap-shaped select over the
    joined row, never a second pass."""
    old, new = _snapshots(spark, sf_dir)
    j = old.alias("o").join(
        new.alias("n"), F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer"
    )
    o_key, n_key = F.col("o.o_orderkey"), F.col("n.o_orderkey")
    o_val, n_val = F.col("o.o_totalprice"), F.col("n.o_totalprice")
    # struct array per change class, exploded to (key, value, version, is_current)
    rows = (
        F.when(o_key.isNull(), F.array(F.struct(n_val.alias("v"), F.lit(1).alias("ver"), F.lit(True).alias("cur"))))
        .when(n_key.isNull(), F.array(F.struct(o_val.alias("v"), F.lit(1).alias("ver"), F.lit(False).alias("cur"))))
        .when(
            o_val != n_val,
            F.array(
                F.struct(o_val.alias("v"), F.lit(1).alias("ver"), F.lit(False).alias("cur")),
                F.struct(n_val.alias("v"), F.lit(2).alias("ver"), F.lit(True).alias("cur")),
            ),
        )
        .otherwise(F.array(F.struct(o_val.alias("v"), F.lit(1).alias("ver"), F.lit(True).alias("cur"))))
    )
    return (
        j.select(F.coalesce(o_key, n_key).alias("o_orderkey"), F.explode(rows).alias("r"))
        .select(
            "o_orderkey",
            F.col("r.v").alias("o_totalprice"),
            F.col("r.ver").alias("version"),
            F.col("r.cur").alias("is_current"),
        )
    )


def q_corpus_clean_funnel(spark, sf_dir):
    """The corpus-cleaning FUNNEL — the whole training-data pipeline as
    one composed plan: quality filter → repetition filter → exact dedup →
    benchmark decontamination, reported as cumulative survivor counts
    over the non-benchmark corpus. Composes the engine's own flag
    builders (text.quality_flag, text.repetition_flag — the exact
    predicates q_quality_score / q_repetition_filter expose) over ONE
    shared token barrier, plus exact-dedup canonicalization and
    contamination.q_decontaminate_ngram; the funnel is the cumulative
    AND. One token pass + one shingle pass over the corpus — not one
    scan per stage."""
    from pyspark.sql import Window

    from . import contamination as CM
    from . import text as TX

    src = _t(spark, sf_dir, "documents").select("doc_id", "source")
    base = (
        TX._docs_with_toks(spark, sf_dir)
        .join(src, "doc_id")
        .filter(F.col("source") != CM.BENCH_SOURCE)
    )
    w = Window.partitionBy("text_hash")
    flags = base.select(
        "doc_id",
        TX.quality_flag().alias("q"),
        TX.repetition_flag().alias("r"),
        F.md5(F.encode("text", "UTF-8")).alias("text_hash"),
    ).withColumn("u", F.col("doc_id") == F.min("doc_id").over(w))
    cont = CM.q_decontaminate_ngram(spark, sf_dir).select(
        "doc_id", F.lit(True).alias("contaminated")
    )
    flags = flags.join(cont, "doc_id", "left")
    q = F.col("q")
    r = F.col("r")
    u = F.col("u")
    c = F.coalesce(F.col("contaminated"), F.lit(False))
    return flags.agg(
        F.count("*").alias("n_total"),
        F.sum(q.cast("long")).alias("n_quality"),
        F.sum((q & r).cast("long")).alias("n_nonrepetitive"),
        F.sum((q & r & u).cast("long")).alias("n_unique"),
        F.sum((q & r & u & ~c).cast("long")).alias("n_clean"),
    )


# every FK edge of the fixture schema: (name, fact table, fk col, dim table, pk col)
_FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def q_referential_integrity_audit(spark, sf_dir):
    """Orphan-FK audit over every foreign-key edge of the schema — the
    pipeline-health report run before any training join (an orphan fact
    row silently vanishes from every inner join downstream). One left-anti
    join per edge (fact side streams, Catalyst picks broadcast for the
    small dims and shuffle for the big ones — never forced, so the plan
    survives a 100 TB orders dim), counts unioned into one report. NULL
    FKs count as orphans too: anti-join keeps null-keyed rows, matching
    the 'row lost by the inner join' definition the audit exists for."""
    out = None
    for name, fact, fk, dim, pk in _FK_EDGES:
        orphans = (
            _t(spark, sf_dir, fact)
            .select(F.col(fk).alias("k"))
            .join(
                _t(spark, sf_dir, dim).select(F.col(pk).alias("k")),
                "k",
                "left_anti",
            )
            .agg(F.count("*").alias("n_orphans"))
            .select(F.lit(name).alias("fk_edge"), "n_orphans")
        )
        out = orphans if out is None else out.unionByName(orphans)
    return out


def q_incremental_pointer_latest(spark, sf_dir):
    """The incremental-migration consumer view, oracle-shaped: two
    deterministic pointer runs derived from orders (run 0 = the
    backfill at cursor o_orderkey; run 1 = every 7th key re-migrated at
    a later cursor with an updated description — the shape
    operators/incremental_migration.migrate_increment writes), merged
    by the operator's own ``keep_latest`` transform (row_number over
    (cursor desc, run_id desc) per key — one shuffle on the PK). A
    value match proves a later increment's pointer row shadows the
    backfill row without rewriting run-0 output."""
    from ..operators.incremental_migration import keep_latest

    orders = _t(spark, sf_dir, "orders")
    run0 = orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderpriority").alias("description"),
        F.col("o_orderkey").alias("cursor"),
        F.lit(0).alias("run_id"),
    )
    run1 = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        F.col("o_orderkey").alias("order_id"),
        F.concat(F.col("o_orderpriority"), F.lit(" (v2)")).alias("description"),
        (F.col("o_orderkey") + F.lit(1000000)).alias("cursor"),
        F.lit(1).alias("run_id"),
    )
    return keep_latest(run0.unionByName(run1), pk="order_id")


K_ANON_THRESHOLD = 5
# balance generalized to 1000-unit bands on exact integer cents (the
# round(x*100) grain idiom); floor on DOUBLE, not integer div, so
# negative balances band correctly in both engines (floor, not trunc)
_BAND = "CAST(floor(CAST(round(c_acctbal * 100) AS DOUBLE) / 100000) AS BIGINT)"


def q_k_anonymity_audit(spark, sf_dir):
    """k-anonymity audit (Sweeney 2002) over the quasi-identifier tuple
    (nation, market segment, 1000-unit balance band): the k-distribution
    histogram — for each equivalence-class size k, how many classes and
    rows sit at that k, flagged at_risk when k < K_ANON_THRESHOLD. This
    is the re-identification screen a pipeline runs before releasing
    training data joined with user attributes (complements text_pii_scrub,
    which handles free-text identifiers). Two aggregations: QI-grain
    (the only data-sized shuffle) then the tiny k-domain contraction —
    no windows, no pair joins; 100 TB-safe by construction."""
    c = _t(spark, sf_dir, "customer")
    sizes = (
        c.select(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.expr(_BAND).alias("balance_band"),
        )
        .groupBy("nation", "segment", "balance_band")
        .agg(F.count("*").alias("k"))
    )
    return (
        sizes.groupBy("k")
        .agg(F.count("*").alias("n_groups"))
        .select(
            "k",
            "n_groups",
            (F.col("k") * F.col("n_groups")).alias("n_rows"),
            (F.col("k") < K_ANON_THRESHOLD).alias("at_risk"),
        )
        .orderBy("k")
    )


L_DIVERSITY_THRESHOLD = 3


def q_l_diversity_audit(spark, sf_dir):
    """l-diversity audit (Machanavajjhala 2007), the attribute-disclosure
    complement of ``q_k_anonymity_audit``: k-anonymity bounds
    RE-IDENTIFICATION, but a class whose members all share one sensitive
    value still leaks the attribute. QI = (nation, segment); sensitive =
    the 1000-unit balance band. Per distinct-sensitive-count l: how many
    QI classes and rows sit at that l, the mean within-class sensitive
    entropy (entropy l-diversity needs ≥ ln(l)), and the at_risk flag for
    l < L_DIVERSITY_THRESHOLD. Three contractions — (QI × band) grain,
    QI grain, l histogram — each strictly smaller; no windows, no pair
    joins."""
    c = _t(spark, sf_dir, "customer")
    cell = (
        c.select(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.expr(_BAND).alias("band"),
        )
        .groupBy("nation", "segment", "band")
        .agg(F.count("*").alias("cnt"))
    )
    p = F.col("cnt") / F.col("k_rows")
    grp = (
        cell.withColumn(
            "k_rows", F.sum("cnt").over(_W.partitionBy("nation", "segment"))
        )
        .groupBy("nation", "segment")
        .agg(
            F.countDistinct("band").alias("l"),
            F.max("k_rows").alias("k_rows"),
            (-F.sum(p * F.log(p))).alias("entropy"),
        )
    )
    return (
        grp.groupBy("l")
        .agg(
            F.count("*").alias("n_groups"),
            F.sum("k_rows").alias("n_rows"),
            F.round(F.avg("entropy"), 6).alias("avg_entropy"),
        )
        .select(
            "l",
            "n_groups",
            "n_rows",
            "avg_entropy",
            (F.col("l") < L_DIVERSITY_THRESHOLD).alias("at_risk"),
        )
        .orderBy("l")
    )


DP_EPSILON = 1.0  # Laplace scale b = sensitivity/epsilon = 1 for counts


def q_dp_noisy_counts(spark, sf_dir):
    """Laplace-mechanism calibration audit (Dwork 2006): per-nation
    customer counts with seeded Laplace(1/ε) noise — the ε-DP release
    shape for a count query (sensitivity 1). The noise draw is a
    DETERMINISTIC md5 coin per group (inverse-CDF transform of the
    60-bit uniform), so the mechanism is testable cross-engine and
    replayable; a production release would swap the salt for entropy.
    True counts ride along because this is the calibration AUDIT (does
    the noise distribution match its scale), not the release itself.
    One keyed contraction; noise math is per-group constant work."""
    c = _t(spark, sf_dir, "customer")
    counts = c.groupBy(F.col("c_nationkey").alias("nation")).agg(
        F.count("*").alias("n_true")
    )
    u = (
        F.expr(
            "CAST(conv(substring(md5(concat('dp-', CAST(nation AS STRING))), 1, 15), "
            "16, 10) AS BIGINT)"
        )
        + F.lit(0.5)
    ) / F.lit(float(2**60))
    centered = u - F.lit(0.5)
    noise = (
        -F.signum(centered)
        * F.lit(1.0 / DP_EPSILON)
        * F.log(F.lit(1.0) - 2 * F.abs(centered))
    )
    return counts.select(
        "nation",
        "n_true",
        F.round(noise, 4).alias("noise"),
        F.round(F.col("n_true") + noise, 4).alias("n_noisy"),
        F.lit(DP_EPSILON).alias("epsilon"),
    )


QUERIES = {
    "k_anonymity_audit": q_k_anonymity_audit,
    "l_diversity_audit": q_l_diversity_audit,
    "dp_noisy_counts": q_dp_noisy_counts,
    "incremental_pointer_latest": q_incremental_pointer_latest,
    "referential_integrity_audit": q_referential_integrity_audit,
    "profile_orders": q_profile_orders,
    "dataset_split": q_dataset_split,
    "data_mix_audit": q_data_mix_audit,
    "corpus_clean_funnel": q_corpus_clean_funnel,
    "snapshot_diff": q_snapshot_diff,
    "scd2_orders": q_scd2_orders,
    "q11_top_suppliers_by_share": q11_top_suppliers_by_share,
}

ORACLES = {
    "dp_noisy_counts": f"""
        WITH counts AS (
            SELECT c_nationkey AS nation, COUNT(*) AS n_true
            FROM customer GROUP BY 1
        ),
        coin AS (
            SELECT nation, n_true,
                   (CAST('0x' || substr(md5('dp-' || CAST(nation AS VARCHAR)),
                                        1, 15) AS BIGINT) + 0.5)
                   / CAST({2**60} AS DOUBLE) - 0.5 AS centered
            FROM counts
        )
        SELECT nation, CAST(n_true AS BIGINT) AS n_true,
               ROUND(-SIGN(centered) * {1.0 / DP_EPSILON}
                     * LN(1.0 - 2 * ABS(centered)), 4) AS noise,
               ROUND(n_true + (-SIGN(centered) * {1.0 / DP_EPSILON}
                     * LN(1.0 - 2 * ABS(centered))), 4) AS n_noisy,
               CAST({DP_EPSILON} AS DOUBLE) AS epsilon
        FROM coin
    """,
    "l_diversity_audit": f"""
        WITH cell AS (
            SELECT c_nationkey AS nation, c_mktsegment AS segment,
                   {_BAND.replace("c_acctbal", "c_acctbal::DOUBLE")} AS band,
                   COUNT(*) AS cnt
            FROM customer GROUP BY 1, 2, 3
        ),
        cell2 AS (
            SELECT *, SUM(cnt) OVER (PARTITION BY nation, segment) AS k_rows
            FROM cell
        ),
        grp AS (
            SELECT nation, segment,
                   COUNT(DISTINCT band) AS l,
                   MAX(k_rows) AS k_rows,
                   -SUM((cnt / CAST(k_rows AS DOUBLE))
                        * LN(cnt / CAST(k_rows AS DOUBLE))) AS entropy
            FROM cell2 GROUP BY 1, 2
        )
        SELECT CAST(l AS BIGINT) AS l,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(SUM(k_rows) AS BIGINT) AS n_rows,
               ROUND(AVG(entropy), 6) AS avg_entropy,
               l < {L_DIVERSITY_THRESHOLD} AS at_risk
        FROM grp GROUP BY l ORDER BY l
    """,
    "k_anonymity_audit": f"""
        WITH sizes AS (
            SELECT c_nationkey AS nation, c_mktsegment AS segment,
                   {_BAND.replace("c_acctbal", "c_acctbal::DOUBLE")} AS balance_band,
                   COUNT(*) AS k
            FROM customer
            GROUP BY 1, 2, 3
        )
        SELECT k, COUNT(*) AS n_groups, k * COUNT(*) AS n_rows,
               k < {K_ANON_THRESHOLD} AS at_risk
        FROM sizes GROUP BY k ORDER BY k
    """,
    "incremental_pointer_latest": """
        WITH runs AS (
            SELECT o_orderkey AS order_id, o_orderpriority AS description,
                   o_orderkey AS cursor, 0 AS run_id
            FROM orders
            UNION ALL
            SELECT o_orderkey, o_orderpriority || ' (v2)',
                   o_orderkey + 1000000, 1
            FROM orders WHERE o_orderkey % 7 = 0
        )
        SELECT order_id, description, cursor, run_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY order_id
                ORDER BY cursor DESC, run_id DESC) AS rn
            FROM runs
        ) WHERE rn = 1
    """,
    "referential_integrity_audit": "\n        UNION ALL\n".join(
        f"""
        SELECT '{name}' AS fk_edge, COUNT(*) AS n_orphans
        FROM {fact} ANTI JOIN {dim} ON {fact}.{fk} = {dim}.{pk}"""
        for name, fact, fk, dim, pk in _FK_EDGES
    ),
    "data_mix_audit": r"""
        WITH mix AS (
            SELECT source, lang, COUNT(*) AS n_docs,
                   CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
                     AS n_tokens
            FROM documents
            GROUP BY 1, 2
        )
        SELECT source, lang, n_docs, n_tokens,
               ROUND(n_tokens / SUM(n_tokens) OVER (), 6) AS token_share
        FROM mix
    """,
    "dataset_split": """
        SELECT CASE WHEN b < 80 THEN 'train'
                    WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split,
               lang, COUNT(*) AS n_docs
        FROM (
            SELECT lang,
                   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS b
            FROM documents
        )
        GROUP BY 1, 2
    """,
    "profile_orders": """
        SELECT COUNT(*) AS n_rows,
               SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS null_custkey,
               COUNT(DISTINCT o_custkey) AS distinct_custkey,
               COUNT(DISTINCT o_orderstatus) AS distinct_status,
               ROUND(MIN(o_totalprice), 2) AS min_price,
               ROUND(MAX(o_totalprice), 2) AS max_price,
               ROUND(AVG(o_totalprice), 4) AS avg_price,
               strftime(MIN(o_orderdate), '%Y-%m-%d') AS min_date,
               strftime(MAX(o_orderdate), '%Y-%m-%d') AS max_date
        FROM orders
    """,
    "snapshot_diff": """
        WITH old AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0
                        THEN ROUND(o_totalprice + 1.5, 2)
                        ELSE o_totalprice END AS o_totalprice
            FROM orders WHERE o_orderkey % 11 != 0
        ),
        new AS (
            SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 13 != 0
        )
        SELECT change, COUNT(*) AS n_keys FROM (
            SELECT CASE
                WHEN o.o_orderkey IS NULL THEN 'inserted'
                WHEN n.o_orderkey IS NULL THEN 'deleted'
                WHEN o.o_totalprice != n.o_totalprice THEN 'updated'
                ELSE 'unchanged' END AS change
            FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
        ) GROUP BY change
    """,
    "scd2_orders": """
        WITH old AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0
                        THEN ROUND(o_totalprice + 1.5, 2)
                        ELSE o_totalprice END AS o_totalprice
            FROM orders WHERE o_orderkey % 11 != 0
        ),
        new AS (
            SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 13 != 0
        ),
        j AS (
            SELECT o.o_orderkey AS ok, n.o_orderkey AS nk,
                   o.o_totalprice AS ov, n.o_totalprice AS nv
            FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
        )
        SELECT nk AS o_orderkey, nv AS o_totalprice, 1 AS version,
               TRUE AS is_current
        FROM j WHERE ok IS NULL
        UNION ALL
        SELECT ok, ov, 1, FALSE FROM j WHERE nk IS NULL
        UNION ALL
        SELECT ok, ov, 1, FALSE FROM j
        WHERE ok IS NOT NULL AND nk IS NOT NULL AND ov != nv
        UNION ALL
        SELECT ok, nv, 2, TRUE FROM j
        WHERE ok IS NOT NULL AND nk IS NOT NULL AND ov != nv
        UNION ALL
        SELECT ok, ov, 1, TRUE FROM j
        WHERE ok IS NOT NULL AND nk IS NOT NULL AND ov = nv
    """,
    "q11_top_suppliers_by_share": """
        SELECT l_suppkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS supp_revenue
        FROM lineitem
        GROUP BY l_suppkey
        HAVING ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) >
               0.0015 * (SELECT SUM(l_extendedprice * (1 - l_discount)) FROM lineitem)
    """,
}


def _funnel_oracle() -> str:
    """Assembled from the same flag expressions the per-stage oracles use
    (text_quality_score, text_repetition_filter, dedup_exact,
    decontaminate_ngram), cumulative-AND'd over the non-benchmark corpus."""
    from . import contamination as CM
    from . import text as TX

    sw = TX._SW_SQL
    return rf"""
        WITH corpus AS (
            SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks
            FROM documents WHERE source != '{CM.BENCH_SOURCE}'
        ),
        qf AS (
            SELECT doc_id,
                   (len(toks) >= 5
                    AND len(list_filter(toks, t -> t IN {sw})) / len(toks) > 0.01
                    AND length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                        / length(text) > 0.5) AS q
            FROM corpus
        ),
        rf AS (
            SELECT doc_id,
                   (dup < {TX.REP_MAX_DUP_TOKEN_FRAC}
                    AND topb < {TX.REP_MAX_TOP_BIGRAM_FRAC}) AS r
            FROM (
                SELECT doc_id,
                       ROUND(1.0 - len(list_distinct(toks)) / len(toks), 4) AS dup,
                       CASE WHEN len(bg) = 0 THEN NULL
                            ELSE ROUND(list_max(list_transform(list_distinct(bg),
                                     x -> len(list_filter(bg, y -> y = x))))
                                 / CAST(len(bg) AS DOUBLE), 4)
                       END AS topb
                FROM (
                    SELECT doc_id, toks,
                           CASE WHEN len(toks) >= 2 THEN
                             list_transform(generate_series(1, len(toks) - 1),
                                            i -> toks[i] || ' ' || toks[i+1])
                           ELSE [] END AS bg
                    FROM corpus
                )
            )
        ),
        uf AS (
            SELECT doc_id,
                   doc_id = MIN(doc_id) OVER (PARTITION BY md5(text)) AS u
            FROM corpus
        ),
        cont AS (
            SELECT doc_id FROM ({CM.ORACLES['decontaminate_ngram']})
        ),
        flags AS (
            SELECT corpus.doc_id, q, r, u,
                   (cont.doc_id IS NOT NULL) AS c
            FROM corpus
            JOIN qf USING (doc_id)
            JOIN rf USING (doc_id)
            JOIN uf USING (doc_id)
            LEFT JOIN cont ON corpus.doc_id = cont.doc_id
        )
        SELECT COUNT(*) AS n_total,
               SUM(CASE WHEN q THEN 1 ELSE 0 END) AS n_quality,
               SUM(CASE WHEN q AND r THEN 1 ELSE 0 END) AS n_nonrepetitive,
               SUM(CASE WHEN q AND r AND u THEN 1 ELSE 0 END) AS n_unique,
               SUM(CASE WHEN q AND r AND u AND NOT c THEN 1 ELSE 0 END) AS n_clean
        FROM flags
    """


ORACLES["corpus_clean_funnel"] = _funnel_oracle()
