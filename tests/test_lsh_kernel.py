"""Bit-identity contract of the numpy LSH signature kernel.

`_nd_sigs` computes plane dots in an Arrow `mapInPandas` kernel; the
DuckDB oracle twins recompute them as unrolled SQL sums. The whole
index rests on those two never disagreeing — a one-ulp difference at a
bucket boundary flips a sign bit, changing candidate sets. The kernel
guarantees it by accumulating in EXACT left-fold order; this test pins
that contract against Spark's own SQL fold (`aggregate(zip_with(...))`,
the pre-round-7 implementation) on adversarial random vectors, and
checks the boundary-bit ranking (|dot| asc, bit asc, stable ties) the
query-directed probes derive from the same dots."""

import random

from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans import similarity as S


def _random_emb(spark, n, seed):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        # adversarial: tiny magnitudes drive plane dots toward zero,
        # where a fold-order ulp would flip a bucket sign
        v = [
            float(rng.choice([0.0, 1e-7, -1e-7, 0.25, -0.25, 3.5, -3.5]))
            for _ in range(S.EMB_DIM)
        ]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _sql_reference(emb):
    """The pre-kernel implementation: gated HOF dots -> bucket/boundary
    SQL expressions. Shares every constant with the kernel."""
    dots = emb.crossJoin(S._nd_cfg(emb)).select(
        "vec_id",
        "nd_bits",
        "nd_tables",
        *[
            F.expr(S._nd_dots_spark_gated(t)).alias(f"d{t}")
            for t in range(S.ND_BANDS)
        ],
    )
    return dots.select(
        "vec_id",
        "nd_bits",
        "nd_tables",
        *[
            F.expr(
                f"CASE WHEN d{t} IS NULL THEN NULL "
                f"ELSE {S._nd_bucket_from_dots(f'd{t}')} END"
            ).alias(f"t{t}")
            for t in range(S.ND_BANDS)
        ],
        *[
            F.expr(
                f"CASE WHEN d{t} IS NULL THEN NULL "
                f"ELSE {S._nd_boundary_from_dots(f'd{t}')} END"
            ).alias(f"p{t}")
            for t in range(S.ND_BANDS)
        ],
    )


def _normalize(rows):
    out = {}
    for r in rows:
        d = r.asDict()
        out[d["vec_id"]] = {
            k: (list(v) if isinstance(v, (list, tuple)) else v)
            for k, v in d.items()
        }
    return out


def test_kernel_matches_sql_fold_bit_for_bit(spark):
    emb = _random_emb(spark, 300, seed=20260815)
    got = _normalize(S._nd_sigs(emb, ["vec_id"]).collect())
    ref = _normalize(_sql_reference(emb).collect())
    assert got == ref


def test_kernel_matches_sql_fold_at_widened_config(spark):
    """Force the widened region (nd_bits > 12, nd_tables = 16) without a
    20k-row fixture by narrowing the fill ladder: both implementations
    read the same module constants, so monkeypatching the bits ladder
    exercises bits 13-16 and tables 8-15 in BOTH paths."""
    orig = S._nd_bits_case
    S._nd_bits_case = lambda n_col: "(CASE WHEN 1 = 1 THEN 14 ELSE 14 END)"
    try:
        emb = _random_emb(spark, 200, seed=42)
        got = _normalize(S._nd_sigs(emb, ["vec_id"]).collect())
        ref = _normalize(_sql_reference(emb).collect())
    finally:
        S._nd_bits_case = orig
    assert got == ref
    some = next(iter(got.values()))
    assert some["nd_bits"] == 14 and some["nd_tables"] == 16
    assert some["t15"] is not None and len(some["p15"]) == S.ND_PROBE_K
