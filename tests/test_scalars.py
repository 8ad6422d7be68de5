"""Scalar-layer golden tests mirroring the reference suite's behavior
classes (SURVEY §5: trim semantics, blob round-trip, clamp rules)."""

from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.functions import scalars as S


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_trim_boundaries(spark):
    # test/order.test.js:357-388 — boundary at exactly 30 chars
    for n, expect_trim in [(0, False), (29, False), (30, False), (31, True), (120, True)]:
        s = "x" * n
        out = _one(spark, S.trim_description(F.lit(s)))
        if expect_trim:
            assert out == "x" * 24 + "(TRIM)"
            assert len(out) == 30
        else:
            assert out == s


def test_trim_marker_visible(spark):
    long = "The quick brown fox jumps over the lazy dog" * 3
    out = _one(spark, S.trim_description(F.lit(long)))
    assert out.endswith("(TRIM)") and out.startswith(long[:24])


def test_base64_roundtrip_including_empty(spark):
    # order_rdbms_blob.test.js:376-415 — byte-identical round trip;
    # empty blob = zero-length buffer (order_rdbms_blob.js:210)
    df = spark.createDataFrame([(b"",), (b"\x89PNG\r\n\x1a\n" + bytes(range(256)),)], "b binary")
    rows = df.select(
        S.blob_to_base64(S.base64_to_blob(S.blob_to_base64("b"))).alias("round"),
        S.blob_to_base64("b").alias("direct"),
    ).collect()
    for r in rows:
        assert r.round == r.direct
        assert r.direct is None or "\n" not in (r.direct or "")


def test_s3_key_no_leading_slash(spark):
    # pitfall documented at order.js:500-506
    out = _one(spark, S.s3_object_key(F.lit("abc"), F.lit("image.png")))
    assert out == "orders/abc/image.png"


def test_safe_int_nan_guard(spark):
    # order.js:70-84 — the suite's "1dscx" probe
    assert _one(spark, S.safe_int(F.lit("1dscx"), 5)) == 5
    assert _one(spark, S.safe_int(F.lit("7"), 5)) == 7
    assert _one(spark, S.safe_int(F.lit(None).cast("string"), 3)) == 3


def test_clamp_limit(spark):
    # only 0 < x < 5 accepted (order.js:70-77)
    for raw, want in [("3", 3), ("0", 5), ("5", 5), ("9", 5), ("-1", 5), ("junk", 5)]:
        assert _one(spark, S.clamp_limit(F.lit(raw))) == want


def test_pages_quirky_semantics(spark):
    # order.js:296 — pages = limit > count ? 0 : floor(limit/count)
    for lim, cnt, want in [(5, 3, 0), (5, 5, 1), (3, 15, 0), (5, 0, 0)]:
        got = _one(spark, S.pages_for(F.lit(lim), F.lit(cnt)))
        assert got == want, (lim, cnt, got)


def test_strip_arn(spark):
    assert _one(spark, S.strip_s3_arn(F.lit("arn:aws:s3:::my-bucket"))) == "my-bucket"
    assert _one(spark, S.strip_s3_arn(F.lit("my-bucket"))) == "my-bucket"
