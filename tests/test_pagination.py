"""Pagination invariants from the reference suite (order.test.js:130-240):
clamped offsets, defaulted limits, stable ordering, last-page behavior."""

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators import pagination as P


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def test_clamp_params_matrix():
    total = 100
    # (limit, offset) → (lim, off): mirrors the REST test matrix
    assert P.clamp_page_params(None, None, total) == (5, 0)
    assert P.clamp_page_params("3", "7", total) == (3, 7)
    assert P.clamp_page_params("9", "-4", total) == (5, 0)          # out-of-range → defaults
    assert P.clamp_page_params("1dscx", "1dscx", total) == (5, 0)   # non-numeric probe
    assert P.clamp_page_params(None, str(total * 10), total) == (5, total)  # huge → clamp to count


def test_offset_le_count_always():
    for off in [None, "0", "-5", "1000000", "1dscx"]:
        _, o = P.clamp_page_params(None, off, 42)
        assert 0 <= o <= 42


def test_page_stable_and_disjoint(spark, sf_dir):
    df = _orders(spark, sf_dir)
    p1 = [r.o_orderkey for r in P.page(df, "o_orderkey", 5, 0).collect()]
    p2 = [r.o_orderkey for r in P.page(df, "o_orderkey", 5, 5).collect()]
    assert p1 == sorted(p1) and p2 == sorted(p2)
    assert not set(p1) & set(p2)
    assert max(p1) < min(p2)


def test_keyset_equals_offset_paging(spark, sf_dir):
    df = _orders(spark, sf_dir)
    off = [r.o_orderkey for r in P.page(df, "o_orderkey", 5, 5).collect()]
    last_of_first = P.page(df, "o_orderkey", 5, 0).collect()[-1].o_orderkey
    ks = [r.o_orderkey for r in P.keyset_page(df, "o_orderkey", 5, after=last_of_first).collect()]
    assert off == ks


def test_empty_last_page(spark, sf_dir):
    df = _orders(spark, sf_dir)
    total = df.count()
    assert P.page(df, "o_orderkey", 5, total).count() == 0


def test_envelope(spark, sf_dir):
    df = _orders(spark, sf_dir)
    env = P.page_envelope(df, "o_orderkey", "3", "bogus")
    assert env["limit"] == 3 and env["offset"] == 0
    assert env["ordersCount"] == df.count()
    assert env["pages"] == 0  # limit < count → floor(limit/count) = 0
    assert env["orders"].count() == 3
