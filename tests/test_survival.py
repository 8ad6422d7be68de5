"""Kaplan-Meier invariants the value oracle can't state directly:
monotonicity, risk-set accounting, and censoring semantics on a
hand-built cohort with a known curve."""

from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.survival import _km_curve


def _write_orders(spark, tmp_path, rows):
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "o_custkey long, o_orderdate timestamp"
    ).write.parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        [(c, "SEG") for c, _ in {(r[0], None) for r in rows}],
        "c_custkey long, c_mktsegment string",
    ).distinct().write.parquet(f"{sf}/customer.parquet")
    return sf


def test_km_hand_computed_cohort(spark, tmp_path):
    """4 customers: repeats at day 2 and day 5, one censored at the
    horizon (day 10), one single-order censored at 0...; verify the
    product-limit values by hand."""
    import datetime as dt

    d = lambda day: dt.datetime(2024, 1, 1) + dt.timedelta(days=day)
    rows = [
        # cust 1: first day0, second day2  -> event at 2
        (1, d(0)), (1, d(2)),
        # cust 2: first day0, second day5  -> event at 5
        (2, d(0)), (2, d(5)),
        # cust 3: one order day0           -> censored at horizon-0 = 10
        (3, d(0)),
        # cust 4: first day4, never again  -> censored at 10-4 = 6
        (4, d(4)),
    ]
    # horizon = max order date = day 5?  No: cust 2's second order (day 5)
    # is the max, so censor durations are 5-0=5 and 5-4=1.
    sf = _write_orders(spark, tmp_path, rows)
    curve = {r.dur_days: r for r in _km_curve(spark, sf).collect()}
    # grains: 1 (cust4 censored), 2 (cust1 event), 5 (cust2 event + cust3 censored)
    assert set(curve) == {1, 2, 5}
    assert (curve[1].events, curve[1].censored, curve[1].at_risk) == (0, 1, 4)
    assert curve[1].survival == 1.0  # censoring alone never drops S
    assert (curve[2].events, curve[2].at_risk) == (1, 3)
    assert abs(curve[2].survival - (1 - 1 / 3)) < 1e-6  # survival is round(,6)
    # at day 5: risk set is {cust2, cust3}; cust2 events, cust3 censors
    assert (curve[5].events, curve[5].censored, curve[5].at_risk) == (1, 1, 2)
    assert abs(curve[5].survival - (2 / 3) * (1 - 1 / 2)) < 1e-6  # survival is round(,6)


def test_km_invariants_on_fixture(spark, sf_dir):
    rows = _km_curve(spark, sf_dir).orderBy("segment", "dur_days").collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r.segment, []).append(r)
    for seg, seq in by_seg.items():
        # survival non-increasing, at_risk strictly decreasing, and the
        # risk set drains exactly by events+censored
        for a, b in zip(seq, seq[1:]):
            assert b.survival <= a.survival + 1e-12, seg
            assert b.at_risk == a.at_risk - a.events - a.censored, seg
        first = seq[0]
        assert first.at_risk == sum(r.events + r.censored for r in seq), seg
