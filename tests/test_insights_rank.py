"""Adversarial guards: the reconciliation audit must CATCH injected
corruption (not just pass on clean fixtures), and the distributed
global rank must survive heavy ties (many rows sharing a price, so
percentile cut-points repeat and buckets collapse)."""

import random

import pyarrow as pa
import pyarrow.parquet as pq

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.insights import (
    q_order_reconciliation_audit,
)
from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.profiling_stats import (
    q_distributed_global_rank,
)


def test_reconciliation_catches_injected_corruption(spark, tmp_path):
    # 50 consistent orders, 3 corrupted totals, 2 orders with no lineitems
    orders, lineitems = [], []
    for oid in range(50):
        total = 0.0
        for ln in range(1, 4):
            price, disc, tax = 100.0 + oid, 0.1, 0.2
            lineitems.append((oid, price, disc, tax))
            total += price * (1 - disc) * (1 + tax)
        orders.append((oid, round(total, 2)))
    for oid in (3, 17, 42):  # corrupt: stored total off by 50%
        orders[oid] = (oid, round(orders[oid][1] * 1.5, 2))
    orders += [(100, 500.0), (101, 600.0)]  # no lineitems at all
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
                "o_totalprice": pa.array([o[1] for o in orders], pa.float64()),
            }
        ),
        f"{tmp_path}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([l[0] for l in lineitems], pa.int64()),
                "l_extendedprice": pa.array([l[1] for l in lineitems], pa.float64()),
                "l_discount": pa.array([l[2] for l in lineitems], pa.float64()),
                "l_tax": pa.array([l[3] for l in lineitems], pa.float64()),
            }
        ),
        f"{tmp_path}/lineitem.parquet",
    )
    row = q_order_reconciliation_audit(spark, str(tmp_path)).collect()[0]
    assert row.n_orders == 52
    assert row.n_no_lineitems == 2
    assert row.n_mismatched == 3  # exactly the injected corruptions
    assert row.worst_rel_dev > 0.3


def test_distributed_rank_survives_heavy_ties(spark, tmp_path):
    rng = random.Random(11)
    # only 5 distinct prices over 500 rows: most percentile cut-points
    # repeat, most buckets collapse to a few survivors
    rows = [(i, float(rng.choice([10, 20, 20, 30, 40, 50]))) for i in range(500)]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
                "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
            }
        ),
        f"{tmp_path}/orders.parquet",
    )
    expect = [
        (rank + 1, key)
        for rank, (key, _) in enumerate(
            sorted(rows, key=lambda r: (-r[1], r[0]))[:500]
        )
    ]
    got = [
        (r.global_rank, r.o_orderkey)
        for r in q_distributed_global_rank(spark, str(tmp_path)).collect()
    ]
    assert got == expect
