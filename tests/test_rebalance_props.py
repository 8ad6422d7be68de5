"""Property guard on the consistent-hashing audit: HRW movement on a
one-shard scale-out must sit near the theoretical 1/(N+1), while modulo
placement reshuffles nearly everything (N/(N+1)) — the whole point the
operator demonstrates. Tolerances are loose (finite keys), but the two
regimes must stay far apart."""

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.profiling import (
    CH_BUCKETS,
    q_consistent_hash_rebalance,
)


def test_hrw_moves_an_order_of_magnitude_fewer_keys(spark, sf_dir):
    row = q_consistent_hash_rebalance(spark, sf_dir).collect()[0]
    ideal_hrw = 1 / (CH_BUCKETS + 1)
    ideal_mod = CH_BUCKETS / (CH_BUCKETS + 1)
    assert row.n_keys > 100
    assert abs(row.moved_hrw_share - ideal_hrw) < 0.06
    assert abs(row.moved_mod_share - ideal_mod) < 0.06
    assert row.moved_mod_share > 4 * row.moved_hrw_share
