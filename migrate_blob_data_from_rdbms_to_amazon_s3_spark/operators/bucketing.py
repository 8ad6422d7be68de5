"""Bucketed tables: pre-shuffled storage for repeat co-located joins.

At 100 TB the dominant cost of fact-fact joins is the shuffle. Bucketing
pays that shuffle ONCE at write time: both tables are hash-partitioned
into the same number of buckets on the join key and saved as managed
tables; every later equi-join on that key reads bucket-aligned splits and
joins with NO exchange on either side (SortMergeJoin over pre-bucketed
scans). This is the Spark-native analog of the reference's RDS-side
"computation pushdown" (SURVEY §4): move the work to where the layout
already is.

Rules that make it work (asserted in tests/test_bucketing.py):
- same bucket count on both sides, bucket column == join key;
- ``spark.sql.sources.bucketing.enabled`` (default true);
- AQE leaves bucketed joins alone (no runtime re-shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 16, sort: bool = True
) -> None:
    """Persist `df` as a managed table bucketed (and optionally sorted)
    by `key`. Sorting within buckets lets SortMergeJoin skip its sort."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — shuffle-free."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
