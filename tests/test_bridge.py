"""Bridge fallback (D1, app_bridge.js:1-17) and linkage join (D2)."""

from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators import bridge


def test_bridge_precedence(spark):
    new = spark.createDataFrame(
        [("1", "new-one", "p"), ("2", "new-two", "p")],
        "order_id string, description string, s3_prefix string",
    )
    legacy = spark.createDataFrame(
        [("2", "old-two", "p"), ("3", "old-three", "p")],
        "order_id string, description string, s3_prefix string",
    )
    out = {r.order_id: r.description for r in bridge.bridge_coalesce(new, legacy, "order_id").collect()}
    # new wins on overlap; legacy-only falls through; error-if-neither = absent
    assert out == {"1": "new-one", "2": "new-two", "3": "old-three"}


def test_object_linkage(spark):
    rows = spark.createDataFrame(
        [("a", "d", "image.png")], "order_id string, description string, s3_prefix string"
    )
    objects = spark.createDataFrame(
        [("orders/a/image.png", 123), ("orders/zz/image.png", 1)],
        "object_key string, size_bytes int",
    )
    out = bridge.object_linkage(rows, objects, "order_id", "s3_prefix").collect()
    assert len(out) == 1 and out[0].size_bytes == 123
    # left join keeps pointer rows with missing objects visible
    out2 = bridge.object_linkage(rows, objects, "order_id", "s3_prefix", how="left").collect()
    assert len(out2) == 1
