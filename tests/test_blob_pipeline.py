"""End-to-end blob externalization: the reference's core migration as one
Spark job (SURVEY §7 M1.5), against the local object store."""

import pytest
from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators import blob_pipeline as BP
from migrate_blob_data_from_rdbms_to_amazon_s3_spark.sources.object_store import make_store

# the reference's blob fixture is a tiny PNG (order_rdbms_blob.test.js:10);
# we use real binary bytes including the empty blob (order_rdbms_blob.js:210)
BLOBS = [
    ("a", "first", b"\x89PNG\r\n\x1a\n" + bytes(range(64))),
    ("b", "second", b""),
    ("c", "third", b"\xff" * 1024),
]


@pytest.fixture()
def legacy(spark):
    return spark.createDataFrame(
        BLOBS, "order_id string, description string, order_blob binary"
    )


def test_externalize_validate_roundtrip(spark, legacy, tmp_path):
    url = f"file://{tmp_path}/store"
    manifest = BP.externalize_blobs(legacy, url)
    manifest.cache()
    assert manifest.count() == 3

    # objects exist and are byte-identical (the PNG round-trip contract)
    store = make_store(url)
    for oid, _, blob in BLOBS:
        assert store.get(f"orders/{oid}/image.png") == blob

    report = BP.validate_migration(legacy, manifest, url)
    assert report["n_rows"] == 3
    assert report["size_mismatches"] == 0
    assert report["md5_mismatches"] == 0
    assert report["missing_writes"] == 0
    assert report["missing_objects"] == 0


def test_pointer_table_shape(legacy):
    ptr = BP.pointer_table(legacy)
    assert ptr.columns == ["order_id", "description", "s3_prefix"]
    rows = {r.order_id: r.s3_prefix for r in ptr.collect()}
    assert rows == {"a": "image.png", "b": "image.png", "c": "image.png"}


def test_validation_detects_corruption(spark, legacy, tmp_path):
    url = f"file://{tmp_path}/store"
    manifest = BP.externalize_blobs(legacy, url)
    manifest.cache()
    manifest.count()
    make_store(url).put("orders/a/image.png", b"CORRUPTED")  # tamper post-write
    # sizes/md5 in the manifest still match the source; object content check
    # is the store-level concern — but a *deleted* object must be caught:
    make_store(url).delete("orders/c/image.png")
    report = BP.validate_migration(legacy, manifest, url)
    assert report["missing_objects"] == 1


def test_cascade_delete_s3_first(spark, legacy, tmp_path):
    url = f"file://{tmp_path}/store"
    BP.externalize_blobs(legacy, url).count()
    pointers = BP.pointer_table(legacy)
    keys = spark.createDataFrame([("a",), ("nope",)], "order_id string")
    survivors = BP.cascade_delete(pointers, keys, url)
    assert sorted(r.order_id for r in survivors.collect()) == ["b", "c"]
    store = make_store(url)
    assert not store.head("orders/a/image.png")   # object gone first (A15)
    assert store.head("orders/b/image.png")
    # repeat delete of an absent key: no-op, absence-tolerant (README.md:125)
    again = BP.cascade_delete(survivors, keys, url)
    assert sorted(r.order_id for r in again.collect()) == ["b", "c"]
