"""End-to-end blob externalization: the reference's core migration as one
Spark job (SURVEY §7 M1.5), against the local object store."""

import pytest
from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators import blob_pipeline as BP
from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators import bridge
from migrate_blob_data_from_rdbms_to_amazon_s3_spark.sources.object_store import (
    make_store,
    read_objects,
)

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


def test_binaryfile_readback_roundtrip(spark, legacy, tmp_path):
    """A13 bulk object source (app.js:519-576): externalize, read the whole
    store tree back through the binaryFile format, and prove byte-parity
    with the write manifest plus linkage back to the pointer table."""
    url = f"file://{tmp_path}/store"
    manifest = BP.externalize_blobs(legacy, url)
    manifest.cache()
    assert manifest.count() == 3

    objs = read_objects(spark, url)
    assert set(objs.columns) == {"object_key", "n_bytes", "content", "mod_time"}
    back = objs.join(manifest, "object_key").select(
        "order_id",
        F.md5("content").alias("rt_md5"),
        "content_md5",
        F.length("content").cast("long").alias("rt_bytes"),
        manifest["n_bytes"],
    )
    rows = back.collect()
    # Spark's split planner skips zero-byte files: 'b' (the empty blob)
    # is audited from the manifest instead, not the binaryFile scan
    assert sorted(r.order_id for r in rows) == ["a", "c"]
    for r in rows:
        assert r.rt_md5 == r.content_md5, r
        assert r.rt_bytes == r.n_bytes, r
    unscanned = manifest.join(objs, "object_key", "left_anti").collect()
    assert [(r.order_id, r.n_bytes) for r in unscanned] == [("b", 0)]

    # D2 linkage over the real binaryFile listing (not a derived DF)
    linked = bridge.object_linkage(BP.pointer_table(legacy), objs.drop("content"))
    assert sorted(r.order_id for r in linked.collect()) == ["a", "c"]


def test_oversize_blob_rejected(spark, tmp_path):
    """order.js:388 content-length-range 0..10485760: an 11 MB payload is
    flagged in the manifest and never written; validation stays clean."""
    big = b"\x5a" * (BP.MAX_OBJECT_BYTES + 1)
    legacy = spark.createDataFrame(
        [("big", "huge", big), ("ok", "fine", b"tiny")],
        "order_id string, description string, order_blob binary",
    )
    url = f"file://{tmp_path}/store"
    manifest = BP.externalize_blobs(legacy, url)
    manifest.cache()
    rows = {r.order_id: r for r in manifest.collect()}
    assert rows["big"].status == "rejected_oversize"
    assert rows["big"].object_key is None
    assert rows["big"].n_bytes == BP.MAX_OBJECT_BYTES + 1
    assert rows["ok"].status == "written"
    assert not make_store(url).head("orders/big/image.png")

    report = BP.validate_migration(legacy, manifest, url)
    assert report["rejected_oversize"] == 1
    assert report["missing_writes"] == 0
    assert report["size_mismatches"] == 0
    assert report["md5_mismatches"] == 0
    assert report["missing_objects"] == 0
    assert report["orphan_manifests"] == 0


def test_validation_catches_phantom_writes(spark, legacy, tmp_path):
    """A manifest row with no source row (phantom/orphan write) must fail
    validation — previously NULL src sums made every flag NULL → ignored."""
    url = f"file://{tmp_path}/store"
    manifest = BP.externalize_blobs(legacy, url)
    manifest.cache()
    manifest.count()
    store = make_store(url)
    store.put("orders/zz/image.png", b"phantom")
    phantom = spark.createDataFrame(
        [("zz", "orders/zz/image.png", 7, "x" * 32, "written")],
        BP.WRITE_MANIFEST_SCHEMA,
    )
    report = BP.validate_migration(legacy, manifest.unionByName(phantom), url)
    assert report["orphan_manifests"] == 1
    assert report["size_mismatches"] == 0  # NULL src must not leak into these
    assert report["md5_mismatches"] == 0
    assert report["missing_writes"] == 0


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
