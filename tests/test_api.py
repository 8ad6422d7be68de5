"""OrderStore facade: the reference's five REST routes end-to-end over
one Parquet-backed table (create → list → get → update → delete),
including the envelope quirks and idempotent-delete contract."""

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.api import OrderStore

SCHEMA = "order_id string, description string, s3_prefix string"


def _store(spark, tmp_path):
    path = str(tmp_path / "orders_api")
    spark.createDataFrame([], SCHEMA).write.parquet(path)
    return OrderStore(spark, path)


def test_crud_lifecycle(spark, tmp_path):
    store = _store(spark, tmp_path)
    rows = spark.createDataFrame(
        [(f"o-{i:03d}", f"desc {i}", f"orders/o-{i:03d}/blob") for i in range(8)],
        SCHEMA,
    )
    store.create(rows)
    assert store.count() == 8

    # duplicate insert is a no-op (PK-safe append)
    store.create(rows.limit(3))
    assert store.count() == 8

    env = store.list(limit="3", offset="2")
    got = [r.order_id for r in env["orders"].collect()]
    assert got == ["o-002", "o-003", "o-004"]
    assert env["limit"] == 3 and env["offset"] == 2 and env["ordersCount"] == 8
    assert env["pages"] == 3 // 8  # the reference's `pages` quirk

    # keyset path returns the same page content
    ks = [r.order_id for r in store.list_after("o-001", 3).collect()]
    assert ks == got

    assert store.get("o-004")["description"] == "desc 4"
    assert store.get("missing") is None

    upd = spark.createDataFrame([("o-004", "updated", "orders/o-004/blob")], SCHEMA)
    store.update(upd)
    assert store.get("o-004")["description"] == "updated"

    store.delete("o-004")
    assert store.get("o-004") is None and store.count() == 7
    store.delete("o-004")  # idempotent
    assert store.count() == 7


def test_blob_route(spark, tmp_path):
    path = str(tmp_path / "orders_blob_api")
    spark.createDataFrame(
        [("b-1", b"\x89PNG..."), ("b-2", b"GIF89a...")],
        "order_id string, order_blob binary",
    ).write.parquet(path)
    store = OrderStore(spark, path)
    assert bytes(store.get_blob("b-1")) == b"\x89PNG..."
    assert store.get_blob("nope") is None
