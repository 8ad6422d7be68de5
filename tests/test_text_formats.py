"""CSV / JSON-lines ingest: round-trip fidelity against the parquet
fixture and the clean/quarantine split on deliberately malformed lines."""

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.sources.text_formats import (
    read_csv_clean,
    read_jsonl_clean,
)

ORDERS_DDL = (
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
    "o_totalprice DOUBLE"
)


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def test_csv_round_trip_matches_parquet(spark, sf_dir, tmp_path):
    src = _orders(spark, sf_dir)
    path = str(tmp_path / "orders_csv")
    src.write.option("header", True).csv(path)
    clean, quarantine = read_csv_clean(spark, path, ORDERS_DDL)
    assert quarantine.count() == 0
    assert clean.count() == src.count()
    assert (
        clean.exceptAll(src).count() == 0 and src.exceptAll(clean).count() == 0
    )


def test_jsonl_round_trip_matches_parquet(spark, sf_dir, tmp_path):
    src = _orders(spark, sf_dir)
    path = str(tmp_path / "orders_jsonl")
    src.write.json(path)
    clean, quarantine = read_jsonl_clean(spark, path, ORDERS_DDL)
    assert quarantine.count() == 0
    assert clean.count() == src.count()
    assert clean.exceptAll(src).count() == 0


def test_malformed_rows_quarantined_not_dropped(spark, tmp_path):
    path = tmp_path / "bad.csv"
    path.write_text(
        "o_orderkey,o_custkey,o_orderstatus,o_totalprice\n"
        "1,10,O,99.5\n"
        "not-a-number,20,F,10.0\n"
        "2,30,P,55.25\n"
    )
    clean, quarantine = read_csv_clean(spark, str(path), ORDERS_DDL)
    assert sorted(r.o_orderkey for r in clean.collect()) == [1, 2]
    bad = quarantine.collect()
    assert len(bad) == 1 and bad[0].raw_line.startswith("not-a-number")


def test_orc_round_trip_matches_parquet(spark, sf_dir, tmp_path):
    """ORC is the other first-class columnar format (built into Spark);
    the engine's tables read/write it with identical semantics."""
    src = _orders(spark, sf_dir)
    path = str(tmp_path / "orders_orc")
    src.write.orc(path)
    back = spark.read.orc(path)
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_avro_round_trip_if_available(spark, sf_dir, tmp_path):
    """Avro ships as an external Spark package; exercised when present,
    skipped (not silently passed) when the jar is absent."""
    import pytest

    src = _orders(spark, sf_dir)
    path = str(tmp_path / "orders_avro")
    try:
        src.write.format("avro").save(path)
    except Exception as e:  # jar not on the classpath in this container
        pytest.skip(f"avro data source unavailable: {type(e).__name__}")
    back = spark.read.format("avro").load(path)
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0


def test_malformed_json_quarantined(spark, tmp_path):
    path = tmp_path / "bad.jsonl"
    path.write_text(
        '{"o_orderkey": 1, "o_custkey": 10, "o_orderstatus": "O", "o_totalprice": 9.5}\n'
        "{broken json line\n"
        '{"o_orderkey": 2, "o_custkey": 20, "o_orderstatus": "F", "o_totalprice": 1.0}\n'
    )
    clean, quarantine = read_jsonl_clean(spark, str(path), ORDERS_DDL)
    assert sorted(r.o_orderkey for r in clean.collect()) == [1, 2]
    assert quarantine.count() == 1
