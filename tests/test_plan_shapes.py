"""Physical-plan regression guards: the properties that make these queries
scale must survive refactors — filters reach the Parquet scan, projections
prune columns, small dims broadcast, LSH pair joins stay equi-joins (no
cartesian), top-k plans TakeOrdered (no global sort)."""

import io
import re
from contextlib import redirect_stdout

import __spark_entry__ as E


def _plan(spark, sf_dir, name):
    df = E.queries()[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filters_push_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    pushed = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert pushed and "l_shipdate" in pushed.group(1)


def test_projection_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "page_scan_projection")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all(len(s.split(",")) <= 3 for s in schemas), schemas


def test_dims_broadcast_in_q5(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan


def test_semi_join_planned_for_q4(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q4_order_priority")
    assert "LeftSemi" in plan


def test_lsh_pair_join_is_equi_join(spark, sf_dir):
    for q in ("dedup_minhash_lsh", "ann_hyperplane_lsh"):
        plan = _plan(spark, sf_dir, q)
        assert "CartesianProduct" not in plan, q
        assert "BroadcastNestedLoopJoin" not in plan, q


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "top_orders")
    assert "TakeOrderedAndProject" in plan


def test_insert_anti_join_never_broadcasts_existing(spark, sf_dir):
    """insert_rows' left-anti right side is the existing (100 TB) table's
    key set — a broadcast there OOMs the driver at scale. With the
    auto-broadcast threshold disabled, any BroadcastExchange left in the
    plan could only come from a hint, so the plan must contain none."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, sf_dir, "insert_append")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastExchange" not in plan, plan


def test_bulk_mutations_have_no_broadcast_hint(spark, sf_dir):
    """update_rows/delete_rows default to a broadcast hint (the reference's
    point-CRUD shape); with ``bulk=True`` the hint must vanish so a
    100 TB-scale update batch can't OOM an executor. With auto-broadcast
    disabled any BroadcastExchange could only come from a hint — assert
    hint present by default, absent under bulk (VERDICT r4 item 4)."""
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.mutation import (
        delete_rows,
        update_rows,
    )
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.sources.tables import load_table

    existing = load_table(spark, sf_dir, "orders")
    batch = existing.select("o_orderkey", "o_orderpriority").limit(10)

    def plan_of(df):
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert "BroadcastExchange" in plan_of(
            update_rows(existing, batch, "o_orderkey")
        )
        assert "BroadcastExchange" not in plan_of(
            update_rows(existing, batch, "o_orderkey", bulk=True)
        )
        assert "BroadcastExchange" in plan_of(
            delete_rows(existing, batch, "o_orderkey")
        )
        assert "BroadcastExchange" not in plan_of(
            delete_rows(existing, batch, "o_orderkey", bulk=True)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_neardup_lsh_join_is_equi_join(spark, sf_dir):
    """The reworked neardup candidate join must stay a (table, bucket)
    equi-join — never a cartesian/label block."""
    plan = _plan(spark, sf_dir, "neardup_embedding")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decontaminate_is_equi_join_no_pairs(spark, sf_dir):
    """Decontamination joins exploded training shingles against the
    benchmark set on the hash — an equi-join; no pair join may exist."""
    plan = _plan(spark, sf_dir, "decontaminate_ngram")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quantize_is_narrow_no_shuffle(spark, sf_dir):
    """Int8 quantization is a pure projection: no exchange in the plan."""
    plan = _plan(spark, sf_dir, "embedding_quantize_int8")
    assert "Exchange" not in plan


def test_incremental_dedup_never_broadcasts_registry(spark, sf_dir):
    """dedup_incremental's anti-join right side is the full corpus's
    fingerprint registry — broadcasting it OOMs the driver at 100 TB
    (same direction lesson as insert_append). With auto-broadcast
    disabled any BroadcastExchange could only come from a hint, so the
    plan must contain none."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, sf_dir, "dedup_incremental")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "BroadcastExchange" not in plan, plan
    assert "LeftAnti" in plan


def test_rfm_no_global_sort_window(spark, sf_dir):
    """RFM quartiles must come from distribution cut-points + broadcast
    CASE bucketing — an unpartitioned Window (ntile) would sort every
    customer on ONE partition. Since round 7 the cut-points come from
    functions/quantiles' distributed prefix sum, which legitimately uses
    PARTITIONED windows (per range-partition running sums + the tiny
    per-partition-totals offsets table) — so the assertion is the real
    invariant: no single-partition exchange anywhere (the signature of
    an unpartitioned window/ntile over the customer grain), and the
    cut-point table reaches the bucketing via a broadcast."""
    import __spark_entry__ as E

    df = E.queries()["customer_rfm_segments"](spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    for line in analyzed.splitlines():
        s = line.strip().lstrip(":+- ")
        if s.startswith("Window "):
            # Window [exprs], [partition spec], [order] — the partition
            # spec must be non-empty (no global single-partition window)
            assert "], [], [" not in s, s
    plan = _plan(spark, sf_dir, "customer_rfm_segments")
    assert "ntile" not in plan.lower()
    assert "BroadcastExchange" in plan


def test_hyperplane_band_join_is_id_only(spark, sf_dir):
    """The (band_idx, band_val) candidate join must not carry the 64-float
    embedding arrays — every plan node touching a band key may reference
    ids and band keys only (embeddings re-attach after the pair dedup)."""
    plan = _plan(spark, sf_dir, "ann_hyperplane_lsh")
    for line in plan.splitlines():
        if "band_val" in line:
            assert "embedding" not in line and "ea#" not in line, line


def test_minhash_band_join_is_id_only(spark, sf_dir):
    """Same id-only discipline for MinHash LSH: the 16 signature columns
    re-attach after the pair dedup, never ride the band-bucket shuffle.
    The posexplode that DERIVES band values from sigs is map-side and
    fine; what must stay clean is every Input/Output row of a node that
    carries a band key (the shuffle/join surface)."""
    plan = _plan(spark, sf_dir, "dedup_minhash_lsh")
    for line in plan.splitlines():
        s = line.strip()
        if "band_val" in s and (s.startswith("Input") or s.startswith("Output")):
            assert "sig_" not in s and "la_" not in s, s


def test_ivf_assignment_is_map_side(spark, sf_dir):
    """IVF centroid assignment must be the inlined-literal argmin
    projection: the final probe plan may contain NO window (the r2 plan
    ranked a k× crossJoin blowup with row_number) and no hash exchange —
    the only exchange allowed is the broadcast of the 1-row query side,
    and top-k must plan as TakeOrdered, not sort."""
    plan = _plan(spark, sf_dir, "ann_ivf_topk")
    assert "Window" not in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "TakeOrderedAndProject" in plan


def test_tpch2_plans(spark, sf_dir):
    """Tranche-2 guards: Q8's dims broadcast; Q21's exists/not-exists
    plan as semi + anti joins; Q13 keeps the outer join."""
    plan = _plan(spark, sf_dir, "q8_market_share")
    assert "BroadcastHashJoin" in plan
    plan = _plan(spark, sf_dir, "q21_waiting_suppliers")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    plan = _plan(spark, sf_dir, "q13_customer_distribution")
    assert "LeftOuter" in plan
