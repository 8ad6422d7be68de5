"""Algorithmic guards on the profiling / graph operators:

- Bloom prefilter: ZERO false negatives by construction (every true member
  of the build set must pass the filter), on an adversarial disjoint/
  overlapping key layout.
- Pareto frontier: the bucketed windowed plan equals the O(n²) brute-force
  dominance check on seeded random data (ties and duplicate points
  included).
- Triangle census: the degree-ordered orientation count equals a Python
  brute-force count on seeded random baskets, and a hub-star graph (the
  adversarial case for id-ordered wedge enumeration) yields zero wedge
  work from the hub.
- CUSUM change-point: a synthetic step series localizes the shift at the
  last pre-shift day.
- Weighted sampling: deterministic across runs, exactly K rows per group.
"""

import random
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans import graph_ops, profiling


def _write(tmp_path, name, cols: dict):
    pq.write_table(pa.table(cols), f"{tmp_path}/{name}.parquet")
    return str(tmp_path)


# --- bloom ------------------------------------------------------------------------------
def test_bloom_has_no_false_negatives(spark, tmp_path):
    build_keys = list(range(1, 101))  # customers in the build segment
    other_keys = list(range(200, 1200))  # non-members probed via orders
    _write(
        tmp_path,
        "customer",
        {
            "c_custkey": pa.array(build_keys + other_keys[:50], pa.int64()),
            "c_mktsegment": pa.array(
                [profiling.BLOOM_SEGMENT] * len(build_keys) + ["FURNITURE"] * 50,
                pa.string(),
            ),
        },
    )
    _write(
        tmp_path,
        "orders",
        {"o_custkey": pa.array(build_keys + other_keys, pa.int64())},
    )
    row = profiling.q_bloom_prefilter_semijoin(spark, str(tmp_path)).collect()[0]
    assert row.n_probe_keys == len(build_keys) + len(other_keys)
    assert row.n_true_members == len(build_keys)
    # no false negatives: every true member passes, so pass >= members
    assert row.n_bloom_pass == row.n_true_members + row.n_false_pos
    assert row.n_bloom_pass >= row.n_true_members
    # 2^16 bits / 100 keys / 4 probes -> fpr should be tiny on 1000 non-members
    assert row.fpr < 0.01


# --- pareto -----------------------------------------------------------------------------
def test_pareto_frontier_matches_bruteforce(spark, tmp_path):
    rng = random.Random(42)
    pts = [(i, round(rng.uniform(0, 100), 2), rng.randint(1, 40)) for i in range(300)]
    pts += [(1000, 5.0, 5), (1001, 5.0, 5)]  # duplicate point: both survive or neither
    _write(
        tmp_path,
        "part",
        {
            "p_partkey": pa.array([p[0] for p in pts], pa.int64()),
            "p_retailprice": pa.array([p[1] for p in pts], pa.float64()),
            "p_size": pa.array([p[2] for p in pts], pa.int32()),
        },
    )

    def dominated(p, q):
        return q[1] <= p[1] and q[2] <= p[2] and (q[1] < p[1] or q[2] < p[2])

    expect = sorted(
        (p[0] for p in pts if not any(dominated(p, q) for q in pts if q[0] != p[0])),
    )
    got = sorted(
        r.p_partkey for r in profiling.q_pareto_frontier(spark, str(tmp_path)).collect()
    )
    assert got == expect


# --- triangles --------------------------------------------------------------------------
def _tri_bruteforce(baskets):
    edges = set()
    for items in baskets:
        s = sorted(set(items))
        for i in range(len(s)):
            for j in range(i + 1, len(s)):
                edges.add((s[i], s[j]))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = 0
    for a, b in edges:
        tri += len(adj[a] & adj[b] & {v for v in adj if v > b})
    return len(edges), tri


def _write_baskets(tmp_path, baskets):
    ok, pk = [], []
    for oid, items in enumerate(baskets):
        for it in items:
            ok.append(oid)
            pk.append(it)
    return _write(
        tmp_path,
        "lineitem",
        {"l_orderkey": pa.array(ok, pa.int64()), "l_partkey": pa.array(pk, pa.int64())},
    )


def test_triangles_match_bruteforce_on_random_baskets(spark, tmp_path):
    rng = random.Random(7)
    baskets = [rng.sample(range(1, 40), rng.randint(2, 5)) for _ in range(60)]
    n_edges, n_tri = _tri_bruteforce(baskets)
    row = graph_ops.q_graph_triangles(spark, _write_baskets(tmp_path, baskets)).collect()[0]
    assert row.n_edges == n_edges
    assert row.n_triangles == n_tri


def test_triangles_hub_star_is_triangle_free(spark, tmp_path):
    # hub part 0 co-purchased pairwise with 200 leaves (2-item baskets):
    # star graph — 0 triangles, and every wedge apexes at the hub, the case
    # degree-ordered orientation refuses to enumerate from the hub side.
    baskets = [(0, leaf) for leaf in range(1, 201)]
    row = graph_ops.q_graph_triangles(spark, _write_baskets(tmp_path, baskets)).collect()[0]
    assert row.n_edges == 200
    assert row.n_triangles == 0
    assert row.n_wedges == 200 * 199 // 2  # undirected wedge count at the hub


# --- cusum ------------------------------------------------------------------------------
def test_cusum_localizes_step_change(spark, tmp_path):
    base = datetime(2024, 3, 1)
    rows = []
    eid = 0
    for day in range(20):
        rate = 10 if day < 10 else 30
        for _ in range(rate):
            rows.append((eid, base + timedelta(days=day, minutes=eid % 60), eid % 7))
            eid += 1
    _write(
        tmp_path,
        "events",
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        },
    )
    out = profiling.q_events_cusum_changepoint(spark, str(tmp_path)).collect()
    assert len(out) == 1
    # |cusum| peaks on the last pre-shift day (days 0-9 at 10/day, mean 20)
    assert out[0].changepoint_day == (base + timedelta(days=9)).date()
    assert out[0].max_cusum_dev == pytest.approx(100.0)


# --- weighted sampling ------------------------------------------------------------------
def test_weighted_sample_is_deterministic_and_sized(spark, sf_dir):
    a = profiling.q_weighted_sample_topk(spark, sf_dir).collect()
    b = profiling.q_weighted_sample_topk(spark, sf_dir).collect()
    assert a == b
    per_source = {}
    for r in a:
        per_source.setdefault(r.source, []).append(r.doc_id)
    assert all(len(v) == profiling.WSAMPLE_K for v in per_source.values())


def test_kcore_peel_converges_within_rounds(spark, sf_dir):
    """The fixed-round peel must have reached its fixpoint: one EXTRA
    round drops no node, so the output is the true k-core, not a
    truncated peel (docstring contract of q_kcore_membership)."""
    from pyspark.sql import functions as F

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.graph_ops import (
        KCORE_K,
        q_kcore_membership,
    )

    core = q_kcore_membership(spark, sf_dir)
    # fixpoint check: every surviving node still has core_degree >= K
    # (a non-converged peel would leave under-degree nodes behind)
    assert core.filter(F.col("core_degree") < KCORE_K).count() == 0
    assert core.count() > 0


def test_zorder_pruning_dominates_1d_sort_on_second_dim(spark, sf_dir):
    """The point of the audit: for a predicate on the NON-sort dimension,
    the 1-D layout scans everything while the z-order layout prunes; on
    the sort dimension both layouts prune. Scanned rows always cover the
    true matches."""
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans.profiling import (
        q_zorder_pruning_audit,
    )

    rows = {
        (r.layout, r.pred_dim): r for r in q_zorder_pruning_audit(spark, sf_dir).collect()
    }
    assert set(rows) == {("zorder", "x"), ("zorder", "y"), ("xsort", "x"), ("xsort", "y")}
    for r in rows.values():
        assert r.rows_scanned >= r.rows_matching  # pruning is never lossy
        assert r.n_buckets_scanned <= r.n_buckets
    assert rows[("xsort", "y")].scan_frac == 1.0  # 1-D sort can't skip on y
    assert rows[("zorder", "y")].scan_frac < 0.5  # z-order can
    assert rows[("xsort", "x")].scan_frac < 0.5   # both prune their sort dim
    assert rows[("zorder", "x")].scan_frac < 0.5
