"""Semantic properties of the ANN operators (the oracles pin exact values;
these pin the relationships between operators)."""

import __spark_entry__ as E


def test_multiprobe_dominates_single_probe(spark, sf_dir):
    """nprobe=2 searches a superset of nprobe=1's candidates, so its
    top-5 must be elementwise at least as close to the query — and both
    must lower-bound the exact brute-force top-5."""
    qs = E.queries()
    single = [r.score for r in qs["ann_ivf_topk"](spark, sf_dir).collect()]
    multi = [r.score for r in qs["ann_ivf_multiprobe"](spark, sf_dir).collect()]
    exact = [r.score for r in qs["ann_bruteforce_topk"](spark, sf_dir).collect()][:5]
    # the query's own cluster may hold < 6 members on a regenerated
    # fixture, so single (and even multi) can return fewer than 5 rows;
    # dominance must hold on whatever common prefix exists
    assert 0 < len(single) <= len(multi) <= 5
    for s, m in zip(single, multi):
        assert m >= s, (m, s)
    for e, m in zip(exact, multi):
        assert e >= m, (e, m)


def test_multiprobe_plan_is_map_side(spark, sf_dir):
    """Same plan contract as ann_ivf_topk: inlined-literal ranking, no
    window, no hash exchange (only the 1-row broadcast), TakeOrdered."""
    df = E.queries()["ann_ivf_multiprobe"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert "TakeOrderedAndProject" in plan
