"""Graph analytics over the part co-purchase graph: triangle counting /
clustering coefficient, and association-rule mining (confidence + lift)
over co-purchase pairs (SURVEY §7 M2 breadth — the graph/recommendation
workloads next to part_pagerank).

Scale notes (100 TB):
- Triangles use DEGREE-ORDERED orientation (each undirected edge points
  from its lower-(degree, id) endpoint to the higher one) so every
  vertex's out-degree is O(√m) — the classic hub guard — and count by
  EDGE ITERATION: per oriented edge, intersect the two endpoints' sorted
  out-adjacency arrays in the JVM (see q_graph_triangles for why each
  triangle is counted exactly once). Total work stays O(m^1.5) but wedge
  candidates collapse inside the intersection instead of materializing
  as shuffle rows. The DuckDB oracle uses the simple id-ordered triple
  join — same count, O(n²)-prone shape allowed only because it's the
  sf0.01 oracle.
- Association rules reuse the bounded per-basket pair fan-out of
  basket_part_pairs (|basket|² per order, baskets are small), one count
  shuffle per grain (item, pair), a broadcast 1-row basket total, and a
  TakeOrdered top-k — never a part×part join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table as _t

RULE_MIN_SUPPORT = 2  # baskets a pair must appear in before it can form a rule
RULE_TOPK = 20


def _canonical_edges(spark, sf_dir):
    """Undirected co-purchase edges (a < b), deduplicated: parts are
    nodes, an edge when two parts share an order (the part_pagerank
    graph, canonicalized)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.select("l_orderkey", F.col("l_partkey").alias("a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def q_graph_triangles(spark, sf_dir):
    """Triangle census of the co-purchase graph: nodes, edges, wedges
    (open two-paths), triangles, and the global clustering coefficient
    3·T / W.

    Algorithm (round-5 rewrite): degree-ordered EDGE ITERATOR. Orient
    each edge low-(deg,id) → high, build each vertex's out-adjacency
    array (bounded by max outdeg = O(√m) — the orientation's whole
    point), and count per edge (u,v): |N⁺(u) ∩ N⁺(v)| via a JVM
    array_intersect. On the oriented DAG every triangle {u→v, u→w, v→w}
    is counted exactly once, at its unique base edge (u,v) whose both
    endpoints point at w. Same O(m^1.5) work bound as the previous
    wedge-join plan, but the ~150M wedge candidates COLLAPSE inside the
    per-edge intersection instead of materializing as shuffle rows +
    a semi-join probe (measured 12.1 s → 7.5 s warm at sf0.1, where the
    graph has 1.2M edges / 148M wedges).

    Scale shape: the degree table is |nodes| rows — NO broadcast hint
    (round-7 fix, VERDICT r6 item 2: at 10⁹ nodes two-long rows are a
    ≥16 GB broadcast, and a forced hint removes AQE's ability to fall
    back to a shuffle join). AQE broadcasts it while it fits and
    shuffle-joins on the node key past that; same for the adjacency
    table. No pair-grain shuffle exists either way."""
    edges = _canonical_edges(spark, sf_dir).localCheckpoint(eager=False)
    # NOTE (r13, measured): do NOT inline()-mirror this union. The edge
    # list is already checkpointed, so the two branches are cheap
    # in-memory scans — generator-doubling 2m edge rows into one
    # pipeline measured ~30% SLOWER at the sf1 soak (31 vs 24 s warm;
    # the per-row array-of-struct allocation outweighs the saved scan).
    # inline() pays off only where it removes a barrier or dedups an
    # expensive (join/aggregate) subtree — see _knn_scored_pairs.
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    # Orient each edge from lower-(deg, id) to higher-(deg, id).
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    ed = edges.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    ).localCheckpoint(eager=False)
    adj = oriented.groupBy("src").agg(F.array_sort(F.collect_list("dst")).alias("nbrs"))
    a1 = adj.select(F.col("src").alias("s1"), F.col("nbrs").alias("n1"))
    a2 = adj.select(F.col("src").alias("s2"), F.col("nbrs").alias("n2"))
    # inner joins: an edge whose src or dst has no out-neighbors closes no
    # triangle and contributes 0 — dropping it changes nothing
    per_edge = (
        oriented.join(a1, oriented.src == F.col("s1"))
        .join(a2, oriented.dst == F.col("s2"))
        .select(F.size(F.array_intersect("n1", "n2")).alias("t"))
    )
    # coalesce: a triangle-free graph (e.g. a star — the hub ends up with
    # no out-neighbors, so the inner joins drop every edge) sums over an
    # empty set, which is NULL, not 0
    n_tri = per_edge.agg(
        F.coalesce(F.sum("t"), F.lit(0)).cast("bigint").alias("n_triangles")
    )
    summary = (
        deg.agg(
            F.count("*").alias("n_nodes"),
            (F.sum("deg") / 2).cast("bigint").alias("n_edges"),
            F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("bigint").alias("n_wedges"),
        )
    )
    return summary.crossJoin(F.broadcast(n_tri)).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6).alias("clustering_coeff"),
    )


def q_association_rules(spark, sf_dir):
    """Association rules over co-purchase baskets: for each directed rule
    a→b with pair support ≥ RULE_MIN_SUPPORT, confidence = sup(a,b) /
    sup(a) and lift = N·sup(a,b) / (sup(a)·sup(b)). Top-RULE_TOPK by
    (lift, confidence) with deterministic tiebreaks — the
    recommendation-rule mining pass over the basket_part_pairs grain."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    n_baskets = li.agg(F.countDistinct("l_orderkey").alias("n_baskets"))
    item = li.groupBy(F.col("l_partkey").alias("item")).agg(F.count("*").alias("item_n"))
    a = li.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= RULE_MIN_SUPPORT)
    )
    # Both rule directions from the canonical pair grain — inline()
    # emits them in ONE pass (the self-union planned the whole
    # join+aggregate pair subtree twice — r13; same row multiset).
    rules = pairs.select(
        F.inline(
            F.array(
                F.struct(
                    F.col("pa").alias("antecedent"),
                    F.col("pb").alias("consequent"),
                    F.col("sup").alias("sup"),
                ),
                F.struct(
                    F.col("pb").alias("antecedent"),
                    F.col("pa").alias("consequent"),
                    F.col("sup").alias("sup"),
                ),
            )
        )
    )
    ia = item.select(F.col("item").alias("antecedent"), F.col("item_n").alias("n_a"))
    ib = item.select(F.col("item").alias("consequent"), F.col("item_n").alias("n_c"))
    return (
        rules.join(ia, "antecedent")
        .join(ib, "consequent")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            F.col("sup").alias("support_n"),
            F.round(F.col("sup") / F.col("n_a"), 6).alias("confidence"),
            F.round(
                F.col("n_baskets") * F.col("sup") / (F.col("n_a") * F.col("n_c")), 6
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), F.desc("confidence"), "antecedent", "consequent")
        .limit(RULE_TOPK)
    )


def q_event_type_pmi(spark, sf_dir):
    """Pointwise mutual information between event types co-occurring in
    the same (user, day) basket: PMI(a,b) = ln(N·c_ab / (c_a·c_b)) — the
    information-theoretic twin of association_rules' lift (PMI = ln lift),
    at the behavioral-sessions grain instead of purchase baskets. The
    basket grain is deduplicated FIRST (user-day-type distinct), so the
    pair fan-out is |types-per-basket|² ≤ 5² per basket regardless of raw
    event volume; N and the per-type counts attach as broadcasts."""
    ev = _t(spark, sf_dir, "events")
    basket = ev.select(
        "user_id", F.to_date("ts").alias("day"), "event_type"
    ).distinct()
    n = basket.select("user_id", "day").distinct().agg(
        F.count("*").alias("n_baskets")
    )
    tcount = basket.groupBy(F.col("event_type").alias("t")).agg(
        F.count("*").alias("tn")
    )
    a = basket.select("user_id", "day", F.col("event_type").alias("ta"))
    b = basket.select("user_id", "day", F.col("event_type").alias("tb"))
    pairs = (
        a.join(b, ["user_id", "day"])
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count("*").alias("c_ab"))
    )
    ca = tcount.select(F.col("t").alias("ta"), F.col("tn").alias("c_a"))
    cb = tcount.select(F.col("t").alias("tb"), F.col("tn").alias("c_b"))
    return (
        pairs.join(F.broadcast(ca), "ta")
        .join(F.broadcast(cb), "tb")
        .crossJoin(F.broadcast(n))
        .select(
            "ta",
            "tb",
            "c_ab",
            F.round(
                F.log(F.col("n_baskets") * F.col("c_ab") / (F.col("c_a") * F.col("c_b"))),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "ta", "tb")
    )


KCORE_K = 3        # minimum degree of the core
KCORE_ROUNDS = 5   # peel rounds; fixpoint reached when a round drops nobody


def q_kcore_membership(spark, sf_dir):
    """K-core membership of the co-purchase graph after KCORE_ROUNDS
    synchronous peel rounds: repeatedly drop nodes with degree < KCORE_K
    (and their edges), the classic iterated-peel k-core algorithm. The
    community-detection / spam-subgraph primitive next to triangles and
    PageRank: the 3-core isolates the densely co-purchased part clusters.

    Output: (node, core_degree) for nodes still alive after the rounds
    (degree counted inside the surviving subgraph). Fixed-round peel is
    exact once a round reaches the fixpoint (no node dropped) — at the
    fixture scale 5 rounds converge (pytest pins it); production tuning
    raises rounds or loops until a count() of dropped nodes hits 0, the
    same driver-side-scalar pattern as k-means.

    Scale shape: each round is one degree aggregation + two semi-joins
    on the directed edge list, all keyed on node id — no pair blowup
    anywhere; localCheckpoint per round truncates the iterative lineage
    (the kmeans/components discipline)."""
    edges = _canonical_edges(spark, sf_dir)
    # inline() symmetrizes in ONE pass — the self-union planned (and,
    # modulo exchange reuse, executed) the edge-building subtree twice
    sym = edges.select(
        F.inline(
            F.array(
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                F.struct(F.col("b").alias("u"), F.col("a").alias("v")),
            )
        )
    ).localCheckpoint(eager=False)
    for rnd in range(KCORE_ROUNDS):
        deg = sym.groupBy("u").agg(F.count("*").alias("c"))
        keep = deg.filter(F.col("c") >= KCORE_K).select("u")
        sym = (
            sym.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .select("u", "v")
        )
        # materialize a round only when it feeds MORE than one consumer
        # (the next round's degree aggregate AND its semi-joins). The
        # LAST round feeds only the final groupBy, so its checkpoint
        # bought no dedup — just one more eager Catalyst planning pass
        # at build time (r13, the graph_khop_reach last-hop precedent).
        if rnd < KCORE_ROUNDS - 1:
            sym = sym.localCheckpoint(eager=False)
    return (
        sym.groupBy(F.col("u").alias("node"))
        .agg(F.count("*").alias("core_degree"))
        .orderBy("node")
    )


KHOP_SEED_SUPP = 1  # BFS seeds: the parts supplied by this supplier
KHOP_MAX = 3


def q_graph_khop_reach(spark, sf_dir):
    """Fixed-depth BFS over the co-purchase graph: from the parts
    supplied by supplier KHOP_SEED_SUPP, how much of the catalog is
    reachable within 1..KHOP_MAX co-purchase hops — the blast-radius /
    recommendation-neighborhood question. Output: per min-distance, the
    part count and catalog share.

    Scale shape: each hop is ONE equi-join frontier×edges followed by a
    distinct and an anti-join against the already-visited set (the BFS
    prune — without it the frontier re-expands into visited nodes and
    hop k costs Θ(paths) instead of Θ(edges touched)). Depth is a plan
    constant (3 unrolled joins, no driver iteration on data); min-dist
    is guaranteed by construction since a node enters exactly one
    frontier. The final histogram is a ≤(KHOP_MAX+1)-row contraction
    plus a 1-row catalog-count broadcast."""
    edges = _canonical_edges(spark, sf_dir)
    # lineage truncation (the analytics_ext iterative-round pattern):
    # without the checkpoints each hop's plan embeds the edge-building
    # subtree again through BOTH the join and the anti-join sides —
    # measured 77 lineitem scans and zero exchange reuse at depth 3.
    # One materialized edge list + one materialized frontier per hop is
    # the BFS cost model a 1000-executor run needs.
    sym = edges.select(
        # inline(): both edge directions in ONE pass (the self-union
        # planned the edge-building subtree twice — r13)
        F.inline(
            F.array(
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                F.struct(F.col("b").alias("u"), F.col("a").alias("v")),
            )
        )
    ).localCheckpoint(eager=False)
    seed = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") == KHOP_SEED_SUPP)
        .select(F.col("l_partkey").alias("node"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    visited = seed.withColumn("dist", F.lit(0))
    frontier = seed
    for k in range(1, KHOP_MAX + 1):
        nxt = (
            frontier.join(sym, frontier.node == sym.u)
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
        )
        # Materialize a hop only when it feeds MORE than one consumer
        # (the next hop's expand join AND its anti-join prune AND the
        # final union). The LAST hop feeds only the final union, so its
        # checkpoint bought no dedup — just one more eager Catalyst
        # planning pass at build time (r12: each lazy localCheckpoint
        # plans its subtree immediately; ~0.9 s/hop at sf0.1).
        if k < KHOP_MAX:
            nxt = nxt.localCheckpoint(eager=False)
        visited = visited.unionByName(nxt.withColumn("dist", F.lit(k)))
        frontier = nxt
    total = _t(spark, sf_dir, "part").agg(F.count("*").alias("n_catalog"))
    return (
        visited.groupBy("dist")
        .agg(F.count("*").alias("n_parts"))
        .crossJoin(F.broadcast(total))
        .select(
            "dist",
            "n_parts",
            F.round(F.col("n_parts") / F.col("n_catalog"), 6).alias(
                "catalog_share"
            ),
        )
        .orderBy("dist")
    )


QUERIES = {
    "graph_khop_reach": q_graph_khop_reach,
    "graph_triangles": q_graph_triangles,
    "association_rules": q_association_rules,
    "event_type_pmi": q_event_type_pmi,
    "kcore_membership": q_kcore_membership,
}


def _kcore_oracle() -> str:
    edges = """
        li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        edges AS (
            SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
            FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
            WHERE x.l_partkey < y.l_partkey
        ),
        sym0 AS (
            SELECT a AS u, b AS v FROM edges
            UNION ALL SELECT b AS u, a AS v FROM edges
        )"""
    rounds = []
    for i in range(KCORE_ROUNDS):
        rounds.append(f"""
        deg{i} AS (SELECT u, COUNT(*) AS c FROM sym{i} GROUP BY u),
        keep{i} AS (SELECT u FROM deg{i} WHERE c >= {KCORE_K}),
        sym{i + 1} AS (
            SELECT s.u, s.v FROM sym{i} s
            JOIN keep{i} ku ON s.u = ku.u
            JOIN keep{i} kv ON s.v = kv.u
        )""")
    return (
        "WITH " + edges + "," + ",".join(rounds)
        + f"""
        SELECT u AS node, COUNT(*) AS core_degree
        FROM sym{KCORE_ROUNDS} GROUP BY u ORDER BY node
    """
    )

ORACLES = {
    "graph_khop_reach": f"""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        edges AS (
            SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
            FROM li x JOIN li y ON x.l_orderkey = y.l_orderkey
            WHERE x.l_partkey < y.l_partkey
        ),
        sym AS (
            SELECT a AS u, b AS v FROM edges
            UNION ALL SELECT b AS u, a AS v FROM edges
        ),
        r0 AS (SELECT DISTINCT l_partkey AS node FROM lineitem
               WHERE l_suppkey = {KHOP_SEED_SUPP}),
        r1 AS (SELECT DISTINCT v AS node FROM sym JOIN r0 ON sym.u = r0.node),
        r2 AS (SELECT DISTINCT v AS node FROM sym JOIN r1 ON sym.u = r1.node),
        r3 AS (SELECT DISTINCT v AS node FROM sym JOIN r2 ON sym.u = r2.node),
        allr AS (
            SELECT node, 0 AS dist FROM r0
            UNION ALL SELECT node, 1 FROM r1
            UNION ALL SELECT node, 2 FROM r2
            UNION ALL SELECT node, 3 FROM r3
        ),
        reach AS (SELECT node, MIN(dist) AS dist FROM allr GROUP BY 1)
        SELECT dist, CAST(COUNT(*) AS BIGINT) AS n_parts,
               ROUND(COUNT(*) / (SELECT CAST(COUNT(*) AS DOUBLE) FROM part), 6)
                 AS catalog_share
        FROM reach GROUP BY dist ORDER BY dist
    """,
    "kcore_membership": _kcore_oracle(),
    "event_type_pmi": """
        WITH basket AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
            FROM events
        ),
        n AS (
            SELECT COUNT(*) AS n_baskets
            FROM (SELECT DISTINCT user_id, day FROM basket)
        ),
        tcount AS (
            SELECT event_type AS t, COUNT(*) AS tn FROM basket GROUP BY 1
        ),
        pairs AS (
            SELECT x.event_type AS ta, y.event_type AS tb, COUNT(*) AS c_ab
            FROM basket x JOIN basket y
              ON x.user_id = y.user_id AND x.day = y.day
            WHERE x.event_type < y.event_type
            GROUP BY 1, 2
        )
        SELECT p.ta, p.tb, p.c_ab,
               ROUND(LN(n.n_baskets * p.c_ab / (ca.tn * cb.tn)), 6) AS pmi
        FROM pairs p
        JOIN tcount ca ON ca.t = p.ta
        JOIN tcount cb ON cb.t = p.tb
        CROSS JOIN n
        ORDER BY pmi DESC, p.ta, p.tb
    """,
    "graph_triangles": """
        WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (
            SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
            FROM b x JOIN b y USING (l_orderkey)
            WHERE x.l_partkey < y.l_partkey
        ),
        deg AS (
            SELECT v, COUNT(*) AS d FROM (
                SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e
            ) GROUP BY v
        ),
        tri AS (
            SELECT COUNT(*) AS n_triangles
            FROM e e1 JOIN e e2 ON e1.b = e2.a
                      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        summary AS (
            SELECT COUNT(*) AS n_nodes,
                   CAST(SUM(d) / 2 AS BIGINT) AS n_edges,
                   CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges
            FROM deg
        )
        SELECT n_nodes, n_edges, n_wedges, n_triangles,
               ROUND(3.0 * n_triangles / n_wedges, 6) AS clustering_coeff
        FROM summary, tri
    """,
    "association_rules": f"""
        WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM b),
        item AS (SELECT l_partkey AS item, COUNT(*) AS item_n FROM b GROUP BY 1),
        pairs AS (
            SELECT x.l_partkey AS pa, y.l_partkey AS pb, COUNT(*) AS sup
            FROM b x JOIN b y USING (l_orderkey)
            WHERE x.l_partkey < y.l_partkey
            GROUP BY 1, 2 HAVING COUNT(*) >= {RULE_MIN_SUPPORT}
        ),
        rules AS (
            SELECT pa AS antecedent, pb AS consequent, sup FROM pairs
            UNION ALL
            SELECT pb AS antecedent, pa AS consequent, sup FROM pairs
        )
        SELECT r.antecedent, r.consequent, r.sup AS support_n,
               ROUND(r.sup / ia.item_n, 6) AS confidence,
               ROUND(nb.n_baskets * r.sup / (ia.item_n * ic.item_n), 6) AS lift
        FROM rules r
        JOIN item ia ON ia.item = r.antecedent
        JOIN item ic ON ic.item = r.consequent
        CROSS JOIN nb
        ORDER BY lift DESC, confidence DESC, r.antecedent, r.consequent
        LIMIT {RULE_TOPK}
    """,
}
