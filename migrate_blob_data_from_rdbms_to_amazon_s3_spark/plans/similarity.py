"""Similarity search over embedding columns (`array<float>`, dim 64).

Three operators:

- brute-force cosine top-k — the exactness baseline: broadcast the query
  vector, one narrow projection computes the score, TakeOrdered top-k.
  At 100 TB this is a single pass, no shuffle except the final k-merge.
- IVF top-k — the coarse quantizer is the TRAINED k-means (Lloyd
  rounds, `_kmeans_fit`) with a CORPUS-DERIVED codebook size (mean cell
  fill held ~constant as n grows); every vector is assigned to its
  nearest centroid by the map-side Arrow argmin kernel (`_assign_df` —
  no row blowup, no shuffle) and queries search only their nprobe
  nearest cells' inverted lists. At 1000 executors the probe touches
  ~nprobe/k of the data.
- embedding near-dup pairs — multi-table multi-probe hyperplane-LSH
  candidate join with an exact cosine verification (the "semantic dedup"
  primitive). Candidates come from ND_BANDS independent sign-LSH tables
  with Hamming-1 probing, never from a label/quadratic block; the band
  width derives from the live corpus size inside the plan (see the
  index comment above `_nd_bits_case`).

All arithmetic is double-precision JVM-side (`zip_with`/`aggregate`
higher-order functions — no UDF, no Python). Scores are rounded to 6
decimals in both engines *before* any ordering/thresholding so the
cross-engine float summation ulp never flips a comparison.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.local_frame import arrow_local_df

NEARDUP_COSINE = 0.45
N_CENTROIDS = 8  # quantizer size k; k-means seeds from vec_id < k

# Random-hyperplane LSH: N_PLANES ±1 hyperplanes derived from md5 so both
# engines (and every run) see the identical matrix. sign(dot(v, P_j))
# approximates angular locality; equal 16-bit signatures => candidates.
N_PLANES = 16
EMB_DIM = 64


def _mk_planes(n: int) -> list[list[float]]:
    return [
        [
            1.0
            if int(hashlib.md5(f"hp-{j}-{i}".encode()).hexdigest()[:2], 16) % 2 == 0
            else -1.0
            for i in range(EMB_DIM)
        ]
        for j in range(n)
    ]


_PLANES = _mk_planes(N_PLANES)

# Near-dup candidate index: ND_BANDS independent sign-LSH tables with
# Hamming-1 multi-probe on the query side. The band WIDTH (bits per
# table) is the log(n) dial — wider bands shrink buckets — and since
# round 6 it is DERIVED FROM THE LIVE CORPUS SIZE inside the plan
# (VERDICT r5 item 1: the fixed 6-bit width measurably saturated at
# sf0.1 — lsh_width_sweep showed a 13x candidate cut at 10 bits).
#
# Mechanism: every vector gets a full ND_MAX_BITS-wide signature per
# table from a static (table, bit)-indexed plane matrix, then the bucket
# value is the signature masked to
#     nd_bits = clamp(ceil(log2(n / ND_FILL_TARGET)), ND_MIN_BITS, ND_MAX_BITS)
# where n = COUNT(*) of the corpus, computed as a broadcast 1-row config
# joined into the plan (no driver-side count, no collect). The clamp is
# an integer CASE ladder (`_nd_bits_case`) so both engines — and any two
# runs — derive the identical width with no float/libm drift. Because
# bit f always uses plane (t, f), masking to b bits IS the b-bit index:
# the width sweep below audits the exact live configurations.
#
# At fixture scale: n=500 -> 8 bits, n=2000 -> 10 bits (the sweep's
# measured optimum). When n outgrows ND_FILL_TARGET * 2^bits the width
# rides its cap and mean bucket fill — hence candidates/vector — grows
# linearly with n again: the round-7 sf1 soak MEASURED this (n=20k
# wants 14 bits; capped at 12, fill hit ~4.9 vs target 2 and knn_join's
# decade step blew out to 46x). But width alone is not enough: recall
# at a fixed probe budget FALLS with width (a near pair has more bits
# to disagree on — measured at sf1: 12 bits/8 tables 0.75, 14 bits/8
# tables 0.52, and probe expansion has flat returns: tripling directed
# probes bought back only +0.07). The dial that holds recall at wider
# widths is MORE TABLES — 1 - (1 - q)^T compounding (measured at sf1
# with the production planes: 14 bits: T=8 0.45, T=16 0.72 — above the
# 12-bit/8-table config's 0.667 at 1.6x fewer unique candidates, 2090
# vs 3364 pairs/vector, and the 0.1->1 decade slope bends 3.8x -> 2.4x).
# Probe richness stays load-bearing at 16 tables (exact+H1 only: 0.35),
# so the directed H2/H3 set is not trimmed. So BOTH dials derive from
# the live corpus count inside the plan:
#     nd_bits   = clamp(ceil(log2(n / ND_FILL_TARGET)), 4, 16)
#     nd_tables = clamp(ND_BANDS_MIN + 2 (nd_bits - 10), 8, 16)
# Tables above nd_tables and bits above ND_BASE_BITS are LAZY: their
# plane dots sit behind row-level CASE gates on the broadcast config,
# so a small corpus pays exactly the round-6 cost (8 tables x 12 dots)
# and produces bit-identical results (the (t<8, f<12) plane layout is
# frozen below). Beyond 16-bit/16-table saturation (n ~ 1e5) the
# hot-bucket cap ND_MAX_BUCKET still bounds the join; widening further
# is the documented index-build knob (linear cost per extra bit/table).
# The probe side emits, per (vector, ACTIVE table),
#     1 + nd_bits + C(min(nd_bits, ND_PROBE_K), 2)
#       + C(min(nd_bits, ND_PROBE_K3), 3)
# keys (exact + every Hamming-1 flip + query-directed H2 pairs + H3
# triples — 49 at 10 bits with K=8/K3=5); the build side stays
# exact, so the join is a plain equi-join on (table, bucket) —
# O(n · tables · probes) shuffle, never all-pairs.
ND_BANDS = 16  # static table columns (t0..t15); activity is runtime-derived
ND_BANDS_MIN = 8  # tables active at small corpora (the round-6 config)
ND_BASE_BITS = 12  # always-computed dot prefix per table (the round-6 cap)
ND_MIN_BITS = 4
ND_MAX_BITS = 16
ND_FILL_TARGET = 2  # target mean bucket fill per table at the derived width
# hot-bucket cap on the build side of the LSH bucket join (see the guard
# in q_neardup_embedding; same discipline as dedup.MAX_BAND_BUCKET)
ND_MAX_BUCKET = 256
# Plane layout: round 6 assigned plane (t * 12 + f) to (table t, bit f)
# for t < 8, f < 12 — that mapping is FROZEN at indices 0..95, and the
# widened region (bits 12..15 of tables 0..7, all bits of tables 8..15)
# APPENDS in deterministic (t, f) order. Widening the index therefore
# never re-randomizes planes already baked into production signatures:
# an incremental reindex at a wider config keeps every existing prefix.
_ND_PLANE_IDX: dict[tuple[int, int], int] = {}
for _t in range(8):
    for _f in range(12):
        _ND_PLANE_IDX[(_t, _f)] = _t * 12 + _f
for _t in range(ND_BANDS):
    for _f in range(ND_MAX_BITS):
        if (_t, _f) not in _ND_PLANE_IDX:
            _ND_PLANE_IDX[(_t, _f)] = len(_ND_PLANE_IDX)
_ND_PLANES = _mk_planes(len(_ND_PLANE_IDX))


def _nd_tables_expr(bits: str) -> str:
    """Engine-neutral derived table count: 2 more tables per band bit
    past 10, clamped to [ND_BANDS_MIN, ND_BANDS] — the measured recall
    dial (see the index comment)."""
    return f"least({ND_BANDS}, greatest({ND_BANDS_MIN}, {ND_BANDS_MIN} + 2 * ({bits} - 10)))"


def _nd_bits_case(n_col: str) -> str:
    """Engine-neutral integer CASE ladder: the smallest b in
    [ND_MIN_BITS, ND_MAX_BITS] with n <= ND_FILL_TARGET * 2^b. Pure
    integer comparisons — Spark and DuckDB can never disagree the way a
    ceil(log2(x)) at an exact power of two could."""
    cases = " ".join(
        f"WHEN {n_col} <= {ND_FILL_TARGET * (1 << b)} THEN {b}"
        for b in range(ND_MIN_BITS, ND_MAX_BITS)
    )
    return f"(CASE {cases} ELSE {ND_MAX_BITS} END)"


def nd_recommended_bits(n: int) -> int:
    """Python twin of ``_nd_bits_case`` — the corpus-count-derived band
    width a standing index SHOULD run at: smallest b in
    [ND_MIN_BITS, ND_MAX_BITS] with n <= ND_FILL_TARGET * 2^b (the
    ladder's floor for n = 0). Used by operators/ann_index to stamp the
    policy width into the index meta and to raise the freshness audit's
    ``stale_width`` flag when the live corpus crosses the next width
    threshold (r11 verdict item 3: the lsh_width_sweep dial, applied)."""
    for b in range(ND_MIN_BITS, ND_MAX_BITS):
        if n <= ND_FILL_TARGET * (1 << b):
            return b
    return ND_MAX_BITS


# Query-directed multi-probe (Lv et al., "Multi-Probe LSH", VLDB 2007):
# wider bands cut bucket fill but also cut the chance a near pair agrees
# on EVERY bit, so the probe set must grow with the width. Blind
# Hamming-2 (all C(b,2) double flips) buys recall back at ~5x probe
# volume; the measured fix is to flip only among the bits whose
# hyperplane dots sit NEAREST ZERO — the bits a near-boundary vector
# actually risks disagreeing on. Probe count per (vector, table):
# 1 exact + nd_bits single flips + C(ND_PROBE_K, 2) directed double
# flips + C(ND_PROBE_K3, 3) directed triple flips — ~constant in
# nd_bits, so per-vector candidate volume grows O(log^2 n) with the
# corpus instead of the saturated index's O(n / 2^b).
#
# Round-6 measured matrix at sf0.1 (n=2000, nd_bits=10; r5 baseline =
# fixed 6 bits, blind Hamming-1: recall 0.900 at 1201 pairs/vector):
#   blind H1             recall 0.417 @ 195 pairs/vec
#   blind H2             recall 0.850 @ 755
#   K2=8 directed H2     recall 0.833 @ 692
#   K2=8, K3=4 + H3      recall 0.867 @ 775
#   K2=8, K3=5 + H3      recall 0.900 @ 881   <- chosen: r5 recall held,
#     1.4x fewer candidates at sf0.1, 0.983 recall at sf0.01, and the
#     0.01 -> 0.1 per-vector growth is 2.1x (vs r5's 4.0x).
# At nd_bits <= K2 this degrades gracefully to blind radius-2/3 (the
# boundary slice just returns every active bit).
ND_PROBE_K = 8  # H2 flips among the K nearest-boundary bits
ND_PROBE_K3 = 5  # H3 flips among the K3 nearest-boundary bits

# probe-key list for one (table, bucket) row: requires columns `v` (the
# masked bucket), `pb` (the boundary-bit index array, nearest-zero
# first), and `nd_bits`. size(pb) >= min(ND_MIN_BITS, ND_PROBE_K) >= 4,
# so no sequence below ever runs start > stop (Spark would generate a
# DESCENDING sequence, not an empty one).
_ND_PROBE_KEYS = (
    "concat("
    "array(v), "
    "transform(sequence(0, nd_bits - 1), f -> v ^ shiftleft(1, f)), "
    "flatten(transform(sequence(0, size(pb) - 2), i -> "
    "transform(sequence(i + 1, size(pb) - 1), j -> "
    "v ^ shiftleft(1, element_at(pb, i + 1)) ^ shiftleft(1, element_at(pb, j + 1))))), "
    f"flatten(flatten(transform(sequence(0, least({ND_PROBE_K3}, size(pb)) - 3), i -> "
    f"transform(sequence(i + 1, least({ND_PROBE_K3}, size(pb)) - 2), j -> "
    f"transform(sequence(j + 1, least({ND_PROBE_K3}, size(pb)) - 1), k -> "
    "v ^ shiftleft(1, element_at(pb, i + 1)) ^ shiftleft(1, element_at(pb, j + 1))"
    " ^ shiftleft(1, element_at(pb, k + 1))))))))"
)

# cosine(a, b) with double accumulation, as a Spark SQL expression
def _dot_spark(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"0D, (acc, v) -> acc + v)"
    )


def _norm_spark(a: str) -> str:
    return f"sqrt(aggregate({a}, 0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"


def _cos_spark(a: str, b: str) -> str:
    return f"round({_dot_spark(a, b)} / ({_norm_spark(a)} * {_norm_spark(b)}), 6)"


def _cos_duck(a: str, b: str) -> str:
    dot = f"list_sum(list_transform(generate_series(1, 64), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
    na = f"sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"
    nb = f"sqrt(list_sum(list_transform({b}, x -> x::DOUBLE * x::DOUBLE)))"
    return f"ROUND({dot} / ({na} * {nb}), 6)"


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def q_ann_bruteforce(spark, sf_dir):
    """Exact cosine top-10 neighbors of vec_id 0. Broadcast the 1-row query
    side; Catalyst plans BroadcastNestedLoopJoin + TakeOrdered."""
    emb = _emb(spark, sf_dir)
    query = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(query)
        .select("vec_id", F.expr(_cos_spark("embedding", "qv")).alias("score"))
        .orderBy(F.desc("score"), "vec_id")
        .limit(10)
    )


def _assign_expr(cent_rows) -> str:
    """Map-side nearest-centroid assignment as ONE projection expression.

    Since round 8 the LIVE assignment path is the Arrow numpy kernel
    (`_assign_df` / `_assign_batches`): with the corpus-derived codebook
    (k up to KMEANS_K_CAP) this k x dim HOF projection costs O(k * dim)
    lambda dispatches per row — the same HOF-vs-kernel trade the LSH
    signature block went through in round 7. This SQL form is kept as
    the kernel's pinned same-engine bit-identity reference
    (tests/test_similarity_props.py) and stays the DuckDB twin's shape.

    The trained centroid table is k x dim (tiny); inlining it as literals
    and taking ``array_min`` over (d, cluster) structs computes the
    argmin — smallest distance, cluster-id tiebreak, exactly the
    lexicographic struct order — with NO row blowup and NO shuffle. The
    r2 version crossJoined k copies of every embedding and ranked them
    with a row_number window: a k× scan inflation plus a full shuffle of
    the embedding column, per Lloyd round, at 100 TB. Distances keep the
    bit-identical left-fold of `_sq_dist_spark` so argmin ties can't
    diverge from the DuckDB twin; centroid literals round-trip exactly
    (shortest-repr doubles).

    Zero centroids (an EMPTY corpus — the seed collect returned no rows)
    degrades to a typed null: `array_min(array())` is VOID in Spark and
    the `.cluster` extraction is an AnalysisException, but the projection
    only ever runs over the same zero rows the seed came from, so a null
    assignment is vacuously correct and the query yields empty output
    instead of crashing (round-7 empty-fixture sweep)."""
    if not cent_rows:
        return "cast(null as int)"
    return f"array_min(array({_centroid_structs(cent_rows)})).cluster"


def _centroid_structs(cent_rows) -> str:
    """(d, cluster) structs over the inlined centroid literals — shared by
    the argmin assignment and the multi-probe cluster ranking."""
    structs = []
    for cluster, cv in cent_rows:
        arr = ", ".join(f"CAST({float(v)!r} AS DOUBLE)" for v in cv)
        d = _sq_dist_spark("embedding", f"array({arr})")
        structs.append(f"named_struct('d', {d}, 'cluster', {int(cluster)})")
    return ", ".join(structs)


def _probe_clusters_expr(cent_rows, nprobe: int) -> str:
    """The ``nprobe`` nearest cluster ids as an array: full struct sort on
    (d, cluster) — the same lexicographic order as the argmin, so probe
    rank 1 is always the vector's own cluster. Zero centroids (empty
    corpus) degrades to a typed empty array for the same vacuous-truth
    reason as `_assign_expr`."""
    if not cent_rows:
        return "cast(array() as array<int>)"
    return (
        f"transform(slice(array_sort(array({_centroid_structs(cent_rows)})), "
        f"1, {nprobe}), s -> s.cluster)"
    )


def q_ann_ivf(spark, sf_dir):
    """IVF probe against the TRAINED quantizer: the coarse centroids are
    the k-means output (`_kmeans_fit`, KMEANS_ITERS Lloyd rounds), not raw
    seed vectors — the honest IVF contract. Every vector is assigned to
    its nearest trained centroid map-side (the Arrow argmin kernel
    `_assign_batches` — no crossJoin blowup, no window shuffle); the
    probe then ranks the query's cluster only, by exact cosine. The
    codebook size k is CORPUS-DERIVED since round 8 (`_derived_k`:
    ceil(n / IVF_FILL_TARGET), clamped) so mean cell size — hence
    per-query candidate volume — stays ~constant as the corpus grows
    (the r7 sf1 soak measured the fixed k=8 toy's candidates growing
    6.7x per decade as n/k). At 1000 executors the assignment runs at
    scan speed and the probe touches ~nprobe/k of the data."""
    return _ivf_probe(spark, sf_dir, nprobe=1)


IVF_NPROBE = 2


def _ivf_probe(spark, sf_dir, nprobe: int):
    """Shared IVF body: train, assign map-side, rank the query's nprobe
    nearest cells, cosine-rank their members. nprobe=1 degenerates to the
    classic single-cell probe because probe rank 1 is the argmin cluster
    by construction (same (d, cluster) struct order in both expressions)."""
    emb = _emb(spark, sf_dir)
    cent_rows, _ = _kmeans_fit(emb)
    assigned = _assign_df(emb, cent_rows)
    query = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qv"),
            F.expr(_probe_clusters_expr(cent_rows, nprobe)).alias("q_probes"),
        )
    )
    return (
        assigned.crossJoin(query)
        .filter(
            F.array_contains("q_probes", F.col("cluster")) & (F.col("vec_id") != 0)
        )
        .select(
            "vec_id",
            "cluster",
            F.expr(_cos_spark("embedding", "qv")).alias("score"),
        )
        .orderBy(F.desc("score"), "vec_id")
        .limit(5)
    )


def q_ann_ivf_multiprobe(spark, sf_dir):
    """IVF with nprobe=2 — the recall/latency dial of the IVF design: a
    query near a Voronoi boundary misses true neighbors that fall in the
    adjacent cell, and probing the ``nprobe`` nearest cells buys that
    recall back for proportional probe cost. The query row ranks ALL k
    centroids in one projection (full struct sort over the same inlined
    literals as the argmin — rank 1 is its own cluster by construction)
    and the probe filter becomes array_contains(q_probes, cluster); the
    scan/assignment cost is unchanged from q_ann_ivf (`_ivf_probe` is the
    shared body), the probe touches nprobe/k of the data instead of 1/k."""
    return _ivf_probe(spark, sf_dir, nprobe=IVF_NPROBE)


def _nd_dot_spark_one(t: int, f: int) -> str:
    plane = _ND_PLANES[_ND_PLANE_IDX[(t, f)]]
    arr = ", ".join(f"{v:.1f}D" for v in plane)
    return (
        f"aggregate(zip_with(embedding, array({arr}), "
        f"(x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)"
    )


def _nd_dots_spark(t: int) -> str:
    """Table-``t``'s ND_MAX_BITS hyperplane dots as one array expression
    (bit f always uses plane (t, f)). Left-fold double accumulation,
    bit-identical to the DuckDB twin so an ulp can never flip a sign at a
    bucket boundary — and, since round 6, can never reorder the
    boundary-bit ranking the query-directed probes derive from |dot|.
    UNGATED (all ND_MAX_BITS dots) — the width sweep masks it directly.
    The LIVE index path is the Arrow numpy kernel (`_nd_sig_batches`);
    this SQL fold and `_nd_dots_spark_gated` are its pinned bit-identity
    references (tests/test_lsh_kernel.py)."""
    dots = [_nd_dot_spark_one(t, f) for f in range(ND_MAX_BITS)]
    return f"array({', '.join(dots)})"


def _nd_dots_spark_gated(t: int) -> str:
    """SQL-fold reference for the LIVE numpy signature kernel
    (`_nd_sig_batches`): the gated per-table dot array — bits past
    ND_BASE_BITS compute only when the corpus-derived ``nd_bits`` needs
    them (row-level CASE — Spark evaluates the branch lazily), and
    tables past ND_BANDS_MIN only when ``nd_tables`` activates them
    (whole array NULL otherwise). Not used in any registered plan since
    the round-7 Arrow kernel; kept as the same-engine bit-identity
    oracle tests/test_lsh_kernel.py pins the kernel against (the DuckDB
    twin `_nd_dots_duck_gated` is the cross-engine one). Requires
    ``nd_bits``/``nd_tables`` in scope (the `_nd_cfg` broadcast)."""
    lo = [_nd_dot_spark_one(t, f) for f in range(ND_BASE_BITS)]
    hi = [_nd_dot_spark_one(t, f) for f in range(ND_BASE_BITS, ND_MAX_BITS)]
    arr = (
        f"concat(array({', '.join(lo)}), "
        f"CASE WHEN nd_bits > {ND_BASE_BITS} THEN array({', '.join(hi)}) "
        f"ELSE array_repeat(CAST(NULL AS DOUBLE), {ND_MAX_BITS - ND_BASE_BITS}) END)"
    )
    if t >= ND_BANDS_MIN:
        arr = f"CASE WHEN nd_tables > {t} THEN {arr} ELSE CAST(NULL AS ARRAY<DOUBLE>) END"
    return arr


def _nd_bucket_from_dots(d: str) -> str:
    """nd_bits-wide sign bucket from a dot array (Spark): fold only the
    ACTIVE bits, so the masked bucket is built directly."""
    return (
        f"aggregate(sequence(0, nd_bits - 1), 0, (acc, f) -> "
        f"acc + CASE WHEN element_at({d}, f + 1) > 0D THEN shiftleft(1, f) ELSE 0 END)"
    )


def _nd_boundary_from_dots(d: str) -> str:
    """The ND_PROBE_K active-bit indices nearest the hyperplane boundary
    (smallest |dot|; bit index breaks ties — both engines sort the same
    (|dot|, f) struct lexicographically), nearest first."""
    return (
        f"transform(slice(array_sort(transform(sequence(0, nd_bits - 1), "
        f"f -> struct(abs(element_at({d}, f + 1)) AS a, f AS f))), 1, {ND_PROBE_K}), "
        f"s -> s.f)"
    )


def _nd_dots_duck(t: int) -> str:
    dots = [_nd_dot_duck_one(t, f) for f in range(ND_MAX_BITS)]
    return f"[{', '.join(dots)}]"


def _nd_dot_duck_one(t: int, f: int) -> str:
    plane = _ND_PLANES[_ND_PLANE_IDX[(t, f)]]
    prods = " + ".join(
        f"embedding[{i + 1}]::DOUBLE * {v:.1f}" for i, v in enumerate(plane)
    )
    return f"({prods})"


def _nd_dots_duck_gated(t: int) -> str:
    """DuckDB twin of `_nd_dots_spark_gated` — identical lazy gating on
    the cfg-derived nd_bits/nd_tables."""
    lo = [_nd_dot_duck_one(t, f) for f in range(ND_BASE_BITS)]
    hi = [_nd_dot_duck_one(t, f) for f in range(ND_BASE_BITS, ND_MAX_BITS)]
    nulls = ", ".join(
        ["CAST(NULL AS DOUBLE)"] * (ND_MAX_BITS - ND_BASE_BITS)
    )
    arr = (
        f"list_concat([{', '.join(lo)}], "
        f"CASE WHEN nd_bits > {ND_BASE_BITS} THEN [{', '.join(hi)}] "
        f"ELSE [{nulls}] END)"
    )
    if t >= ND_BANDS_MIN:
        arr = f"CASE WHEN nd_tables > {t} THEN {arr} ELSE CAST(NULL AS DOUBLE[]) END"
    return arr


def _nd_bucket_from_dots_duck(d: str) -> str:
    # CAST: DuckDB's list_sum widens to HUGEINT, which its xor()/
    # list_concat() overloads reject — and the Spark twin is 32-bit
    return (
        f"CAST(list_sum(list_transform(range(0, nd_bits), "
        f"f -> CASE WHEN {d}[f + 1] > 0 THEN (1 << f) ELSE 0 END)) AS BIGINT)"
    )


def _nd_boundary_from_dots_duck(d: str) -> str:
    return (
        f"list_transform(list_slice(list_sort(list_transform(range(0, nd_bits), "
        f"f -> {{'a': abs({d}[f + 1]), 'f': f}})), 1, {ND_PROBE_K}), s -> s.f)"
    )


def _nd_probes(sigs, id_alias: str, extra: tuple[str, ...] = ()):
    """(id, *extra, tab, bv) probe rows from a ``_nd_sigs`` frame: one
    row per (vector, table, probe key) — exact bucket, every Hamming-1
    flip, the query-directed Hamming-2 pairs, AND the query-directed
    Hamming-3 triples of `_ND_PROBE_KEYS`:
    1 + nd_bits + C(min(nd_bits, ND_PROBE_K), 2)
    + C(min(nd_bits, ND_PROBE_K3), 3) keys per (vector, table)."""
    structs = ", ".join(f"struct(t{t} AS v, p{t} AS pb)" for t in range(ND_BANDS))
    return (
        sigs.select(
            F.col("vec_id").alias(id_alias),
            *extra,
            "nd_bits",
            F.posexplode(F.expr(f"array({structs})")).alias("tab", "s"),
        )
        .select(
            id_alias,
            *extra,
            "tab",
            "nd_bits",
            F.col("s.v").alias("v"),
            F.col("s.pb").alias("pb"),
        )
        # inactive tables (t >= nd_tables) carry NULL buckets — drop them
        # BEFORE the probe-key explode
        .filter(F.col("v").isNotNull())
        .select(id_alias, *extra, "tab", F.explode(F.expr(_ND_PROBE_KEYS)).alias("bv"))
    )


def _nd_cfg(emb):
    """The 1-row broadcast index config: ``nd_bits`` AND ``nd_tables``
    derived from the live corpus count. groupBy().agg() yields exactly
    one row even on an empty corpus, so the crossJoin is always a
    broadcast scalar attachment."""
    return F.broadcast(
        emb.groupBy()
        .agg(F.count("*").alias("nd_n"))
        .select(F.expr(_nd_bits_case("nd_n")).alias("nd_bits"))
        .select("nd_bits", F.expr(_nd_tables_expr("nd_bits")).alias("nd_tables"))
    )


def _nd_sigs(emb, cols: list[str], cfg=None, emit_dots: bool = False,
             barrier: bool = True):
    """Per-table masked bucket values ``t0..`` and boundary-bit arrays
    ``p0..`` plus the derived ``nd_bits``/``nd_tables``, materialized
    once (localCheckpoint): the plane dots are the most expensive
    per-row work in every index consumer, and the exact/probe branches
    of the bucket self-join would otherwise each recompute the whole dot
    subtree. Inactive tables (t >= nd_tables) carry NULL buckets/
    boundaries — every consumer filters them after its table explode.
    Materialized it is (n x ~(16 ints + 16 tiny int arrays)) — trivial
    at any scale. ``barrier=False`` skips the checkpoint for callers
    that consume the signature frame exactly ONCE (a persisted-index
    build's observe→write, the incremental gate's probe explode, the
    widen audit's scratch join): there the barrier dedups nothing and
    only adds an eager Catalyst planning + kernel-stage pass at build
    time (r13, the khop last-hop precedent).

    Round 7: the dot/bucket/boundary block is an Arrow-vectorized numpy
    kernel (`mapInPandas`), not SQL higher-order functions. HOFs never
    enter whole-stage codegen — they evaluate per-element with lambda
    dispatch — and the measured cost at the sf1 soak was ~1.9 ms/row
    (37 s for 20k rows) for what is 16k fused multiply-adds; a fully
    unrolled arithmetic projection was 4x WORSE (the 16k-term tree
    overflows codegen into interpreted eval). The kernel accumulates in
    EXACT left-fold order (one vectorized pass per dimension, acc
    starting at 0.0), so every dot is bit-identical to the SQL fold the
    DuckDB twin still runs — a sign at a bucket boundary, and the
    |dot| boundary-bit ranking, can never differ between the engines."""
    sig_fields = ", ".join(
        [f"t{t} int" for t in range(ND_BANDS)]
        + [f"p{t} array<int>" for t in range(ND_BANDS)]
        + ([f"d{t} array<double>" for t in range(ND_BANDS)] if emit_dots else [])
    )
    if cfg is None:
        cfg = _nd_cfg(emb)
    in_df = emb.crossJoin(cfg).select(*cols, "embedding", "nd_bits", "nd_tables")
    passthrough = [
        f"{f.name} {f.dataType.simpleString()}" for f in in_df.schema if f.name in cols
    ]
    schema = ", ".join(passthrough + ["nd_bits int", "nd_tables int", sig_fields])
    out = in_df.mapInPandas(_nd_sig_batches(list(cols), emit_dots=emit_dots), schema)
    return out.localCheckpoint(eager=False) if barrier else out


def _nd_sig_batches(cols: list[str], emit_dots: bool = False):
    """Build the `mapInPandas` kernel for `_nd_sigs` (closure over the
    passthrough column list). Fold-order exactness: `acc += V[:, i] *
    P[i]` adds dimension i's product to every (row, plane) accumulator
    in ascending-i order from 0.0 — element-for-element the same IEEE
    op sequence as `aggregate(zip_with(...), 0D, +)` and the DuckDB
    unrolled sum, so bucket signs and boundary rankings are
    bit-identical across all three implementations.

    ``emit_dots=True`` additionally emits each active table's raw dot
    array ``d{t}`` (array<double>, nd_bits long) — the persisted-index
    build (operators/ann_index) stores them so an incremental WIDEN can
    re-rank boundary bits over old+new dots without recomputing the old
    planes. Each plane column's fold is independent in the accumulator,
    so a subset-of-planes recompute is bit-identical to the fused pass."""
    import numpy as np

    planes = np.empty((EMB_DIM, ND_BANDS * ND_MAX_BITS), dtype=np.float64)
    for t in range(ND_BANDS):
        for f in range(ND_MAX_BITS):
            planes[:, t * ND_MAX_BITS + f] = _ND_PLANES[_ND_PLANE_IDX[(t, f)]]

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            nd_bits = int(pdf["nd_bits"].iloc[0])
            nd_tables = int(pdf["nd_tables"].iloc[0])
            v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            acc = np.zeros((n, ND_BANDS * ND_MAX_BITS), dtype=np.float64)
            for i in range(EMB_DIM):
                acc += v[:, i : i + 1] * planes[i]
            out = {c: pdf[c] for c in cols}
            out["nd_bits"] = np.full(n, nd_bits, dtype=np.int32)
            out["nd_tables"] = np.full(n, nd_tables, dtype=np.int32)
            weights = (1 << np.arange(nd_bits, dtype=np.int64)).astype(np.int32)
            k = min(ND_PROBE_K, nd_bits)
            for t in range(ND_BANDS):
                if t >= nd_tables:
                    out[f"t{t}"] = pd.array([None] * n, dtype="Int32")
                    out[f"p{t}"] = pd.Series([None] * n, dtype=object)
                    if emit_dots:
                        out[f"d{t}"] = pd.Series([None] * n, dtype=object)
                    continue
                d = acc[:, t * ND_MAX_BITS : t * ND_MAX_BITS + nd_bits]
                out[f"t{t}"] = ((d > 0.0).astype(np.int32) @ weights).astype(
                    np.int32
                )
                a = np.abs(d)
                # (|dot| asc, bit asc): argsort per row, stable on the
                # pre-sorted bit index — matches array_sort(struct(a, f))
                order = np.argsort(a, axis=1, kind="stable")[:, :k].astype(
                    np.int32
                )
                out[f"p{t}"] = pd.Series(list(order))
                if emit_dots:
                    out[f"d{t}"] = pd.Series(list(d))
            yield pd.DataFrame(out)

    return kernel


def q_neardup_embedding(spark, sf_dir):
    """Semantic near-dup pairs (same label, cosine >= 0.45), candidates
    from the multi-table multi-probe hyperplane-LSH index — the scale
    path that replaces the round-1 label block (near-quadratic per block
    at 100 TB). Probe side explodes each vector to ND_BANDS tables x
    [1 + nd_bits + C(min(nd_bits, ND_PROBE_K), 2)
    + C(min(nd_bits, ND_PROBE_K3), 3)] probe keys (exact bucket, every
    Hamming-1 flip, and the query-directed H2/H3 flips among the
    nearest-boundary bits; nd_bits corpus-derived — see the index
    comment at the top; 49 keys/table at 10 bits, 55 at the 16-bit cap —
    the price of holding recall at the wider band);
    build side keeps exact buckets; candidates dedup before the
    exact-cosine verification. Same-label remains a semantic filter on
    the pair, not a join block."""
    emb = _emb(spark, sf_dir)
    # candidate generation carries ONLY (ids, label, band keys) — the
    # embedding arrays would multiply the candidate shuffle ~30x; they are
    # re-attached by two linear equi-joins after the pair dedup. label is a
    # join key (the oracle's cand constrains it too), cutting the bucket
    # join by the label cardinality before any row exists.
    sigs = _nd_sigs(emb, ["vec_id", "label"])
    exact = sigs.select(
        F.col("vec_id").alias("vec_b"),
        "label",
        F.posexplode(F.array(*[f"t{t}" for t in range(ND_BANDS)])).alias("tab", "bv"),
    ).filter(F.col("bv").isNotNull())
    # hot-bucket guard (same df-cap discipline as dedup.MAX_BAND_BUCKET):
    # the probe x build join is |probes| x |bucket| on a degenerate bucket
    # (mass-duplicated embeddings collapse into one bucket in EVERY table,
    # making candidates quadratic). Capping the BUILD side bounds the
    # output at |probes| x cap — linear in the hot-bucket size — while
    # natural buckets (measured max 16 at sf0.1) never hit the cap.
    # Mass-identical vectors are exact-dedup's job, not the LSH index's.
    # One partitioned-window count on the join key; both engines cap
    # identically so the oracle stays value-exact.
    bucket_w = Window.partitionBy("tab", "bv", "label")
    exact = (
        exact.withColumn("bdf", F.count("*").over(bucket_w))
        .filter(F.col("bdf") <= ND_MAX_BUCKET)
        .drop("bdf")
    )
    return _neardup_from_index(emb, sigs, exact)


def _neardup_from_index(emb, sigs, exact):
    """The label-constrained near-dup pair pipeline over an index given
    as (sigs, capped exact-bucket rows) — shared by q_neardup_embedding
    (in-plan index) and the persisted-index twin (operators/ann_index)."""
    probes = _nd_probes(sigs, "vec_a", extra=("label",))
    # canonicalize to unordered pairs: query-directed probing is not
    # symmetric (a's boundary bits are not b's), so a pair can be reached
    # from either side — least/greatest keeps it once regardless of which
    # direction found it (a plain vec_a < vec_b filter would drop pairs
    # only the larger id's probes discover)
    cand = (
        probes.join(exact, ["tab", "bv", "label"])
        .filter(F.col("vec_a") != F.col("vec_b"))
        .select(
            "label",
            F.least("vec_a", "vec_b").alias("vec_a"),
            F.greatest("vec_a", "vec_b").alias("vec_b"),
        )
        .distinct()
    )
    # norms are per-VECTOR quantities: compute them once on the n-row side
    # of the re-attach joins instead of re-folding both arrays per PAIR —
    # the candidate set is >> n, so this cuts the pair-grain folds 3 -> 1.
    # Bit-identical to the inline-cosine form (same values, same ops, the
    # fold just runs on the vector grain), so the DuckDB twin is unchanged.
    ea = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.expr(_norm_spark("embedding")).alias("norm_a"),
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.expr(_norm_spark("embedding")).alias("norm_b"),
    )
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "label",
            "vec_a",
            "vec_b",
            F.expr(f"round({_dot_spark('ea', 'eb')} / (norm_a * norm_b), 6)").alias(
                "score"
            ),
        )
        .filter(F.col("score") >= NEARDUP_COSINE)
    )


KNN_K = 3  # neighbors returned per query vector


def q_knn_join(spark, sf_dir):
    """Batch k-NN join: top-KNN_K approximate neighbors for EVERY vector
    (the RAG/embedding-enrichment primitive: one pass annotates the whole
    corpus with its neighbor lists), candidates from the same
    corpus-width (tables AND bits count-derived) multi-probe sign-LSH
    index as neardup_embedding but with NO label constraint and both
    directions ranked — vec a lists b even when b's own list omits a.

    Plan shape is the index discipline proven on neardup: signatures
    materialize once (localCheckpoint), the bucket join carries only
    (ids, band keys), hot build-side buckets cap at ND_MAX_BUCKET, and
    embeddings re-attach by two linear equi-joins AFTER the candidate
    dedup with per-vector (not per-pair) norm folds. The final top-k is
    a per-vector window over candidate-sized groups — never a global
    sort. At 100 TB: O(n · tables · probes) candidate shuffle, and the
    recall/cost dial is (tables, band bits, probes), same as the index
    it reuses. Vectors whose buckets are empty after the cap emit no
    rows (they have no measured neighbors)."""
    return _knn_topk(_emb(spark, sf_dir))


def _knn_topk(emb, probe_max: int | None = None, sigs=None, exact=None):
    """(vec_id, nn_rank, neighbor_id, score) — see q_knn_join. With
    ``probe_max`` the PROBE side restricts to vec_id < probe_max (the
    recall audit's fixed query sample) while the build side stays the
    full corpus. ``sigs``/``exact`` inject a persisted index (see
    _knn_scored_pairs)."""
    scored = _knn_scored_pairs(emb, probe_max, sigs=sigs, exact=exact)
    w = Window.partitionBy("vec_a").orderBy(F.desc("score"), "vec_b")
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= KNN_K)
        .select(
            F.col("vec_a").alias("vec_id"),
            "nn_rank",
            F.col("vec_b").alias("neighbor_id"),
            "score",
        )
    )


def _knn_scored_pairs(emb, probe_max: int | None = None, sigs=None, exact=None,
                      probe_filter=None, cross_label=None):
    """Directed (vec_a, vec_b, score) over the LSH candidate set — the
    shared half of q_knn_join and q_hard_negative_mining. ``sigs`` /
    ``exact`` inject a PREBUILT index (operators/ann_index's persisted
    signatures and capped band table) so a standing index replaces the
    in-plan signature build with a Parquet scan; defaults rebuild both
    in-plan (identical rows, so the two forms are result-identical —
    pinned by tests/test_ann_index.py). ``probe_filter`` (a boolean
    Column) restricts the PROBE side to an arbitrary query panel — the
    general form of ``probe_max``'s prefix panel (round 10: the
    embedding decontamination probes only the eval slice; probing the
    full corpus to then keep train x eval rows cost 11x/decade at the
    sf1 soak for candidates the filter immediately discarded).

    ``cross_label`` (a (vec_id, label) frame) keeps only CROSS-label
    pairs and adds ``label_a``/``label_b`` to the output — the
    hard-negative-mining constraint. The label frame MUST cover every
    vec_id that can appear in a candidate pair: the label attach uses
    INNER joins, so a candidate whose id is missing from the frame is
    silently dropped, not passed through (safe for the current caller —
    labels come from the same emb frame — a trap for a future caller
    passing a partial label table; ADVICE r12). The filter is pushed
    BELOW the embedding re-attach joins and the cosine fold (guide §2.3: the dropped
    same-label pairs — ~1/|labels| of the candidate set — previously
    flowed through both 64-dim-array joins, the scoring stage, and the
    mirror union before the filter saw them). The predicate is
    symmetric in the pair, so filtering the canonical half before
    scoring keeps exactly the pairs the post-mirror filter kept."""
    if sigs is None:
        sigs = _nd_sigs(emb, ["vec_id"])
    if exact is None:
        exact = sigs.select(
            F.col("vec_id").alias("vec_b"),
            F.posexplode(F.array(*[f"t{t}" for t in range(ND_BANDS)])).alias(
                "tab", "bv"
            ),
        ).filter(F.col("bv").isNotNull())
        # NOTE (r12, measured): the lsh_candidate_stats aggregate-join cap
        # does NOT transfer here — that audit already aggregates bucket
        # sizes for its stats row, so the cap rode a table it had to build
        # anyway. Rebuilding bsz just for the cap re-explodes the
        # signature table and costs a second (tab, bv) pass: knn_join solo
        # 11.4 s vs 2.8 s with the one-shuffle count-window below (whose
        # (tab, bv) exchange the candidate join then reuses).
        bucket_w = Window.partitionBy("tab", "bv")
        exact = (
            exact.withColumn("bdf", F.count("*").over(bucket_w))
            .filter(F.col("bdf") <= ND_MAX_BUCKET)
            .drop("bdf")
        )
    probe_src = sigs
    if probe_max is not None:
        probe_src = probe_src.filter(F.col("vec_id") < probe_max)
    if probe_filter is not None:
        probe_src = probe_src.filter(probe_filter)
    probes = _nd_probes(probe_src, "vec_a")
    # Candidates canonicalize to unordered pairs (least/greatest): each
    # pair's cosine is computed ONCE, then the scored rows mirror —
    # halving the 64-dim fold work and the re-attach join volume. This
    # also DEFINES the candidate set as "either direction probed it",
    # which matters since round 6: query-directed probing is asymmetric
    # (a's boundary bits are not b's). Full-corpus runs (probe_max=None)
    # rank both directions; a restricted probe panel keeps only rows
    # whose query side is in the panel after the mirror.
    cand = (
        probes.join(exact, ["tab", "bv"])
        .filter(F.col("vec_a") != F.col("vec_b"))
        .select(
            F.least("vec_a", "vec_b").alias("vec_a"),
            F.greatest("vec_a", "vec_b").alias("vec_b"),
        )
        .distinct()
    )
    lab_cols = []
    if cross_label is not None:
        # labels attach to the id-only candidate grain (narrow rows,
        # post-dedup) and the symmetric cross-label filter runs HERE —
        # before the array-carrying joins and the fold below ever see
        # the same-label pairs they'd otherwise score and discard.
        la = cross_label.select(
            F.col("vec_id").alias("vec_a"), F.col("label").alias("label_a")
        )
        lb = cross_label.select(
            F.col("vec_id").alias("vec_b"), F.col("label").alias("label_b")
        )
        cand = (
            cand.join(la, "vec_a")
            .join(lb, "vec_b")
            .filter(F.col("label_a") != F.col("label_b"))
        )
        lab_cols = ["label_a", "label_b"]
    ea = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.expr(_norm_spark("embedding")).alias("norm_a"),
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.expr(_norm_spark("embedding")).alias("norm_b"),
    )
    scored_half = cand.join(ea, "vec_a").join(eb, "vec_b").select(
        "vec_a",
        "vec_b",
        *lab_cols,
        F.expr(f"round({_dot_spark('ea', 'eb')} / (norm_a * norm_b), 6)").alias(
            "score"
        ),
    )
    # Mirror by INLINE-exploding each canonical pair into its two
    # directed rows (r13, guide §1.2): the previous self-UNION referenced
    # scored_half twice, which forced a localCheckpoint barrier so the
    # candidate+scoring DAG wouldn't execute per branch — one more eager
    # Catalyst planning + materialization pass on every consumer
    # (knn_join, hard_negative_mining, the persisted-index probes, the
    # recall audit's approx side). inline() emits the identical row set
    # (each pair once per direction, same columns, same values) in ONE
    # linear pass with a single downstream consumer — no barrier needed.
    def _dir_struct(swap: bool):
        a, b = ("vec_b", "vec_a") if swap else ("vec_a", "vec_b")
        fields = [F.col(a).alias("vec_a"), F.col(b).alias("vec_b")]
        if cross_label is not None:
            la, lb = ("label_b", "label_a") if swap else ("label_a", "label_b")
            fields += [F.col(la).alias("label_a"), F.col(lb).alias("label_b")]
        return F.struct(*fields, F.col("score").alias("score"))

    scored = scored_half.select(
        F.inline(F.array(_dir_struct(False), _dir_struct(True)))
    )
    if probe_max is not None:
        scored = scored.filter(F.col("vec_a") < probe_max)
    return scored


# ANN recall audit: fixed query sample size (sf-independent — the audit
# cost is O(|sample| * n) by construction, linear in the corpus).
RECALL_SAMPLE = 20
RECALL_SALT = 16  # phase-1 shards for the exact top-k (source_quota discipline)


def q_ann_recall_audit(spark, sf_dir):
    """Index-quality measurement: recall@KNN_K of the LSH k-NN join
    against the EXACT cosine top-k, for a fixed RECALL_SAMPLE-query
    panel — the number that decides whether (tables, band bits, probes)
    are tuned right before anyone trusts knn_join's output.

    The exact baseline is intentionally the expensive path, bounded by
    the fixed sample: broadcast the sample panel against the corpus
    (map-side cosine, one linear pass), then salted two-phase top-k
    (source_quota's discipline) so no single query's candidates ever
    single-sort — phase 1 ranks within (qid, vec_id % SALT) shards,
    phase 2 ranks the <= SALT*k survivors. The approx side reuses
    _knn_topk with the probe side restricted to the sample (build side
    stays the full corpus). Output per query: exact/approx/overlap
    counts and recall@k."""
    emb = _emb(spark, sf_dir)
    # approx and exact are each consumed by two branches (count + overlap
    # join); without materialization every branch re-executes the whole
    # LSH / broadcast-panel lineage. Both are <= |sample| * k rows.
    approx = (
        _knn_topk(emb, probe_max=RECALL_SAMPLE)
        .select(F.col("vec_id").alias("qid"), F.col("neighbor_id").alias("nid"))
        .localCheckpoint(eager=False)
    )
    queries = emb.filter(F.col("vec_id") < RECALL_SAMPLE).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.expr(_norm_spark("embedding")).alias("qnorm"),
    )
    scored = (
        emb.select(
            "vec_id",
            "embedding",
            F.expr(_norm_spark("embedding")).alias("nrm"),
        )
        .crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.expr(f"round({_dot_spark('embedding', 'qv')} / (nrm * qnorm), 6)").alias(
                "score"
            ),
        )
    )
    order = [F.desc("score"), F.asc("vec_id")]
    w1 = Window.partitionBy("qid", F.col("vec_id") % RECALL_SALT).orderBy(*order)
    phase1 = (
        scored.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= KNN_K)
        .drop("rn1")
    )
    w2 = Window.partitionBy("qid").orderBy(*order)
    exact = (
        phase1.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= KNN_K)
        .select("qid", F.col("vec_id").alias("nid"))
        .localCheckpoint(eager=False)
    )
    ex = exact.groupBy("qid").agg(F.count("*").alias("n_exact"))
    ap = approx.groupBy("qid").agg(F.count("*").alias("n_approx"))
    ov = exact.join(approx, ["qid", "nid"]).groupBy("qid").agg(
        F.count("*").alias("n_overlap")
    )
    return (
        ex.join(ap, "qid", "left")
        .join(ov, "qid", "left")
        .select(
            F.col("qid").alias("vec_id"),
            "n_exact",
            F.coalesce("n_approx", F.lit(0)).alias("n_approx"),
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.round(F.coalesce("n_overlap", F.lit(0)) / F.col("n_exact"), 4).alias(
                "recall_at_k"
            ),
        )
    )


def _nd_sigs_duck(extra_cols: str = "") -> str:
    """Shared DuckDB CTE prefix for the sign-LSH index: cfg (corpus-
    derived band width, same integer CASE ladder as the Spark side) →
    dots (per-table hyperplane dot arrays) → sigs (masked buckets t0..
    plus boundary-bit arrays p0.. for query-directed probing)."""
    return f"""cfg AS (
            SELECT nd_bits, {_nd_tables_expr("nd_bits")} AS nd_tables
            FROM (
                SELECT {_nd_bits_case("nd_n")} AS nd_bits
                FROM (SELECT COUNT(*) AS nd_n FROM embeddings)
            )
        ),
        nd_dots AS (
            SELECT vec_id{extra_cols}, nd_bits, nd_tables,
                   {", ".join(f"{_nd_dots_duck_gated(t)} AS d{t}" for t in range(ND_BANDS))}
            FROM embeddings, cfg
        ),
        sigs AS MATERIALIZED (
            SELECT vec_id{extra_cols}, nd_bits, nd_tables,
                   {", ".join(f"CASE WHEN d{t} IS NULL THEN NULL ELSE {_nd_bucket_from_dots_duck(f'd{t}')} END AS t{t}" for t in range(ND_BANDS))},
                   {", ".join(f"CASE WHEN d{t} IS NULL THEN NULL ELSE {_nd_boundary_from_dots_duck(f'd{t}')} END AS p{t}" for t in range(ND_BANDS))}
            FROM nd_dots
        )"""


# probe-key list for one DuckDB (table, bucket) row — twin of
# _ND_PROBE_KEYS (requires bv, pb, nd_bits in scope)
_ND_PROBE_KEYS_DUCK = (
    "list_concat(list_concat(list_concat([bv], "
    "list_transform(range(0, nd_bits), f -> xor(bv, CAST(1 << f AS BIGINT)))), "
    "flatten(list_transform(range(0, len(pb) - 1), i -> "
    "list_transform(range(i + 1, len(pb)), j -> "
    "xor(xor(bv, CAST(1 << pb[i + 1] AS BIGINT)), CAST(1 << pb[j + 1] AS BIGINT)))))), "
    f"flatten(flatten(list_transform(range(0, least({ND_PROBE_K3}, len(pb)) - 2), i -> "
    f"list_transform(range(i + 1, least({ND_PROBE_K3}, len(pb)) - 1), j -> "
    f"list_transform(range(j + 1, least({ND_PROBE_K3}, len(pb))), k -> "
    "xor(xor(xor(bv, CAST(1 << pb[i + 1] AS BIGINT)), CAST(1 << pb[j + 1] AS BIGINT)), "
    "CAST(1 << pb[k + 1] AS BIGINT))))))))"
)


def _knn_cte(probe_where: str = "", scored_where: str = "") -> str:
    """Shared DuckDB CTE chain for the LSH k-NN join: `_nd_sigs_duck` →
    bands → probes (optionally restricted) → capped buckets →
    canonicalized candidate pairs → scored once per unordered pair →
    mirrored `scored` (optionally restricted post-mirror) → ranked
    `knn`. Twin of `_knn_topk`."""
    return f"""{_nd_sigs_duck()},
        bands AS (
            {" UNION ALL ".join(f"SELECT vec_id, nd_bits, {t} AS tab, t{t} AS bv, p{t} AS pb FROM sigs WHERE t{t} IS NOT NULL" for t in range(ND_BANDS))}
        ),
        probes AS (
            SELECT * FROM (
                SELECT vec_id, tab, u.pbv AS bv
                FROM bands, LATERAL (
                    SELECT UNNEST({_ND_PROBE_KEYS_DUCK}) AS pbv
                ) u
            ) p {probe_where}
        ),
        bands_capped AS (
            SELECT vec_id, tab, bv FROM (
                SELECT vec_id, tab, bv, COUNT(*) OVER (PARTITION BY tab, bv) AS bdf
                FROM bands
            ) WHERE bdf <= {ND_MAX_BUCKET}
        ),
        cand AS (
            SELECT DISTINCT LEAST(a.vec_id, b.vec_id) AS vec_a,
                            GREATEST(a.vec_id, b.vec_id) AS vec_b
            FROM probes a JOIN bands_capped b
              ON a.tab = b.tab AND a.bv = b.bv
             AND a.vec_id != b.vec_id
        ),
        scored_half AS (
            SELECT c.vec_a, c.vec_b,
                   {_cos_duck("ea.embedding", "eb.embedding")} AS score
            FROM cand c
            JOIN embeddings ea ON ea.vec_id = c.vec_a
            JOIN embeddings eb ON eb.vec_id = c.vec_b
        ),
        scored AS (
            SELECT * FROM (
                SELECT vec_a, vec_b, score FROM scored_half
                UNION ALL
                SELECT vec_b AS vec_a, vec_a AS vec_b, score FROM scored_half
            ) m {scored_where}
        ),
        knn AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_a
                                         ORDER BY score DESC, vec_b) AS nn_rank
            FROM scored
        )"""


def q_hard_negative_mining(spark, sf_dir):
    """Hard-negative mining for contrastive training: for every vector,
    the most-similar vector with a DIFFERENT label — the negatives that
    actually teach a metric model, surfaced from the same multi-probe
    sign-LSH index as knn_join (candidates are index hits, so cost stays
    O(n · tables · probes), never label-pair × label-pair). Labels attach
    to the id-only candidate set by two linear equi-joins; the top-1 is a
    per-vector window over candidate-sized groups. Vectors whose capped
    buckets yield no cross-label candidate emit no row (both engines).

    r12 (guide §2.3): the cross-label constraint is pushed into
    ``_knn_scored_pairs`` (its ``cross_label`` seam), so same-label
    pairs drop at the id-grain candidate set — before the embedding
    re-attach joins, the cosine fold, and the mirror union — instead of
    after scoring. The predicate is symmetric in the pair, so the
    surviving (pair, score) rows are exactly the ones the post-scoring
    filter kept; the window input, and hence the result, is unchanged."""
    emb = _emb(spark, sf_dir)
    scored = _knn_scored_pairs(emb, cross_label=emb.select("vec_id", "label"))
    w = Window.partitionBy("vec_a").orderBy(F.desc("score"), "vec_b")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("vec_a").alias("vec_id"),
            F.col("label_a").alias("label"),
            F.col("vec_b").alias("hard_negative_id"),
            F.col("label_b").alias("neg_label"),
            "score",
        )
        .orderBy("vec_id")
    )


CORESET_K = 8


def q_embedding_norm_audit(spark, sf_dir):
    """Embedding-norm drift audit per label: n, mean/std of the L2 norm,
    and how many vectors sit beyond 2 sigma of their label's mean — the
    screen that catches a mis-scaled or collapsed embedding batch before
    it poisons ANN indexes. Two-level aggregation: norms are a narrow
    projection (bit-identical fold), label stats re-aggregate the norm
    grain, outliers count against the broadcast stats."""
    emb = _emb(spark, sf_dir)
    norms = emb.select(
        "vec_id", "label", F.expr(_norm_spark("embedding")).alias("nrm")
    )
    stats = norms.groupBy("label").agg(
        F.count("*").alias("n"),
        F.avg("nrm").alias("mu"),
        F.stddev_samp("nrm").alias("sd"),
    )
    return (
        norms.join(F.broadcast(stats), "label")
        .groupBy("label")
        .agg(
            F.first("n").alias("n"),
            F.round(F.first("mu"), 6).alias("mean_norm"),
            F.round(F.first("sd"), 6).alias("std_norm"),
            # coalesce: for a single-vector label stddev_samp is NULL, so
            # the comparison is NULL per row and a bare SUM would emit
            # NULL while the oracle's CASE ... ELSE 0 emits 0 (ADVICE r4)
            F.sum(
                F.coalesce(
                    (F.abs(F.col("nrm") - F.col("mu")) > 2 * F.col("sd")).cast("int"),
                    F.lit(0),
                )
            ).alias("n_outliers"),
        )
        .orderBy("label")
    )


def q_coreset_kcenter(spark, sf_dir):
    """Greedy k-center coreset selection (farthest-point traversal): the
    CORESET_K vectors that 2-approximate the optimal k-center cover —
    the diversity-sampling pass data-selection pipelines run to pick
    representative training subsets. Seeded at vec_id 0; each round
    computes every vector's distance to the chosen set (one scan, the
    chosen vectors ride along as broadcast literals built from driver
    floats — bit-identical doubles in both engines) and takes the argmax
    (TakeOrdered 1, deterministic (dist DESC, vec_id) tie-break). k-1
    one-row collects total, the k-means scalar discipline. Output:
    selection order, vec id, and the coverage radius at selection (the
    distance that pick closed)."""
    emb = _emb(spark, sf_dir)
    seed_rows = emb.filter(F.col("vec_id") == 0).select("vec_id", "embedding").collect()
    if not seed_rows:
        # empty corpus: no seed to traverse from — empty coreset, not a crash
        return spark.createDataFrame(
            [], "selection_rank int, vec_id bigint, coverage_radius double"
        )
    seed = seed_rows[0]

    def lit_vec(vals):
        return "array(" + ", ".join(f"CAST({float(v)!r} AS DOUBLE)" for v in vals) + ")"

    chosen = [(int(seed.vec_id), list(seed.embedding), None)]
    for _ in range(1, CORESET_K):
        d = "least(" + ", ".join(
            _sq_dist_spark("embedding", lit_vec(vals)) for _, vals, _ in chosen
        ) + ")" if len(chosen) > 1 else _sq_dist_spark(
            "embedding", lit_vec(chosen[0][1])
        )
        row = (
            emb.select("vec_id", "embedding", F.expr(d).alias("d"))
            .orderBy(F.desc("d"), "vec_id")
            .limit(1)
            .collect()[0]
        )
        chosen.append((int(row.vec_id), list(row.embedding), float(row.d)))
    import math

    out = [
        (rank, vid, None if dd is None else round(math.sqrt(dd), 6))
        for rank, (vid, _, dd) in enumerate(chosen)
    ]
    return arrow_local_df(
        spark, out, "selection_rank int, vec_id bigint, coverage_radius double"
    )


DIM_VAR_TOPK = 5


def q_embedding_dim_variance(spark, sf_dir):
    """Per-dimension variance screen: the DIM_VAR_TOPK highest-variance
    embedding dimensions — the feature-selection / whitening diagnostic
    (a dead dimension wastes index bits; a dominant one distorts cosine).
    One posexplode to the (dim, value) grain, one 64-row aggregation, a
    TakeOrdered top-k."""
    emb = _emb(spark, sf_dir)
    return (
        emb.select(F.posexplode("embedding").alias("dim", "v"))
        .groupBy("dim")
        .agg(
            F.round(F.avg(F.col("v").cast("double")), 6).alias("mean_v"),
            F.round(F.var_samp(F.col("v").cast("double")), 6).alias("var_v"),
        )
        .orderBy(F.desc("var_v"), "dim")
        .limit(DIM_VAR_TOPK)
    )


def _coreset_oracle() -> str:
    ctes = [
        "c0 AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id = 0)",
        f"m1 AS (SELECT e.vec_id, e.embedding, {_sq_dist_duck('e.embedding', 'c.embedding')} AS d"
        " FROM embeddings e, c0 c)",
    ]
    picks = []
    for r in range(1, CORESET_K):
        ctes.append(
            f"p{r} AS (SELECT vec_id, embedding, d FROM m{r} ORDER BY d DESC, vec_id LIMIT 1)"
        )
        picks.append(r)
        if r < CORESET_K - 1:
            ctes.append(
                f"m{r + 1} AS (SELECT m.vec_id, m.embedding,"
                f" LEAST(m.d, {_sq_dist_duck('m.embedding', 'p.embedding')}) AS d"
                f" FROM m{r} m, p{r} p)"
            )
    selects = ["SELECT 0 AS selection_rank, vec_id, CAST(NULL AS DOUBLE) AS coverage_radius FROM c0"]
    for r in picks:
        selects.append(
            f"SELECT {r} AS selection_rank, vec_id, ROUND(sqrt(d), 6) AS coverage_radius FROM p{r}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY selection_rank"


def _norm_audit_oracle() -> str:
    nrm = "sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))"
    return f"""
        WITH norms AS (
            SELECT vec_id, label, {nrm} AS nrm FROM embeddings
        ),
        stats AS (
            SELECT label, COUNT(*) AS n, AVG(nrm) AS mu, STDDEV_SAMP(nrm) AS sd
            FROM norms GROUP BY 1
        )
        SELECT s.label, MIN(s.n) AS n,
               ROUND(MIN(s.mu), 6) AS mean_norm,
               ROUND(MIN(s.sd), 6) AS std_norm,
               CAST(SUM(CASE WHEN ABS(nr.nrm - s.mu) > 2 * s.sd THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers
        FROM norms nr JOIN stats s USING (label)
        GROUP BY s.label ORDER BY s.label
    """


def _hard_negative_oracle() -> str:
    return f"""
        WITH {_knn_cte()},
        labeled AS (
            SELECT s.vec_a, ea.label AS label_a, s.vec_b, eb.label AS label_b,
                   s.score
            FROM scored s
            JOIN embeddings ea ON ea.vec_id = s.vec_a
            JOIN embeddings eb ON eb.vec_id = s.vec_b
            WHERE ea.label != eb.label
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_a
                                         ORDER BY score DESC, vec_b) AS rk
            FROM labeled
        )
        SELECT vec_a AS vec_id, label_a AS label,
               vec_b AS hard_negative_id, label_b AS neg_label, score
        FROM ranked WHERE rk = 1 ORDER BY vec_id
    """


def _knn_join_oracle() -> str:
    return f"""
        WITH {_knn_cte()}
        SELECT vec_a AS vec_id, nn_rank, vec_b AS neighbor_id, score
        FROM knn WHERE nn_rank <= {KNN_K}
    """


def _ann_recall_oracle() -> str:
    return f"""
        WITH {_knn_cte(f"WHERE vec_id < {RECALL_SAMPLE}", f"WHERE vec_a < {RECALL_SAMPLE}")},
        approx AS (
            SELECT vec_a AS qid, vec_b AS nid FROM knn WHERE nn_rank <= {KNN_K}
        ),
        exact AS (
            SELECT qid, nid FROM (
                SELECT q.vec_id AS qid, e.vec_id AS nid,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY {_cos_duck("e.embedding", "q.embedding")} DESC,
                                    e.vec_id) AS rn
                FROM embeddings q JOIN embeddings e ON e.vec_id != q.vec_id
                WHERE q.vec_id < {RECALL_SAMPLE}
            ) WHERE rn <= {KNN_K}
        ),
        ex AS (SELECT qid, COUNT(*) AS n_exact FROM exact GROUP BY qid),
        ap AS (SELECT qid, COUNT(*) AS n_approx FROM approx GROUP BY qid),
        ov AS (
            SELECT e.qid, COUNT(*) AS n_overlap
            FROM exact e JOIN approx a ON e.qid = a.qid AND e.nid = a.nid
            GROUP BY e.qid
        )
        SELECT ex.qid AS vec_id, ex.n_exact,
               COALESCE(ap.n_approx, 0) AS n_approx,
               COALESCE(ov.n_overlap, 0) AS n_overlap,
               ROUND(COALESCE(ov.n_overlap, 0) / ex.n_exact, 4) AS recall_at_k
        FROM ex LEFT JOIN ap ON ex.qid = ap.qid
                LEFT JOIN ov ON ex.qid = ov.qid
    """


def _hyperplane_sig_spark() -> str:
    """16-bit LSH signature as one Spark SQL expression. Left-fold double
    accumulation — bit-identical to the DuckDB twin, so an ulp can never
    flip a sign at the bucket boundary."""
    terms = []
    for j, plane in enumerate(_PLANES):
        arr = ", ".join(f"{v:.1f}D" for v in plane)
        dot = (
            f"aggregate(zip_with(embedding, array({arr}), "
            f"(x, y) -> CAST(x AS DOUBLE) * y), 0D, (acc, v) -> acc + v)"
        )
        terms.append(f"CASE WHEN {dot} > 0D THEN {1 << j} ELSE 0 END")
    return " + ".join(terms)


def _hyperplane_sig_duck() -> str:
    # unrolled dot product: plain + is left-associative, so the fold order
    # (and therefore every IEEE rounding step) matches Spark's aggregate()
    # left fold exactly; avoids per-row literal-list construction in DuckDB
    terms = []
    for j, plane in enumerate(_PLANES):
        prods = " + ".join(
            f"embedding[{i + 1}]::DOUBLE * {v:.1f}" for i, v in enumerate(plane)
        )
        terms.append(f"CASE WHEN ({prods}) > 0 THEN {1 << j} ELSE 0 END")
    return " + ".join(terms)


LSH_COSINE = 0.3  # verification threshold for hyperplane-LSH candidates


def q_ann_hyperplane_lsh(spark, sf_dir):
    """LSH-banded near-dup pairs: the 16-bit hyperplane signature splits
    into 2 bands of 8 bits; vectors sharing ANY band are candidates
    (equi-join on (band_idx, band_val) — the plan that replaces the
    quadratic pair join at scale: O(n·bands) shuffle), then the exact
    cosine threshold verifies. The band join carries ONLY ids + band
    keys — shipping the 64-float embeddings through it inflates the
    candidate shuffle ~30× (measured when q_neardup_embedding made the
    same switch, plans/similarity.py _PLANES notes); embeddings are
    re-attached by two linear equi-joins after the pair dedup."""
    sigs = (
        _emb(spark, sf_dir)
        .select("vec_id", F.expr(_hyperplane_sig_spark()).alias("sig"))
        .localCheckpoint(eager=False)
    )
    # ^ materialize the 16 interpreted plane-dot folds once instead of once
    # per self-join branch (same discipline as q_neardup_embedding)
    banded = sigs.select(
        "vec_id",
        F.posexplode(
            F.array(F.col("sig") % 256, F.floor(F.col("sig") / 256))
        ).alias("band_idx", "band_val"),
    )
    a = banded.select(F.col("vec_id").alias("vec_a"), "band_idx", "band_val")
    b = banded.select(F.col("vec_id").alias("vec_b"), "band_idx", "band_val")
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    emb = _emb(spark, sf_dir)
    # per-vector norms attached at re-attach time (see q_neardup_embedding):
    # pair-grain folds 3 -> 1, bit-identical, oracle unchanged
    ea = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        F.expr(_norm_spark("embedding")).alias("norm_a"),
    )
    eb = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        F.expr(_norm_spark("embedding")).alias("norm_b"),
    )
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.expr(f"round({_dot_spark('ea', 'eb')} / (norm_a * norm_b), 6)").alias(
                "score"
            ),
        )
        .filter(F.col("score") >= LSH_COSINE)
    )


def _sq_dist_spark(a: str, b: str) -> str:
    """Squared L2 distance, left-fold accumulation (bit-identical twin of
    the DuckDB expression below, so argmin ties can't diverge)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"0D, (acc, v) -> acc + v)"
    )


def _sq_dist_duck(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, {EMB_DIM}), "
        f"i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE) * ({a}[i]::DOUBLE - {b}[i]::DOUBLE)), "
        f"(x, y) -> x + y)"
    )


KMEANS_ITERS = 2
KMEANS_K = N_CENTROIDS  # floor of the derived codebook size ladder

# Corpus-derived codebook size (round 8 — VERDICT r7 item 2): per-query
# IVF candidate volume is the mean cell size n/k, so a FIXED k means
# candidates grow linearly with the corpus (the sf1 soak measured 6.7x
# per decade at k=8). Deriving k = ceil(n / IVF_FILL_TARGET) holds mean
# cell fill ~constant; the fill target is a POWER OF TWO so n/64.0 is
# an exact IEEE division and both engines' ceil can never disagree.
# The cap bounds the driver-side centroid collect (cap x dim doubles =
# ~2 MB) and the inlined probe-ranking expression; past it, cell size
# grows linearly again — the same documented saturation shape as the
# LSH ND_MAX_BITS cap, and the LSH family remains the unbounded-scale
# path.
IVF_FILL_TARGET = 64
KMEANS_K_CAP = 4096


def _derived_k(n: int) -> int:
    return min(KMEANS_K_CAP, max(KMEANS_K, -(-n // IVF_FILL_TARGET)))


# DuckDB twin of _derived_k over a COUNT(*) column (exact: n/64.0 is an
# exact double for any row count, so ceil is deterministic)
def _k_expr_duck(n_col: str) -> str:
    return (
        f"LEAST({KMEANS_K_CAP}, GREATEST({KMEANS_K}, "
        f"CAST(ceil({n_col} / {IVF_FILL_TARGET}.0) AS INT)))"
    )


def _assign_df(emb, cent_rows):
    """Map-side nearest-centroid assignment via the Arrow numpy kernel —
    (vec_id, embedding, cluster). The k x dim codebook ships inside the
    kernel closure (broadcast by task serialization); per batch the
    distance matrix is one fused per-dimension pass with EXACT left-fold
    accumulation, so every distance is bit-identical to the SQL fold
    `_assign_expr` remains as the pinned reference for
    (tests/test_similarity_props.py::test_assign_kernel_bit_identity)
    and to the DuckDB twin. The inlined-literal SQL projection it
    replaces costs O(k * dim) lambda dispatches per ROW at HOF speed —
    the corpus-derived k made that the dominant per-row cost."""
    fields = {f.name: f.dataType.simpleString() for f in emb.schema.fields}
    schema = (
        f"vec_id {fields['vec_id']}, embedding {fields['embedding']}, cluster int"
    )
    return emb.select("vec_id", "embedding").mapInPandas(
        _assign_batches(cent_rows), schema
    )


def _assign_batches(cent_rows):
    import numpy as np

    ids = np.array([c for c, _ in cent_rows], dtype=np.int32)
    cmat = (
        np.array([cv for _, cv in cent_rows], dtype=np.float64)
        if cent_rows
        else np.zeros((0, EMB_DIM))
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            out = pdf[["vec_id", "embedding"]].copy()
            if len(ids) == 0:
                # empty corpus -> no seeds: vacuously-null assignment,
                # same degradation as _assign_expr's typed null
                out["cluster"] = pd.array([None] * n, dtype="Int32")
                yield out
                continue
            v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            acc = np.zeros((n, len(ids)), dtype=np.float64)
            for i in range(EMB_DIM):
                diff = v[:, i : i + 1] - cmat[:, i]
                acc += diff * diff
            # first min = smallest cluster id (cent_rows sorted asc) —
            # the same (d, cluster) lexicographic tiebreak as the SQL
            out["cluster"] = ids[np.argmin(acc, axis=1)]
            yield out

    return kernel


def _kmeans_fit(emb, k: int | None = None, k_floor: int = KMEANS_K):
    """KMEANS_ITERS Lloyd iterations, one Spark job per round — the
    iterative-algorithm pattern done the way MLlib does it: the k x dim
    centroid table is COLLECTED to the driver each round (k*dim doubles —
    cap-bounded at ~2 MB) and shipped into the next round's map-side
    argmin kernel (`_assign_df`). Per round the only shuffle is the
    (cluster, pos) mean — k*dim groups — while the vectors themselves
    never shuffle and are scanned exactly once (the r2 version
    crossJoined k copies and windowed them back together: a k× scan
    blowup + full embedding shuffle per round). Centroid means round
    to 4 decimals after every round so cross-engine float summation can't
    drift into the next iteration; distances use bit-identical left-fold
    accumulation. ``k=None`` derives the codebook size from the corpus
    count (`_derived_k` — one count job, the same driver-coordination
    grade as the seed collect), with ``k_floor`` raising the clamp floor
    for callers whose published recipe wants a finer quantizer at small
    corpora (semdedup). Returns (trained centroid rows
    [(cluster, [dim]) ...], last-round lazy assignment DataFrame)."""
    if k is None:
        # corpus count and seed rows in ONE job (r12): observe the full
        # count on the scan, over-collect seed candidates to the k CAP
        # (bounded: KMEANS_K_CAP x dim ≈ 2 MB — the same driver grade as
        # the seed itself), derive k, then trim on the driver. The
        # CollectMetrics node is a pushdown barrier, so the observed
        # count is the PRE-filter corpus count (pinned by
        # tests/test_optimizer_features.py on a > cap corpus).
        from pyspark.sql import Observation

        obs = Observation()
        cap = max(k_floor, KMEANS_K_CAP)
        seed_all = (
            emb.observe(obs, F.count(F.lit(1)).alias("n"))
            .filter(F.col("vec_id") < cap)
            .select(F.col("vec_id").cast("int").alias("cluster"), "embedding")
            .collect()
        )
        try:
            n = int(obs.get["n"])
        except Exception:
            # zero-task collect (empty corpus folded to an empty local
            # relation): no metrics row — the old two-job shape, only
            # ever paid on that degenerate path
            n = emb.count()
        k = max(k_floor, _derived_k(n))
        seed = [r for r in seed_all if r.cluster < k]
    else:
        seed = (
            emb.filter(F.col("vec_id") < k)
            .select(F.col("vec_id").cast("int").alias("cluster"), "embedding")
            .collect()
        )
    cent_rows = sorted((r.cluster, list(r.embedding)) for r in seed)
    assigned = None
    for _ in range(KMEANS_ITERS):
        assigned = _assign_df(emb, cent_rows)
        # (cluster, pos) posexplode shape, kept DELIBERATELY after an A/B
        # (r12): the "one k-row shuffle" alternative — EMB_DIM avg columns
        # in a single cluster-grain aggregate — plans 2x EMB_DIM aggregate
        # buffers in one operator, which measured 2.4x slower warm (0.24
        # vs 0.10 s/round) and 3.6x slower cold (4.2 vs 1.2 s) than this
        # shape at sf0.1: the wide aggregate loses whole-stage fusion for
        # the stage that also evaluates the argmin assignment expression.
        # The extra shuffle here is k x EMB_DIM partial rows per map task
        # — noise at any scale next to the assignment scan it follows.
        new_cents = (
            assigned.select("cluster", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("v"), 4).alias("m"))
            .groupBy("cluster")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, m))), s -> s.m)"
                ).alias("cv")
            )
            .collect()
        )
        cent_rows = sorted((r.cluster, list(r.cv)) for r in new_cents)
    return cent_rows, assigned


def q_kmeans(spark, sf_dir):
    """K-means cluster audit: per-cluster size (last-round assignment) and
    trained-centroid norm. See _kmeans_fit for the Lloyd-round plan."""
    cent_rows, assigned = _kmeans_fit(_emb(spark, sf_dir))
    sizes = assigned.groupBy("cluster").agg(F.count("*").alias("n_vecs"))
    cents = arrow_local_df(
        spark, [(c, cv) for c, cv in cent_rows], "cluster int, cv array<double>"
    )
    norms = cents.select(
        "cluster",
        F.round(
            F.expr("sqrt(aggregate(cv, 0D, (acc, x) -> acc + x * x))"), 4
        ).alias("centroid_norm"),
    )
    return sizes.join(F.broadcast(norms), "cluster").select(
        "cluster", "n_vecs", "centroid_norm"
    )


def q_kmeans_inertia(spark, sf_dir):
    """Cluster-quality audit over the trained k-means codebook:
    per-cluster size, mean squared distance to the FINAL centroid
    (inertia / n — Lloyd's own objective, the number the elbow method
    reads), and the cluster radius (max squared distance). The
    operational screen for a degenerate quantizer — an empty-ish
    cluster or a radius far above the fleet means the IVF/semdedup
    consumers inherit skewed cells.

    Same Lloyd rounds as q_kmeans (`_kmeans_fit`); distances reuse the
    bit-identical left-fold of the assignment kernel against the
    4-decimal-rounded final centroids, quantize to integer micros
    (half-up) per vector, and reduce with exact integer sums — so the
    per-cluster means are partition-order-free and the mean/max fields
    are identically-shaped double expressions in both engines. One
    broadcast join (k x dim centroid table) + one cluster-grain
    aggregation on top of the training scan."""
    cent_rows, assigned = _kmeans_fit(_emb(spark, sf_dir))
    cents = arrow_local_df(
        spark, [(c, cv) for c, cv in cent_rows], "cluster int, cv array<double>"
    )
    d2m = (
        f"CAST(floor({_sq_dist_spark('embedding', 'cv')} * 1000000D + 0.5D) AS BIGINT)"
    )
    per = assigned.join(F.broadcast(cents), "cluster").select(
        "cluster", F.expr(d2m).alias("d2m")
    )
    return (
        per.groupBy("cluster")
        .agg(
            F.count("*").alias("n_vecs"),
            F.expr(
                "try_divide(CAST(SUM(d2m) AS DOUBLE), CAST(COUNT(*) AS DOUBLE) * 1000000D)"
            ).alias("mean_sq_dist"),
            (F.max("d2m").cast("double") / F.lit(1000000)).alias("max_sq_dist"),
        )
        .orderBy("cluster")
    )


def _kmeans_inertia_oracle() -> str:
    iters = KMEANS_ITERS
    return f"""{_kmeans_ctes()}
        , per AS (
            SELECT a.cluster,
                   CAST(floor({_sq_dist_duck("a.embedding", "c.cv")} * 1000000 + 0.5)
                        AS BIGINT) AS d2m
            FROM assigned_{iters - 1} a
            JOIN cents_{iters} c ON a.cluster = c.cluster
        )
        SELECT cluster, COUNT(*) AS n_vecs,
               CASE WHEN COUNT(*) = 0 THEN NULL
                    ELSE CAST(SUM(d2m) AS DOUBLE) /
                         (CAST(COUNT(*) AS DOUBLE) * 1000000)
               END AS mean_sq_dist,
               CAST(MAX(d2m) AS DOUBLE) / 1000000 AS max_sq_dist
        FROM per GROUP BY cluster ORDER BY cluster
    """


# SemDeDup pruning threshold: within a cluster, a vector dominated by an
# earlier-kept vector at cosine >= EPS is marked removed.
SEMDEDUP_EPS = 0.30
# SemDeDup trains its OWN quantizer with a higher clamp FLOOR than the
# IVF one: k is the cost dial — the pairwise stage is Σ|cluster|², so k
# must grow ∝ corpus to hold |cluster| (and the per-task quadratic)
# constant. Measured at sf0.1: k=8 → 8.0 s, k=32 → ~4x fewer pairs per
# cluster. The published recipe runs ~100k clusters on billion-scale
# corpora for the same reason — and since round 8 the growth is
# automatic: k = max(SEMDEDUP_K, _derived_k(n)) in both engines (at the
# shipped fixture SFs the derived value never exceeds the floor, so
# fixture results are unchanged; at the sf1 soak k becomes 313).
SEMDEDUP_K = 32


def q_semdedup(spark, sf_dir):
    """SemDeDup — semantic deduplication via cluster-then-prune: cluster
    embeddings with the trained k-means quantizer, order each cluster's
    members by (centroid_sim ASC, vec_id) — the published rule keeps the
    point LEAST like the centroid among semantic duplicates, maximizing
    retained diversity — and mark a vector `removed` when any
    earlier-ordered cluster-mate sits at cosine >= SEMDEDUP_EPS.
    Report per vector: cluster, centroid_sim, max similarity to any
    prior member, and the keep/remove verdict.

    Plan: assignment is the map-side argmin kernel (`_assign_df`,
    no shuffle); vectors then shuffle ONCE on the cluster id and the
    pairwise stage is a per-cluster self-join guarded by the rank
    predicate — |cluster|^2/2 cosines per cluster, embarrassingly
    parallel across clusters, with per-vector (not per-pair) norm
    folds. The 100 TB dial is k (SEMDEDUP_K — 4x the IVF quantizer
    here): grow clusters ∝ corpus so |cluster| stays bounded and the
    quadratic stage never exceeds |cluster|_max² per task. No all-pairs
    stage exists outside a cluster.

    Degenerate-cluster guard: BYTE-IDENTICAL embeddings collapse to one
    representative BEFORE the pairwise stage (the keeper is the
    earliest-ordered copy; every other copy is removed map-side with
    max_prior_sim = 1.0 — exactly what the pair stage would have
    computed, so the output is value-identical and the oracle is
    unchanged). Mass-duplicated vectors — the realistic way a cluster
    goes quadratic — therefore cost one keeper each in the |c|² stage,
    the same division of labor as exact dedup vs LSH in plans/dedup."""
    return _semdedup_frame(spark, _emb(spark, sf_dir))


def _semdedup_frame(spark, emb):
    """SemDeDup core over an embeddings DF — see q_semdedup. The
    quantizer size is CORPUS-DERIVED with floor SEMDEDUP_K (round 8:
    the docstring's own dial — k must grow ∝ corpus to hold |cluster|²
    bounded — is now automatic; at the shipped fixture SFs the derived
    k never exceeds the floor, so results there are unchanged)."""
    cent_rows, assigned = _kmeans_fit(emb, k=None, k_floor=SEMDEDUP_K)
    cents = arrow_local_df(
        spark, [(c, cv) for c, cv in cent_rows], "cluster int, cv array<double>"
    )
    scored = (
        assigned.join(F.broadcast(cents), "cluster")
        .select(
            "cluster",
            "vec_id",
            "embedding",
            F.expr("md5(cast(embedding as string))").alias("efp"),
            F.expr(_norm_spark("embedding")).alias("nrm"),
            F.expr(_cos_spark("embedding", "cv")).alias("centroid_sim"),
        )
    )
    w = Window.partitionBy("cluster").orderBy(F.asc("centroid_sim"), "vec_id")
    # ranked is referenced three times (pair a-side, pair b-side, final
    # re-attach) — without a materialization each reference re-runs the
    # k x dim argmin assignment + centroid cosine (the most expensive
    # per-row work here). Same materialize-once discipline as
    # neardup_embedding's signature checkpoint; (n x narrow) rows.
    ranked = (
        scored.withColumn("rk", F.row_number().over(w))
        # identical embeddings share a cluster and a centroid_sim, so the
        # min-rk member of an efp group is the group's keeper
        .withColumn("min_rk", F.min("rk").over(Window.partitionBy("efp")))
        .localCheckpoint(eager=False)
    )
    keepers = ranked.filter(F.col("rk") == F.col("min_rk"))
    copies = ranked.filter(F.col("rk") != F.col("min_rk")).select(
        "vec_id",
        "cluster",
        "centroid_sim",
        F.lit(1.0).alias("max_prior_sim"),
        F.lit(True).alias("removed"),
    )
    a = keepers.select(
        "cluster",
        F.col("rk").alias("rk_a"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    pair_sim = F.expr(f"round({_dot_spark('ea', 'eb')} / (na * nb), 6)")
    prior = (
        a.join(
            keepers.select(
                "cluster",
                F.col("vec_id").alias("vb"),
                F.col("rk").alias("rk_b"),
                F.col("embedding").alias("eb"),
                F.col("nrm").alias("nb"),
            ),
            "cluster",
        )
        .filter(F.col("rk_a") < F.col("rk_b"))
        .select("cluster", F.col("vb").alias("vec_id"), pair_sim.alias("sim"))
        .groupBy("cluster", "vec_id")
        .agg(F.max("sim").alias("max_prior_sim"))
    )
    return (
        keepers.join(prior, ["cluster", "vec_id"], "left")
        .select(
            "vec_id",
            "cluster",
            "centroid_sim",
            "max_prior_sim",
            F.coalesce(
                F.col("max_prior_sim") >= SEMDEDUP_EPS, F.lit(False)
            ).alias("removed"),
        )
        .unionByName(copies)
    )


def _kmeans_ctes(
    k: int | None = None,
    k_floor: int = KMEANS_K,
    corpus: str = "embeddings",
    pre: str = "",
) -> str:
    """The shared Lloyd-round CTE chain (WITH ... cents_{KMEANS_ITERS}),
    the twin of `_kmeans_fit` — used by the kmeans audit oracle, the IVF
    oracle (which probes against the trained centroids), and the
    semdedup oracle (its own explicit k). ``k=None`` derives the
    codebook size from the corpus count (`_k_expr_duck`, the twin of
    `_derived_k`); the Lloyd CTEs themselves are k-agnostic (cross join
    + argmin row_number), only the seed filter changes. ``corpus`` names
    the training relation (the persisted-IVF append audit trains on a
    prefix CTE injected via ``pre``); defaults produce the exact SQL the
    pre-round-9 oracles hashed against."""
    iters = KMEANS_ITERS
    seed_k = (
        str(k)
        if k is not None
        else f"(SELECT GREATEST({k_floor}, {_k_expr_duck('nd_n')}) "
        f"FROM (SELECT COUNT(*) AS nd_n FROM {corpus}))"
    )
    sql = [
        f"WITH {pre}cents_0 AS (SELECT CAST(vec_id AS INT) AS cluster, embedding AS cv FROM {corpus} WHERE vec_id < {seed_k})"
    ]
    for i in range(iters):
        d = _sq_dist_duck("e.embedding", "c.cv")
        sql.append(f"""
        , assigned_{i} AS (
            SELECT vec_id, embedding, cluster FROM (
                SELECT e.vec_id, e.embedding, c.cluster,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                          ORDER BY {d}, c.cluster) AS rn
                FROM {corpus} e, cents_{i} c
            ) WHERE rn = 1
        )
        , cents_{i + 1} AS (
            SELECT cluster, array_agg(m ORDER BY pos) AS cv FROM (
                SELECT cluster, pos, ROUND(AVG(v), 4) AS m
                FROM (
                    SELECT cluster, u.v AS v, u.pos AS pos
                    FROM assigned_{i},
                         LATERAL (SELECT UNNEST(embedding) AS v,
                                         generate_subscripts(embedding, 1) AS pos) u
                ) GROUP BY cluster, pos
            ) GROUP BY cluster
        )""")
    return "\n".join(sql)


def _kmeans_oracle() -> str:
    iters = KMEANS_ITERS
    return f"""{_kmeans_ctes()}
        SELECT a.cluster, COUNT(*) AS n_vecs,
               ROUND(sqrt(list_reduce(list_transform(c.cv, x -> x * x), (x, y) -> x + y)), 4) AS centroid_norm
        FROM assigned_{iters - 1} a
        JOIN cents_{iters} c ON a.cluster = c.cluster
        GROUP BY a.cluster, c.cv
    """


def _ann_ivf_oracle() -> str:
    iters = KMEANS_ITERS
    d = _sq_dist_duck("e.embedding", "c.cv")
    return f"""{_kmeans_ctes()}
        , assigned_f AS (
            SELECT vec_id, embedding, cluster FROM (
                SELECT e.vec_id, e.embedding, c.cluster,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                          ORDER BY {d}, c.cluster) AS rn
                FROM embeddings e, cents_{iters} c
            ) WHERE rn = 1
        ),
        q AS (SELECT embedding AS qv, cluster AS q_cluster FROM assigned_f WHERE vec_id = 0)
        SELECT a.vec_id, a.cluster, {_cos_duck('a.embedding', 'q.qv')} AS score
        FROM assigned_f a, q
        WHERE a.cluster = q.q_cluster AND a.vec_id != 0
        ORDER BY score DESC, a.vec_id
        LIMIT 5
    """


def _ann_ivf_multiprobe_oracle() -> str:
    iters = KMEANS_ITERS
    d = _sq_dist_duck("e.embedding", "c.cv")
    dq = _sq_dist_duck("q.qv", "c.cv")
    return f"""{_kmeans_ctes()}
        , assigned_f AS (
            SELECT vec_id, embedding, cluster FROM (
                SELECT e.vec_id, e.embedding, c.cluster,
                       ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                          ORDER BY {d}, c.cluster) AS rn
                FROM embeddings e, cents_{iters} c
            ) WHERE rn = 1
        ),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        qprobes AS (
            SELECT c.cluster FROM cents_{iters} c, q
            ORDER BY {dq}, c.cluster LIMIT {IVF_NPROBE}
        )
        SELECT a.vec_id, a.cluster, {_cos_duck('a.embedding', 'q.qv')} AS score
        FROM assigned_f a, q
        WHERE a.cluster IN (SELECT cluster FROM qprobes) AND a.vec_id != 0
        ORDER BY score DESC, a.vec_id
        LIMIT 5
    """


def _q8_spark() -> str:
    """Symmetric per-vector int8 quantization as ONE expression. scale =
    max|x| / 127; code = floor(x/scale + 0.5) clamped to [-127, 127]
    (floor(+0.5) instead of round(): identical half-up semantics in both
    engines, no banker's-rounding divergence). All-zero vectors take
    scale 0 and code 0 (no division).

    The scale is bound as a LAMBDA VARIABLE (``transform(array(scale),
    s -> ...)`` — a poor man's let-binding): a plain column alias would be
    re-inlined by CollapseProject into all 64 element lambdas, re-running
    the max-abs fold per element (measured ~25k ops/row vs ~800 here).
    Max and mean errors fold in one struct-accumulator pass."""
    maxabs = "aggregate(embedding, 0D, (acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))"
    return f"""
    transform(array({maxabs} / 127.0D), s -> named_struct(
      'scale', round(s, 6),
      'e', aggregate(
        zip_with(
          transform(embedding, x -> CASE WHEN s = 0D THEN 0D
            ELSE greatest(-127D, least(127D, floor(CAST(x AS DOUBLE) / s + 0.5D))) END),
          embedding,
          (c, x) -> abs(c * s - CAST(x AS DOUBLE))),
        named_struct('mx', 0D, 'sm', 0D),
        (acc, v) -> named_struct('mx', greatest(acc.mx, v), 'sm', acc.sm + v),
        acc -> named_struct('mx', round(acc.mx, 6), 'sm', round(acc.sm / {EMB_DIM}, 6))
      )))[0]
    """


def q_embedding_quantize(spark, sf_dir):
    """Int8 embedding quantization audit: per-vector scale plus max/mean
    absolute reconstruction error — the compression-loss report a vector
    store produces before switching ANN search to int8. Pure narrow
    projection (higher-order functions, no shuffle, no Python); at 100 TB
    this runs at scan speed and the int8 codes are 4x smaller on the
    wire."""
    return (
        _emb(spark, sf_dir)
        .select("vec_id", F.expr(_q8_spark()).alias("q"))
        .select(
            "vec_id",
            F.col("q.scale").alias("scale"),
            F.col("q.e.mx").alias("max_abs_err"),
            F.col("q.e.sm").alias("mean_abs_err"),
        )
    )


# Band-width planner configs: candidate widths to evaluate against the
# live corpus (see q_lsh_width_sweep). Since round 6 every width is a
# MASK of the same (table, bit)-indexed plane matrix the live index
# uses, so the sweep audits the exact configurations `_nd_bits_case`
# can pick — not merely statistically similar ones. 14/16 joined the
# menu when round 7 raised the width cap.
LSH_WIDTHS = [6, 8, 10, 12, 14, 16]


def q_lsh_width_sweep(spark, sf_dir):
    """Band-WIDTH planner for the sign-LSH index: for each candidate
    width in LSH_WIDTHS, the bucket-occupancy profile of the live
    corpus — buckets used, hottest fill, and exact-band collision pairs
    Σ C(fill,2) (the shuffle-cost proxy; est_pairs_per_vector = its
    directed per-vector average). This is the audit behind the
    `_nd_bits_case` dial (VERDICT r5 item 1: it measured the old fixed
    6-bit width saturating — 13x excess candidates at sf0.1): the index
    now derives its width from corpus size, and this sweep verifies the
    choice on the live data. Each width is the live full signature
    masked to its low bits (bit f always uses plane (t, f)), so one
    signature pass feeds every width — the per-width profiles here ARE
    the profiles the index would run at. Entirely at BUCKET grain
    (Σ C(fill,2) needs only the fill histogram, so no pair row ever
    materializes even for a saturated config). Collisions here are
    exact-band only (no Hamming probing — the probe multiplier is a
    known ×(bits+1) on top); recall per width is the s-curve /
    ann_recall_audit's job, cost is this query's."""
    emb = _emb(spark, sf_dir)
    fullsig = (
        f"aggregate(sequence(0, {ND_MAX_BITS - 1}), 0, (acc, f) -> "
        f"acc + CASE WHEN element_at(d, f + 1) > 0D THEN shiftleft(1, f) ELSE 0 END)"
    )
    # ND_BANDS_MIN tables: per-width occupancy is a per-table statistic
    # (every table is an iid plane draw), so the always-active 8 suffice
    bands = emb.select(
        F.posexplode(
            F.array(*[F.expr(_nd_dots_spark(t)) for t in range(ND_BANDS_MIN)])
        ).alias("t", "d")
    ).select("t", F.expr(fullsig).alias("fullbv"))
    wb = bands.select(
        "t",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(w).alias("band_bits"),
                        F.expr(f"fullbv & {(1 << w) - 1}").alias("bv"),
                    )
                    for w in LSH_WIDTHS
                ]
            )
        ).alias("wb"),
    ).select("t", F.col("wb.band_bits").alias("band_bits"), F.col("wb.bv").alias("bv"))
    fills = wb.groupBy("band_bits", "t", "bv").agg(F.count("*").alias("fill"))
    out = fills.groupBy("band_bits").agg(
        F.count("*").alias("n_buckets_used"),
        F.max("fill").alias("max_fill"),
        F.sum(F.expr("fill * (fill - 1) / 2")).cast("bigint").alias("collision_pairs"),
    )
    n = emb.agg(F.count("*").alias("n_vectors"))
    return (
        out.crossJoin(F.broadcast(n))
        .select(
            "band_bits",
            "n_vectors",
            "n_buckets_used",
            "max_fill",
            "collision_pairs",
            F.round(
                F.try_divide(F.lit(2.0) * F.col("collision_pairs"), F.col("n_vectors")),
                4,
            ).alias("est_pairs_per_vector"),
        )
        .orderBy("band_bits")
    )


def q_embedding_batch_drift(spark, sf_dir):
    """Per-label centroid drift between two ingest batches (batch =
    vec_id parity here; in production, the previous vs current embedding
    snapshot): cosine between the batches' label centroids and the L2
    shift — the canary that catches a silently upgraded or mis-scaled
    embedding model BEFORE mixed-version vectors poison an ANN index
    (norms can stay identical while directions rotate; the norm audit
    alone misses that).

    Shuffle shape: one posexplode to the (label, batch, dim) grain and a
    single partial+final AVG — the centroid table is |labels|·2·EMB_DIM
    rows, constant in corpus size; the cosine/L2 contraction joins at
    that constant grain. At 100 TB this is scan + one combiner-friendly
    aggregation, nothing else."""
    emb = _emb(spark, sf_dir).withColumn(
        "batch", (F.col("vec_id") % 2).cast("int")
    )
    d = emb.select(
        "label", "batch", F.posexplode("embedding").alias("dim", "v")
    )
    cent = d.groupBy("label", "batch", "dim").agg(
        F.avg(F.col("v").cast("double")).alias("m")
    )
    a = cent.filter(F.col("batch") == 0).select(
        "label", "dim", F.col("m").alias("ma")
    )
    b = cent.filter(F.col("batch") == 1).select(
        "label", "dim", F.col("m").alias("mb")
    )
    drift = (
        a.join(b, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.round(
                F.sum(F.col("ma") * F.col("mb"))
                / (
                    F.sqrt(F.sum(F.col("ma") * F.col("ma")))
                    * F.sqrt(F.sum(F.col("mb") * F.col("mb")))
                ),
                6,
            ).alias("centroid_cosine"),
            F.round(
                F.sqrt(F.sum((F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb")))),
                6,
            ).alias("centroid_l2_shift"),
        )
    )
    counts = emb.groupBy("label").agg(
        F.sum((F.col("batch") == 0).cast("int")).alias("n_a"),
        F.sum((F.col("batch") == 1).cast("int")).alias("n_b"),
    )
    return (
        counts.join(drift, "label")
        .select("label", "n_a", "n_b", "centroid_cosine", "centroid_l2_shift")
        .orderBy("label")
    )


def q_lsh_candidate_stats(spark, sf_dir):
    """Candidate-volume audit of the multi-probe sign-LSH index (VERDICT
    r4 item 6): the measured denominator behind knn_join's and
    hard_negative_mining's scaling ratio. One row:

    - n_vectors, band_bits (the corpus-derived width the index ran at —
      the dial's live setting), n_buckets (distinct (table, band)
      buckets), max_bucket (hottest bucket pre-cap), n_buckets_capped
      (dropped by
      ND_MAX_BUCKET — 0 on natural data, >0 flags degenerate corpora),
    - n_candidate_pairs (unordered, post-cap — the rows the expensive
      cosine stage actually scores), pairs_per_vector (directed average:
      2·pairs/n — the per-vector work multiplier to watch as bucket fill
      grows with corpus size).

    Cost: the same O(n · tables · probes) bucket join the index itself
    pays, minus every scoring stage — cheap enough to run per-ingest as
    a canary. Aggregates contract to three 1-row tables combined by
    broadcast cross-join (never a data-grain cartesian)."""
    emb = _emb(spark, sf_dir)
    sigs = _nd_sigs(emb, ["vec_id"])
    exact = sigs.select(
        F.col("vec_id").alias("vec_b"),
        F.posexplode(F.array(*[f"t{t}" for t in range(ND_BANDS)])).alias("tab", "bv"),
    ).filter(F.col("bv").isNotNull())
    bsz = exact.groupBy("tab", "bv").agg(F.count("*").alias("sz"))
    bstats = bsz.agg(
        F.count("*").alias("n_buckets"),
        F.max("sz").alias("max_bucket"),
        F.sum((F.col("sz") > ND_MAX_BUCKET).cast("int")).alias("n_buckets_capped"),
    )
    # r12 (guide §2.4): the cap rides the bucket-size table this audit
    # ALREADY aggregates for bstats, instead of a second count window
    # over the exploded rows — one (tab, bv) pass of the exploded table,
    # not two. Identical capped set: bdf-per-row == sz-per-bucket.
    exact_capped = exact.join(
        bsz.filter(F.col("sz") <= ND_MAX_BUCKET).drop("sz"), ["tab", "bv"]
    )
    probes = _nd_probes(sigs, "vec_a")
    npairs = (
        probes.join(exact_capped, ["tab", "bv"])
        .filter(F.col("vec_a") != F.col("vec_b"))
        .select(
            F.least("vec_a", "vec_b").alias("pa"),
            F.greatest("vec_a", "vec_b").alias("pb"),
        )
        .distinct()
        .agg(F.count("*").alias("n_candidate_pairs"))
    )
    nv = emb.agg(F.count("*").alias("n_vectors"))
    return (
        nv.crossJoin(_nd_cfg(emb))
        .crossJoin(F.broadcast(bstats))
        .crossJoin(F.broadcast(npairs))
        .select(
            "n_vectors",
            F.col("nd_bits").alias("band_bits"),
            F.col("nd_tables").alias("band_tables"),
            "n_buckets",
            "max_bucket",
            "n_buckets_capped",
            "n_candidate_pairs",
            F.round(
                F.try_divide(F.lit(2.0) * F.col("n_candidate_pairs"), F.col("n_vectors")),
                4,
            ).alias("pairs_per_vector"),
        )
    )


COV_TOPK = 20
COV_GRAIN = 1_000_000  # offset-floor grain: g = floor(v·1e6 + 0.5)


def _cov_sums_kernel():
    """mapInPandas kernel: per Arrow batch, the EXACT integer partial
    sums of the d×d covariance accumulator — G.T@G upper triangle (int64
    matmul), per-dim column sums, and the row count — flattened to
    (i, j, s) rows: (i, j≥i, Σ g_i·g_j), (i, -1, Σ g_i), (-1, -1, n).
    Quantization is offset-floor (floor(v·1e6 + 0.5)), written with the
    same expression in the DuckDB twin, so every emitted integer is
    bit-identical cross-engine — no float-sum drift anywhere."""
    import numpy as np

    iu = np.triu_indices(EMB_DIM)

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            g = np.floor(v * COV_GRAIN + 0.5).astype(np.int64)
            prod = g.T @ g
            yield pd.DataFrame(
                {
                    "i": np.concatenate(
                        [iu[0], np.arange(EMB_DIM), [-1]]
                    ).astype(np.int32),
                    "j": np.concatenate(
                        [iu[1], np.full(EMB_DIM, -1), [-1]]
                    ).astype(np.int32),
                    "s": np.concatenate(
                        [prod[iu], g.sum(axis=0), [len(pdf)]]
                    ).astype(np.int64),
                }
            )

    return kernel


def q_embedding_covariance_topk(spark, sf_dir):
    """Top-|COV_TOPK| most-correlated off-diagonal embedding dimension
    pairs (plus the sample covariance) — the redundancy screen behind
    whitening / PCA decisions, complementing q_embedding_dim_variance's
    per-dimension view.

    Scale shape: the d×d accumulator is computed as Arrow-batch partial
    sums (one int64 matmul per batch — never a d² row fan-out of the
    corpus, which is what the naive posexplode×posexplode plan costs),
    then ONE aggregation over (d²/2 + d + 1) keys per batch. Everything
    downstream lives at the d² grain. Integer quantization makes the
    statistic hash-exact across engines (see kernel docstring)."""
    emb = _emb(spark, sf_dir)
    sums = (
        emb.select("embedding")
        .mapInPandas(_cov_sums_kernel(), "i int, j int, s long")
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
    )
    # 1-row GLOBAL aggregate (the lint's boundedness witness for the hint)
    n = sums.filter((F.col("i") == -1) & (F.col("j") == -1)).agg(
        F.max("s").alias("n")
    )
    mean = sums.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("d"), F.col("s").alias("sd")
    )
    diag = sums.filter((F.col("i") >= 0) & (F.col("i") == F.col("j"))).select(
        F.col("i").alias("d"), F.col("s").alias("sdd")
    )
    pairs = sums.filter((F.col("j") >= 0) & (F.col("i") < F.col("j")))
    mi = mean.select(F.col("d").alias("i"), F.col("sd").alias("si"))
    mj = mean.select(F.col("d").alias("j"), F.col("sd").alias("sj"))
    di = diag.select(F.col("d").alias("i"), F.col("sdd").alias("sii"))
    dj = diag.select(F.col("d").alias("j"), F.col("sdd").alias("sjj"))
    joined = (
        pairs.join(mi, "i").join(mj, "j").join(di, "i").join(dj, "j")
        .crossJoin(F.broadcast(n))
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("s").cast("double") - F.col("si").cast("double") * F.col(
        "sj"
    ).cast("double")
    den_i = nd * F.col("sii").cast("double") - F.col("si").cast("double") * F.col(
        "si"
    ).cast("double")
    den_j = nd * F.col("sjj").cast("double") - F.col("sj").cast("double") * F.col(
        "sj"
    ).cast("double")
    corr = F.round(num / F.sqrt(den_i * den_j), 6)
    cov = F.round(
        num / (nd * (nd - F.lit(1.0))) / F.lit(float(COV_GRAIN) ** 2), 10
    )
    return (
        joined.select(
            F.col("i").alias("dim_i"),
            F.col("j").alias("dim_j"),
            corr.alias("corr"),
            cov.alias("cov"),
        )
        .orderBy(F.abs(F.col("corr")).desc(), "dim_i", "dim_j")
        .limit(COV_TOPK)
    )


QUERIES = {
    "embedding_covariance_topk": q_embedding_covariance_topk,
    "ann_bruteforce_topk": q_ann_bruteforce,
    "embedding_quantize_int8": q_embedding_quantize,
    "ann_ivf_topk": q_ann_ivf,
    "ann_ivf_multiprobe": q_ann_ivf_multiprobe,
    "neardup_embedding": q_neardup_embedding,
    "ann_hyperplane_lsh": q_ann_hyperplane_lsh,
    "kmeans_clusters": q_kmeans,
    "kmeans_inertia_audit": q_kmeans_inertia,
    "semdedup": q_semdedup,
    "knn_join": q_knn_join,
    "hard_negative_mining": q_hard_negative_mining,
    "embedding_norm_audit": q_embedding_norm_audit,
    "coreset_kcenter": q_coreset_kcenter,
    "embedding_dim_variance": q_embedding_dim_variance,
    "ann_recall_audit": q_ann_recall_audit,
    "lsh_candidate_stats": q_lsh_candidate_stats,
    "lsh_width_sweep": q_lsh_width_sweep,
    "embedding_batch_drift": q_embedding_batch_drift,
}


def _semdedup_oracle() -> str:
    iters = KMEANS_ITERS
    return f"""{_kmeans_ctes(None, k_floor=SEMDEDUP_K)}
        , scored AS (
            SELECT a.cluster, a.vec_id, a.embedding,
                   {_cos_duck("a.embedding", "c.cv")} AS centroid_sim
            FROM assigned_{iters - 1} a JOIN cents_{iters} c USING (cluster)
        ),
        ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster
                                         ORDER BY centroid_sim, vec_id) AS rk
            FROM scored
        ),
        prior AS (
            SELECT b.cluster, b.vec_id,
                   MAX({_cos_duck("a.embedding", "b.embedding")}) AS max_prior_sim
            FROM ranked a JOIN ranked b
              ON a.cluster = b.cluster AND a.rk < b.rk
            GROUP BY b.cluster, b.vec_id
        )
        SELECT r.vec_id, r.cluster, r.centroid_sim, p.max_prior_sim,
               COALESCE(p.max_prior_sim >= {SEMDEDUP_EPS}, FALSE) AS removed
        FROM ranked r LEFT JOIN prior p
          ON r.cluster = p.cluster AND r.vec_id = p.vec_id
    """

ORACLES = {
    "embedding_covariance_topk": f"""
        WITH dims AS (SELECT UNNEST(range({EMB_DIM})) AS d),
        v AS (
            SELECT vec_id, d.d AS i,
                   CAST(floor(CAST(embedding[d.d + 1] AS DOUBLE)
                              * {COV_GRAIN} + 0.5) AS BIGINT) AS g
            FROM embeddings, dims d
        ),
        pair_sums AS (
            SELECT a.i AS i, b.i AS j, SUM(a.g * b.g) AS s
            FROM v a JOIN v b ON a.vec_id = b.vec_id AND a.i < b.i
            GROUP BY 1, 2
        ),
        diag AS (SELECT i, SUM(g * g) AS sdd, SUM(g) AS sd FROM v GROUP BY 1),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM embeddings)
        SELECT p.i AS dim_i, p.j AS dim_j,
               ROUND((nd * CAST(p.s AS DOUBLE)
                      - CAST(di.sd AS DOUBLE) * CAST(dj.sd AS DOUBLE))
                     / SQRT((nd * CAST(di.sdd AS DOUBLE)
                             - CAST(di.sd AS DOUBLE) * CAST(di.sd AS DOUBLE))
                            * (nd * CAST(dj.sdd AS DOUBLE)
                               - CAST(dj.sd AS DOUBLE) * CAST(dj.sd AS DOUBLE))),
                     6) AS corr,
               ROUND((nd * CAST(p.s AS DOUBLE)
                      - CAST(di.sd AS DOUBLE) * CAST(dj.sd AS DOUBLE))
                     / (nd * (nd - 1.0)) / {float(COV_GRAIN) ** 2}, 10) AS cov
        FROM pair_sums p
        JOIN diag di ON p.i = di.i
        JOIN diag dj ON p.j = dj.i
        CROSS JOIN nn
        ORDER BY ABS(corr) DESC, dim_i, dim_j
        LIMIT {COV_TOPK}
    """,
    "ann_bruteforce_topk": f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id, {_cos_duck('embedding', 'qv')} AS score
        FROM embeddings, q
        WHERE vec_id != 0
        ORDER BY score DESC, vec_id
        LIMIT 10
    """,
    "ann_ivf_topk": _ann_ivf_oracle(),
    "ann_ivf_multiprobe": _ann_ivf_multiprobe_oracle(),
    "neardup_embedding": f"""
        WITH {_nd_sigs_duck(", label")},
        bands AS (
            {" UNION ALL ".join(f"SELECT vec_id, label, nd_bits, {t} AS tab, t{t} AS bv, p{t} AS pb FROM sigs WHERE t{t} IS NOT NULL" for t in range(ND_BANDS))}
        ),
        probes AS (
            SELECT vec_id, label, tab, u.pbv AS bv
            FROM bands, LATERAL (
                SELECT UNNEST({_ND_PROBE_KEYS_DUCK}) AS pbv
            ) u
        ),
        bands_capped AS (
            SELECT vec_id, label, tab, bv FROM (
                SELECT vec_id, label, tab, bv,
                       COUNT(*) OVER (PARTITION BY tab, bv, label) AS bdf
                FROM bands
            ) WHERE bdf <= {ND_MAX_BUCKET}
        ),
        cand AS (
            SELECT DISTINCT a.label AS label,
                            LEAST(a.vec_id, b.vec_id) AS vec_a,
                            GREATEST(a.vec_id, b.vec_id) AS vec_b
            FROM probes a JOIN bands_capped b
              ON a.tab = b.tab AND a.bv = b.bv
             AND a.label = b.label AND a.vec_id != b.vec_id
        )
        SELECT label, vec_a, vec_b, score FROM (
            SELECT c.label, c.vec_a, c.vec_b,
                   {_cos_duck('ea.embedding', 'eb.embedding')} AS score
            FROM cand c
            JOIN embeddings ea ON ea.vec_id = c.vec_a
            JOIN embeddings eb ON eb.vec_id = c.vec_b
        ) WHERE score >= {NEARDUP_COSINE}
    """,
    "ann_hyperplane_lsh": f"""
        WITH sigs AS MATERIALIZED (
            SELECT vec_id, embedding, {_hyperplane_sig_duck()} AS sig
            FROM embeddings
        ),
        bands AS (
            SELECT vec_id, embedding, 0 AS band_idx, sig % 256 AS band_val FROM sigs
            UNION ALL
            SELECT vec_id, embedding, 1 AS band_idx, sig // 256 AS band_val FROM sigs
        ),
        pairs AS (
            SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   a.embedding AS ea, b.embedding AS eb
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_val = b.band_val
             AND a.vec_id < b.vec_id
        )
        SELECT vec_a, vec_b, score FROM (
            SELECT vec_a, vec_b, {_cos_duck('ea', 'eb')} AS score FROM pairs
        ) WHERE score >= {LSH_COSINE}
    """,
    "kmeans_clusters": _kmeans_oracle(),
    "kmeans_inertia_audit": _kmeans_inertia_oracle(),
    "semdedup": _semdedup_oracle(),
    "knn_join": _knn_join_oracle(),
    "hard_negative_mining": _hard_negative_oracle(),
    "lsh_candidate_stats": f"""
        WITH {_nd_sigs_duck()},
        bands AS (
            {" UNION ALL ".join(f"SELECT vec_id, nd_bits, {t} AS tab, t{t} AS bv, p{t} AS pb FROM sigs WHERE t{t} IS NOT NULL" for t in range(ND_BANDS))}
        ),
        probes AS (
            SELECT vec_id, tab, u.pbv AS bv
            FROM bands, LATERAL (
                SELECT UNNEST({_ND_PROBE_KEYS_DUCK}) AS pbv
            ) u
        ),
        bsz AS (SELECT tab, bv, COUNT(*) AS sz FROM bands GROUP BY 1, 2),
        bstats AS (
            SELECT COUNT(*) AS n_buckets,
                   MAX(sz) AS max_bucket,
                   CAST(SUM(CASE WHEN sz > {ND_MAX_BUCKET} THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_buckets_capped
            FROM bsz
        ),
        bands_capped AS (
            SELECT b.* FROM bands b JOIN bsz USING (tab, bv)
            WHERE bsz.sz <= {ND_MAX_BUCKET}
        ),
        cand AS (
            SELECT DISTINCT LEAST(a.vec_id, b.vec_id) AS pa,
                            GREATEST(a.vec_id, b.vec_id) AS pb
            FROM probes a JOIN bands_capped b
              ON a.tab = b.tab AND a.bv = b.bv AND a.vec_id != b.vec_id
        ),
        np AS (SELECT COUNT(*) AS n_candidate_pairs FROM cand),
        nv AS (SELECT COUNT(*) AS n_vectors FROM embeddings)
        SELECT n_vectors, nd_bits AS band_bits, nd_tables AS band_tables,
               n_buckets, max_bucket,
               n_buckets_capped, n_candidate_pairs,
               ROUND(2.0 * n_candidate_pairs / n_vectors, 4) AS pairs_per_vector
        FROM nv, cfg, bstats, np
    """,
    "embedding_norm_audit": _norm_audit_oracle(),
    "coreset_kcenter": _coreset_oracle(),
    "embedding_dim_variance": f"""
        WITH g AS (
            SELECT u.dim - 1 AS dim, embedding[u.dim]::DOUBLE AS v
            FROM embeddings, LATERAL (SELECT UNNEST(generate_series(1, {EMB_DIM})) AS dim) u
        )
        SELECT dim, ROUND(AVG(v), 6) AS mean_v, ROUND(VAR_SAMP(v), 6) AS var_v
        FROM g GROUP BY dim
        ORDER BY var_v DESC, dim LIMIT {DIM_VAR_TOPK}
    """,
    "ann_recall_audit": _ann_recall_oracle(),
    "lsh_width_sweep": f"""
        WITH dts AS MATERIALIZED (
            SELECT {", ".join(f"{_nd_dots_duck(t)} AS d{t}" for t in range(ND_BANDS_MIN))}
            FROM embeddings
        ),
        bands AS (
            {" UNION ALL ".join(f"SELECT {t} AS t, list_sum(list_transform(range(0, {ND_MAX_BITS}), f -> CASE WHEN d{t}[f + 1] > 0 THEN (1 << f) ELSE 0 END)) AS fullbv FROM dts" for t in range(ND_BANDS_MIN))}
        ),
        wb AS (
            {" UNION ALL ".join(f"SELECT {w} AS band_bits, t, fullbv & {(1 << w) - 1} AS bv FROM bands" for w in LSH_WIDTHS)}
        ),
        f AS (
            SELECT band_bits, t, bv, COUNT(*) AS fill FROM wb GROUP BY 1, 2, 3
        )
        SELECT band_bits,
               (SELECT COUNT(*) FROM embeddings) AS n_vectors,
               COUNT(*) AS n_buckets_used,
               MAX(fill) AS max_fill,
               CAST(SUM(fill * (fill - 1) / 2) AS BIGINT) AS collision_pairs,
               ROUND(2.0 * CAST(SUM(fill * (fill - 1) / 2) AS BIGINT)
                     / (SELECT COUNT(*) FROM embeddings), 4)
                 AS est_pairs_per_vector
        FROM f GROUP BY band_bits ORDER BY band_bits
    """,
    "embedding_batch_drift": f"""
        WITH d AS (
            SELECT label, CAST(vec_id % 2 AS INT) AS batch,
                   u.dim - 1 AS dim, embedding[u.dim]::DOUBLE AS v
            FROM embeddings,
                 LATERAL (SELECT UNNEST(generate_series(1, {EMB_DIM})) AS dim) u
        ),
        cent AS (
            SELECT label, batch, dim, AVG(v) AS m FROM d GROUP BY 1, 2, 3
        ),
        j AS (
            SELECT a.label, a.dim, a.m AS ma, b.m AS mb
            FROM (SELECT * FROM cent WHERE batch = 0) a
            JOIN (SELECT * FROM cent WHERE batch = 1) b USING (label, dim)
        ),
        drift AS (
            SELECT label,
                   ROUND(SUM(ma*mb) / (sqrt(SUM(ma*ma)) * sqrt(SUM(mb*mb))), 6)
                     AS centroid_cosine,
                   ROUND(sqrt(SUM((ma-mb)*(ma-mb))), 6) AS centroid_l2_shift
            FROM j GROUP BY label
        ),
        counts AS (
            SELECT label,
                   CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                   CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
            FROM embeddings GROUP BY label
        )
        SELECT label, n_a, n_b, centroid_cosine, centroid_l2_shift
        FROM counts JOIN drift USING (label)
        ORDER BY label
    """,
    "embedding_quantize_int8": f"""
        WITH s AS (
            SELECT vec_id, embedding,
                   list_reduce(list_transform(embedding, x -> abs(x::DOUBLE)),
                               (x, y) -> CASE WHEN x > y THEN x ELSE y END) / 127.0
                     AS scale
            FROM embeddings
        ),
        c AS (
            SELECT vec_id, embedding, scale,
                   list_transform(embedding, x ->
                       CASE WHEN scale = 0 THEN 0.0
                            ELSE greatest(-127.0, least(127.0,
                                 floor(x::DOUBLE / scale + 0.5))) END) AS code
            FROM s
        ),
        e AS (
            SELECT vec_id, scale,
                   list_transform(generate_series(1, {EMB_DIM}),
                                  i -> abs(code[i] * scale - embedding[i]::DOUBLE))
                     AS errs
            FROM c
        )
        SELECT vec_id, ROUND(scale, 6) AS scale,
               ROUND(list_reduce(errs, (x, y) -> CASE WHEN x > y THEN x ELSE y END), 6)
                 AS max_abs_err,
               ROUND(list_reduce(errs, (x, y) -> x + y) / {EMB_DIM}, 6) AS mean_abs_err
        FROM e
    """,
}
