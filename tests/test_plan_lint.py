"""Fleet-wide plan linter: EVERY registered query's physical plan is
checked for the three antipatterns that kill 100 TB runs, so a regression
in any future operator fails CI even if nobody wrote it a dedicated
plan test:

- ``CartesianProduct`` — an unkeyed pair join; always a bug here (scalar
  attachment uses broadcast nested-loop over a 1-row side, which is fine
  and planned differently).
- ``BatchEvalPython`` — a row-at-a-time Python UDF in the plan; Python is
  allowed only through Arrow-vectorized nodes (ArrowEvalPython,
  FlatMapGroupsInPandas, MapInPandas, ...).
- ``Window`` with an empty partition spec — every row on one partition;
  the engine's windows must always partition (global orderings are
  expressed as percentile cut-points or TakeOrdered instead).
- ``ResolvedHint (strategy=broadcast)`` over an UNBOUNDED subtree
  (round 7, VERDICT r6 item 2): an explicit ``F.broadcast`` is only
  allowed when the hinted subtree provably cannot grow with the data —
  a global aggregate (1 row), a LIMIT, a literal/Range relation, a scan
  of a spec-bounded dim (nation=25 / region=5 rows at every SF), or an
  aggregate/distinct whose grouping keys all have bounded domains
  (event types, buckets, languages, cluster ids, ...). Anything else —
  per-vertex degree tables, growing dims like part/supplier/customer —
  must carry NO hint so AQE can fall back to a shuffle join at scale.
"""

import io
import re
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as E

_QUERIES = sorted(E.queries())


def _formatted_plan(df):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# Grouping keys whose domains are bounded by construction (do not grow
# with the data): event taxonomy, day-of-week, fixed hash-bucket ids,
# language codes, cluster/centroid ids, fixed sweep configs, years of a
# business calendar, embedding class labels, Bloom word indexes. An
# aggregate or distinct grouped ONLY on these yields a bounded table.
# __pid = spark_partition_id(): its domain is the configured partition
# count (a config bound, not a data bound) — the distributed-prefix-sum
# offsets table in functions/quantiles groups on it.
_BOUNDED_GROUP_KEYS = {
    "event_type", "from_type", "to_type", "dow", "lang", "label",
    "cluster", "b", "j", "word", "y", "py", "yr", "mo", "theta",
    "band_bits", "grain", "bucket", "source", "split", "tok", "variant",
    "r_name", "n_name", "bands", "__pid", "coin_shard", "bx", "by",
    # coin_shard = top 8 bits of a 60-bit md5 coin: a 256-value domain
    # by construction (curriculum_order's rank-window shards)
    # bx/by = equi-width bin indices floor((g-min)·B/(max-min+1)): a
    # B=20-value domain by arithmetic (mutual_information_binned)
    "__rtag",
    # __rtag = the fused-rank column tag (0 = x, 1 = y): a 2-value
    # literal domain by construction (stat_tests._avg_rank2_fused); the
    # literal origin is hidden behind the grain localCheckpoint, so the
    # _literal_aliased witness can't see it
}

# Unique-key columns: an equality filter `<key> = <literal>` on one of
# these is a point lookup (<= 1 row) — a boundedness witness.
_UNIQUE_KEYS = {"vec_id", "doc_id", "order_id", "o_orderkey", "event_id"}
_POINT_FILTER_RE = re.compile(
    r"Filter \(*(\w+)#\d+\w* = (?:cast\()?-?\d"
)

_HINT_RE = re.compile(r"ResolvedHint \(strategy=broadcast\)")

# Mutation-API queries: the broadcast hint covers the caller-provided
# mutation batch, whose size is bounded by CONTRACT (point/keyed CRUD
# mirroring the reference Lambda's per-request writes; callers pass
# bulk=True to disable the hint for large batches — operators/mutation.py).
# Contract bounds aren't visible in the plan, hence the exemption.
_HINT_EXEMPT = {"insert_append", "keyed_update", "keyed_delete", "upsert"}


def _node_depth(line: str) -> int:
    """Tree-string depth = offset of the node name past the ':- +-'
    connector art."""
    return len(line) - len(line.lstrip(" :+-"))


def _parse_tree(analyzed: str):
    """Parse a logical-plan tree string into (line, children) nodes."""
    lines = [ln for ln in analyzed.splitlines() if ln.strip()]

    def build(i, depth):
        # strip the ':  +-' connector art so node-kind prefixes match
        node = {"line": lines[i].strip().lstrip(":+- "), "children": []}
        j = i + 1
        while j < len(lines):
            d = _node_depth(lines[j])
            if d <= depth:
                break
            child, j = build(j, d)
            node["children"].append(child)
        return node, j

    root, _ = build(0, _node_depth(lines[0]))
    return root


def _hint_nodes(root):
    stack = [root]
    while stack:
        n = stack.pop()
        if _HINT_RE.search(n["line"]):
            yield n
        stack.extend(n["children"])


def _strip_attr(col: str) -> str:
    """'x.event_type#123L' -> 'event_type'."""
    return col.strip().split("#")[0].rsplit(".", 1)[-1].strip("`")


def _top_level_lists(line: str):
    """The top-level [...] groups of a node's simpleString (bracket-depth
    scan — expression-internal brackets don't split)."""
    lists, depth, start = [], 0, None
    for i, ch in enumerate(line):
        if ch == "[":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0 and start is not None:
                lists.append(line[start:i])
                start = None
    return lists


def _split_top_commas(s: str):
    out, depth, cur = [], 0, []
    for ch in s:
        if ch in "[(":
            depth += 1
        elif ch in "])":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return [c.strip() for c in out if c.strip()]


def _keys_bounded(keys) -> bool:
    return all(_strip_attr(k) in _BOUNDED_GROUP_KEYS for k in keys)


def _subtree_text(node) -> str:
    out, stack = [], [node]
    while stack:
        n = stack.pop()
        out.append(n["line"])
        stack.extend(n["children"])
    return "\n".join(out)


def _literal_aliased(subtree_text: str, key: str) -> bool:
    """True when the grouping attribute `key` (e.g. '__g#66') is produced
    as a literal alias ('0 AS __g#66') somewhere below — a literal-valued
    grouping key has a 1-value domain, so the aggregate is bounded (the
    functions/quantiles global-group pattern)."""
    tok = key.strip()
    return bool(
        re.search(
            rf"(?<![\w.#])-?\d+(?:\.\d+)?\s+AS\s+{re.escape(tok)}(?![0-9])",
            subtree_text,
        )
    )


def _is_bounded(node) -> bool:
    """Recursive boundedness: can this subtree's row count grow with the
    input data? Conservative — unknown node kinds inherit their
    children's verdict; unknown leaves are unbounded."""
    line = node["line"]
    kids = node["children"]
    # Bounded regardless of inputs:
    if line.startswith(("GlobalLimit", "LocalRelation", "OneRowRelation")):
        return True
    if re.match(r"Range \(", line):
        return True  # spark.range(constant)
    m = _POINT_FILTER_RE.match(line)
    if m and m.group(1) in _UNIQUE_KEYS:
        return True  # point lookup on a unique key -> <= 1 row
    if line.startswith("Aggregate "):
        lists = _top_level_lists(line)
        # Spark 4 omits the empty grouping list: one list = global agg
        # (exactly 1 row); two lists = grouped (first list = keys).
        if len(lists) == 1:
            return True
        keys = _split_top_commas(lists[0])
        if _keys_bounded(keys):
            return True
        subtree = _subtree_text(node)
        if all(
            _strip_attr(k) in _BOUNDED_GROUP_KEYS or _literal_aliased(subtree, k)
            for k in keys
        ):
            return True
        return all(_is_bounded(k) for k in kids)
    if line.startswith("Deduplicate "):
        lists = _top_level_lists(line)
        if lists and _keys_bounded(_split_top_commas(lists[0])):
            return True
        return all(_is_bounded(k) for k in kids)
    # Leaves:
    if line.startswith("Relation "):
        cols = _split_top_commas(_top_level_lists(line)[0])
        first = _strip_attr(cols[0]) if cols else ""
        # spec-bounded dims: nation = 25 rows, region = 5 at every SF
        return first in ("n_nationkey", "r_regionkey")
    if line.startswith("LogicalRDD "):
        # driver-materialized table (createDataFrame / localCheckpoint):
        # bounded iff its grain (first column) has a bounded domain —
        # per-event-type medians, sweep configs, centroids, ...
        lists = _top_level_lists(line)
        cols = _split_top_commas(lists[0]) if lists else []
        return bool(cols) and _strip_attr(cols[0]) in _BOUNDED_GROUP_KEYS
    if not kids:  # LogicalRDD, unknown scans, streaming relations, ...
        return False
    # Everything else (Project/Filter/Join/Union/Generate/Window/...):
    # bounded inputs give bounded output (explode over a bounded table
    # multiplies by per-row array length, which is plan-constant here).
    return all(_is_bounded(k) for k in kids)


def _unbounded_hints(analyzed: str):
    """Subtree text of each broadcast hint that lacks a boundedness
    witness."""
    bad = []
    for hint in _hint_nodes(_parse_tree(analyzed)):
        for child in hint["children"]:
            if not _is_bounded(child):
                bad.append(_render(child))
    return bad


def _render(node, depth=0):
    lines = ["  " * depth + node["line"]]
    for k in node["children"]:
        lines.append(_render(k, depth + 1))
    return "\n".join(lines)


def _window_partition_specs(plan: str):
    """Partition spec (2nd bracket group of the Arguments line) for each
    Window node in a formatted plan."""
    lines = plan.splitlines()
    specs = []
    for i, line in enumerate(lines):
        if re.match(r"\(\d+\) Window", line.strip()):
            for follow in lines[i + 1 : i + 6]:
                m = re.match(r"Arguments: \[.*?\], \[(.*?)\], \[", follow.strip())
                if m:
                    specs.append(m.group(1))
                    break
    return specs


@pytest.mark.parametrize("name", _QUERIES)
def test_no_scale_antipatterns_in_plan(spark, sf_dir, name):
    df = E.queries()[name](spark, sf_dir)
    plan = _formatted_plan(df)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    for spec in _window_partition_specs(plan):
        assert spec.strip(), f"{name}: Window with empty partition spec"
    # broadcast hints: every explicit F.broadcast must hint a subtree
    # whose size is bounded by construction (streaming plans expose no
    # analyzed tree through this accessor pre-start; their static twins
    # cover the shared plan bodies)
    if not df.isStreaming and name not in _HINT_EXEMPT:
        analyzed = df._jdf.queryExecution().analyzed().toString()
        bad = _unbounded_hints(analyzed)
        assert not bad, (
            f"{name}: broadcast hint on an unbounded subtree "
            f"(no 1-row aggregate / LIMIT / literal relation / "
            f"spec-bounded dim / bounded-key grouping witness):\n" + bad[0]
        )


# ---------------------------------------------------------------------------
# Buffering-percentile anchor invariant (VERDICT r7 item 8 / round 8):
# exact `percentile(` buffers every group value in one aggregation buffer,
# so each remaining call site must be a DOCUMENTED anchor — either the
# independent oracle anchor of the shared distribution-quantile helper
# (q_grouped_percentiles: ~12 twins co-generate from functions/quantiles,
# and a twin-consistent bug there would be invisible to the hash gate
# without an independent implementation) or the exact half of an
# approx-audit query whose whole point is the exact-vs-sketch comparison.
# Everything else must use the distribution method or a GK sketch.
_PERCENTILE_ANCHORS = {
    # file (relative to the package) -> allowed buffering-call count
    "plans/analytics_ext.py": 1,  # q_grouped_percentiles (THE anchor)
    "plans/analytics.py": 5,  # grouped_mad_outliers (med+mad, the anchor of
    #   its approx twin), grouped_mad_outliers_approx's exact halves
    #   (med_e+mad_e), approx_percentiles_bounded's exact half
}


def test_percentile_anchor_invariant():
    import os
    import re

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "migrate_blob_data_from_rdbms_to_amazon_s3_spark",
    )
    pat = re.compile(r"(?<!approx_)\bpercentile\s*\(")
    found: dict[str, int] = {}
    for root, _dirs, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            rel = os.path.relpath(path, pkg)
            with open(path) as f:
                n = 0
                for line in f:
                    code = line.split("#", 1)[0]
                    if '"' in line and "percentile(" in line and "F." not in code:
                        # docstrings / SQL strings mentioning the word are
                        # counted only when they build a Spark expr
                        pass
                    for m in pat.finditer(code):
                        # only Spark-side aggregate constructions count:
                        # F.percentile(...) or percentile( inside F.expr
                        before = code[: m.start()]
                        if before.rstrip().endswith("F.") or "expr" in before or "F.percentile" in code:
                            n += 1
                if n:
                    found[rel] = n
    assert found == {
        k: v for k, v in _PERCENTILE_ANCHORS.items()
    }, f"undocumented buffering percentile call sites: {found}"


def test_anchor_query_plan_still_buffers(spark, sf_dir):
    """q_grouped_percentiles must keep Spark's buffering `percentile`
    aggregate (NOT the distribution stages) — it is the independent
    anchor the co-generated twins are property-tested against."""
    df = E.queries()["grouped_percentiles"](spark, sf_dir)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "percentile(" in analyzed
    # the distribution method's signature stages must be absent
    assert "__pid" not in analyzed and "__offw" not in analyzed
