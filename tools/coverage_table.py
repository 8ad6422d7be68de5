"""Generate COVERAGE.md: one row per registered query — SURVEY §2/§7
section, defining module, oracle kind, bench membership, and the pytest
files that reference it. Regenerated output is asserted in-sync with the
live registry by tests/test_coverage_sync.py, so the table cannot drift
as the registry grows (VERDICT r3 item 7).

Usage: python tools/coverage_table.py          # rewrites COVERAGE.md
       python tools/coverage_table.py --check  # exit 1 if out of sync
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "COVERAGE.md")

# Explicit §2 operator-ID tags for the reference-parity queries; everything
# else inherits its module's §7 family below. Keys must stay a subset of
# the registry (asserted by the sync test).
SECTION_BY_QUERY = {
    "count_orders": "§2 A1/C1",
    "page_scan": "§2 A2/E1",
    "keyset_page": "§2 A2 (keyset scale variant)",
    "page_scan_projection": "§2 A3/B2",
    "point_lookup": "§2 A4/B1",
    "blob_lookup_b64": "§2 A5",
    "insert_append": "§2 A6",
    "upsert": "§2 A6",
    "keyed_update": "§2 A7",
    "keyed_delete": "§2 A9",
    "pages_envelope": "§2 C2/E2",
    "collect_page_keys": "§2 C3",
    "bridge_coalesce": "§2 D1",
    "object_linkage": "§2 D2/A13",
    "rename_envelope": "§2 B3",
    "trim_description": "§2 F1/F8",
    "base64_roundtrip": "§2 F2/F3",
    "s3_key": "§2 F5",
    "strip_arn": "§2 F6",
    "cast_with_default": "§2 F7/F10",
    "json_extract": "§2 F9",
    "json_envelope": "§2 F9",
    "incremental_pointer_latest": "§7 incremental migration (merge-on-read view)",
}

SECTION_BY_MODULE = {
    "parity": "§2 (reference parity)",
    "analytics": "§7 analytics",
    "analytics_ext": "§7 analytics",
    "analytics_tpch2": "§7 analytics (TPC-H tranche 2)",
    "temporal": "§7 temporal joins",
    "sql_surface": "§7 SQL surface",
    "grouped_map": "§2 I (UDF/pandas-UDF/UDTF)",
    "text": "§7 text analysis",
    "bpe": "§7 text analysis (BPE subword tokenizer)",
    "retrieval": "§7 hybrid retrieval (RRF / rerank)",
    "dedup": "§7 deduplication",
    "text_index_entries": "§7 deduplication (persisted text index)",
    "contamination": "§7 decontamination",
    "similarity": "§7 similarity / ANN",
    "projection": "§7 similarity / ANN (JL random projection)",
    "ann_index_entries": "§7 similarity / ANN (persisted index)",
    "ivf_index_entries": "§7 similarity / ANN (persisted IVF index)",
    "multimodal": "§7 multimodal",
    "quality": "§7 quality / pipeline audit",
    "corpus_ops": "§7 corpus ops",
    "streaming_entries": "§2 H (streaming)",
    "profiling": "§7 profiling / pipeline maintenance",
    "profiling_stats": "§7 statistical profiling",
    "insights": "§7 behavioral insights / reconciliation",
    "graph_ops": "§7 graph analytics",
    "survival": "§7 survival analysis (Kaplan-Meier)",
    "timeseries_ext": "§7 time-series diagnostics",
    "stat_tests": "§7 statistical inference (rank tests / moments)",
}


def _test_refs() -> dict[str, set[str]]:
    """query name -> test files that mention it (word-boundary match)."""
    tests_dir = os.path.join(REPO, "tests")
    sources = {}
    for fn in sorted(os.listdir(tests_dir)):
        if fn.endswith(".py"):
            with open(os.path.join(tests_dir, fn)) as f:
                sources[fn] = f.read()
    refs: dict[str, set[str]] = {}
    return refs, sources  # filled lazily in build_rows


def build_rows() -> list[dict]:
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans import collect_all
    import bench

    queries, oracles = collect_all()
    _, sources = _test_refs()
    bench_names = set(bench.HEADLINE) | set(bench.STREAMING)

    rows = []
    for name in sorted(queries):
        mod = queries[name].__module__.rsplit(".", 1)[-1]
        pat = re.compile(rf"\b{re.escape(name)}\b")
        tests = sorted(fn for fn, src in sources.items() if pat.search(src))
        # test_empty_inputs parametrizes over the ENTIRE registry (round
        # 7: no exemptions), so every query is covered even though its
        # name never appears literally in that file
        if "test_empty_inputs.py" not in tests:
            tests = sorted(tests + ["test_empty_inputs.py"])
        rows.append(
            {
                "query": name,
                "section": SECTION_BY_QUERY.get(name, SECTION_BY_MODULE[mod]),
                "module": f"plans/{mod}.py",
                "oracle": "value" if name in oracles else "rows-only",
                "bench": "yes" if name in bench_names else "",
                "tests": ", ".join(t.removeprefix("test_").removesuffix(".py") for t in tests),
            }
        )
    return rows


def render(rows: list[dict]) -> str:
    n_value = sum(1 for r in rows if r["oracle"] == "value")
    lines = [
        "# Registry coverage map (generated — do not edit)",
        "",
        f"Generated by `tools/coverage_table.py`; {len(rows)} queries, "
        f"{n_value} with full DuckDB value oracles, "
        f"{len(rows) - n_value} rows-only. Kept in sync with "
        "`plans.collect_all()` by `tests/test_coverage_sync.py`.",
        "",
        "| Query | SURVEY section | Module | Oracle | Bench | Tests (tests/test_*.py) |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| `{r['query']}` | {r['section']} | `{r['module']}` "
            f"| {r['oracle']} | {r['bench']} | {r['tests']} |"
        )
    return "\n".join(lines) + "\n"


def main() -> None:
    content = render(build_rows())
    if "--check" in sys.argv:
        on_disk = open(OUT).read() if os.path.exists(OUT) else ""
        if on_disk != content:
            print("COVERAGE.md out of sync — run: python tools/coverage_table.py")
            sys.exit(1)
        print("COVERAGE.md in sync")
        return
    with open(OUT, "w") as f:
        f.write(content)
    print(f"wrote {OUT} ({content.count(chr(10))} lines)")


if __name__ == "__main__":
    main()
