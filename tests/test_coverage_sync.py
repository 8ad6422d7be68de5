"""COVERAGE.md is generated from the live registry and must never drift
from it (VERDICT r3 item 7): every `queries()` entry appears exactly once,
every explicit §2 tag points at a real query, and the committed file
matches a fresh regeneration byte-for-byte. No SparkSession needed —
the registry and the generator are plain Python.
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from coverage_table import OUT, SECTION_BY_QUERY, build_rows, render

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.plans import collect_all


def test_rows_cover_registry_exactly():
    queries, oracles = collect_all()
    rows = build_rows()
    assert [r["query"] for r in rows] == sorted(queries)
    # oracle kinds agree with the registry
    for r in rows:
        assert r["oracle"] == ("value" if r["query"] in oracles else "rows-only")


def test_explicit_section_tags_point_at_real_queries():
    queries, _ = collect_all()
    stale = set(SECTION_BY_QUERY) - set(queries)
    assert not stale, f"SECTION_BY_QUERY has tags for unknown queries: {stale}"


def test_every_query_is_checked_somewhere():
    """A registered query must be verifiable: a value oracle, or failing
    that at least one test file referencing it by name."""
    for r in build_rows():
        assert r["oracle"] == "value" or r["tests"], (
            f"{r['query']} has neither a value oracle nor a test reference"
        )


def test_coverage_md_in_sync():
    with open(OUT) as f:
        on_disk = f.read()
    assert on_disk == render(build_rows()), (
        "COVERAGE.md is stale - run: python tools/coverage_table.py"
    )
