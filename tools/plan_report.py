"""Generate a per-query physical-plan audit over the whole registry.

For every `queries()` entry: counts of shuffle exchanges, broadcast
exchanges, windows, sort nodes, and TakeOrdered in the formatted plan
(codegen spans are omitted: under AQE they are assigned at execution,
not planning) — the numbers a plan review reads first.
Output: markdown table on stdout (committed as PLAN_AUDIT_r{N}.md).

Usage: python tools/plan_report.py [sf_dir]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark import get_spark
    import __spark_entry__ as E

    spark = get_spark(app_name="plan-report")
    rows = []
    for name, fn in sorted(E.queries().items()):
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # streaming drains etc. — note and move on
            rows.append((name, None, f"unplannable here: {type(e).__name__}"))
            continue

        def n(pat: str) -> int:
            return len(re.findall(rf"\(\d+\) {pat}", plan))

        rows.append(
            (
                name,
                {
                    # "(N) Exchange" is the shuffle node; broadcasts print
                    # as "(N) BroadcastExchange" and don't match it
                    "xchg": n("Exchange"),
                    "bcast": n("BroadcastExchange"),
                    "win": n("Window"),
                    "sort": n("Sort"),
                    "topk": n("TakeOrderedAndProject"),
                    "cartesian": n("CartesianProduct"),
                },
                "",
            )
        )

    print("| query | shuffles | broadcasts | windows | sorts | top-k |")
    print("|---|---|---|---|---|---|")
    for name, c, note in rows:
        if c is None:
            print(f"| {name} | — | — | — | — | {note} |")
            continue
        assert c["cartesian"] == 0, f"{name} has a cartesian product"
        print(
            f"| {name} | {c['xchg']} | {c['bcast']} | {c['win']} "
            f"| {c['sort']} | {c['topk']} |"
        )

    # LSH candidate-volume denominators (VERDICT r4 item 6): the measured
    # pair counts behind knn_join / hard_negative_mining scaling ratios.
    stats = E.queries()["lsh_candidate_stats"](spark, sf_dir).collect()[0]
    print()
    print(f"## LSH candidate volume at {sf_dir}")
    print()
    print(
        f"- vectors: {stats.n_vectors}; buckets: {stats.n_buckets} "
        f"(max fill {stats.max_bucket} / cap, capped: {stats.n_buckets_capped})"
    )
    print(
        f"- candidate pairs: {stats.n_candidate_pairs} "
        f"({stats.pairs_per_vector} directed pairs/vector — the per-vector "
        f"cosine-work multiplier; grows with bucket fill, bounded by cap)"
    )


if __name__ == "__main__":
    main()
