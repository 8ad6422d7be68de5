"""Round-12 scaling assembler: splice the sweep's fresh small-SF legs
(SCALING_raw_sf0.001/sf0.01.json, written by tools/scaling_sweep.py
earlier in the round) with the ROUND'S COMMITTED quiet sf0.1 record
(BENCH_LOCAL_r12.json — same code) instead of re-paying the sf0.1 leg
inside the sweep; restore BENCH_LOCAL_latest.json to the committed
round record (the r11 method, minus re-running legs that already ran).

Usage: python tools/scaling_assemble_r12.py > SCALING_r12.md
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import date

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    records = {}
    for tag in ("sf0.001", "sf0.01"):
        with open(os.path.join(REPO, f"SCALING_raw_{tag}.json")) as f:
            records[tag] = json.load(f)
    with open(os.path.join(REPO, "BENCH_LOCAL_r12.json")) as f:
        records["sf0.1"] = json.load(f)
    with open(os.path.join(REPO, "SCALING_raw_sf0.1.json"), "w") as f:
        json.dump(records["sf0.1"], f, indent=1)
    shutil.copyfile(
        os.path.join(REPO, "BENCH_LOCAL_r12.json"),
        os.path.join(REPO, "BENCH_LOCAL_latest.json"),
    )

    tags = list(records)
    queries = records[tags[-1]]["queries"]
    lines = [
        f"# SCALING ({date.today().isoformat()}) — round 12",
        "",
        "`bench.py` (median-of-3 per query, fresh subprocess per <= 9",
        "queries, `local[32]`) at each scale factor; the sf0.1 column is",
        "the round's committed quiet record (BENCH_LOCAL_r12.json, same",
        "code). A 10x data step growing time well under 10x means fixed",
        "per-job overhead still dominates (headroom); ratios near/above",
        "10x would flag a super-linear plan.",
        "",
        "Totals: "
        + ", ".join(f"{t} = {records[t]['value']:.1f} s" for t in tags)
        + ".",
        "",
        "| query | " + " | ".join(tags) + " | x (0.01->0.1) |",
        "|---|" + "---|" * (len(tags) + 1),
    ]
    rows = []
    for q in queries:
        vals = [records[t]["queries"].get(q) for t in tags]
        lo, hi = records[tags[-2]]["queries"].get(q), vals[-1]
        ratio = (hi / lo) if (lo and hi) else None
        rows.append((ratio or 0, q, vals, ratio))
    for _, q, vals, ratio in sorted(rows, reverse=True):
        cells = " | ".join("" if v is None else f"{v:.3f}" for v in vals)
        rx = "" if ratio is None else f"{ratio:.2f}"
        lines.append(f"| {q} | {cells} | {rx} |")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
