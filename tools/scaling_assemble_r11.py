"""Round-11 scaling sweep driver: run the two small-SF bench legs fresh
(sf0.001, sf0.01) and reuse the ROUND'S COMMITTED quiet sf0.1 record
(BENCH_LOCAL_r11.json — same code, measured hours earlier at load1
0.39) as the third leg, instead of re-paying the 40-minute sf0.1 leg
inside the sweep. Emits the same markdown table as tools/scaling_sweep
and restores BENCH_LOCAL_latest.json to the committed round record
afterwards (each bench leg overwrites it).

Usage: python tools/scaling_assemble_r11.py > SCALING_r11.md
"""

from __future__ import annotations

import json
import os
import shutil
import sys
from datetime import date

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_sweep import run_bench  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    records = {}
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        tag = sf_dir.rsplit("/", 1)[-1]
        records[tag] = run_bench(sf_dir)
        with open(os.path.join(REPO, f"SCALING_raw_{tag}.json"), "w") as f:
            json.dump(records[tag], f, indent=1)
        print(f"<!-- {tag}: total {records[tag]['value']} s -->", file=sys.stderr)
    with open(os.path.join(REPO, "BENCH_LOCAL_r11.json")) as f:
        records["sf0.1"] = json.load(f)
    with open(os.path.join(REPO, "SCALING_raw_sf0.1.json"), "w") as f:
        json.dump(records["sf0.1"], f, indent=1)
    shutil.copyfile(
        os.path.join(REPO, "BENCH_LOCAL_r11.json"),
        os.path.join(REPO, "BENCH_LOCAL_latest.json"),
    )

    tags = list(records)
    queries = records[tags[-1]]["queries"]
    lines = [
        f"# SCALING ({date.today().isoformat()}) — round 11",
        "",
        "`bench.py` (median-of-3 per query, fresh subprocess per <= 9",
        "queries, `local[32]`) at each scale factor; the sf0.1 column is",
        "the round's committed quiet record (BENCH_LOCAL_r11.json, same",
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
