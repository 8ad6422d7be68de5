"""Generate SCALING_r{N}.md: run bench.py at several scale factors and
emit the per-query growth table (the does-cost-grow-with-data-or-overhead
question). Each bench invocation already isolates queries in fresh
subprocesses, so the sweep inherits the round-4 timing discipline.

Usage: python tools/scaling_sweep.py [sf_dir ...]   # default all three
Writes markdown to stdout; per-sf raw JSON lands next to it as
SCALING_raw_<sf>.json for auditability.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import date

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_SFS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]


def _wait_quiet(target: float = 0.7, max_wait_s: float = 300.0) -> None:
    """Let the previous leg's load decay before the next leg measures —
    bench.py's own gate only refuses above 2.0, and the r7 sweep legs
    each started at load1 1.5-1.9 from the prior leg's workers."""
    import time

    t0 = time.time()
    while os.getloadavg()[0] > target and time.time() - t0 < max_wait_s:
        time.sleep(15)


def run_bench(sf_dir: str) -> dict:
    _wait_quiet()
    env = os.environ.copy()
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        env=env,
        timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"bench at {sf_dir} rc={proc.returncode}")
    # bench.py's LAST stdout line is now a compact summary (sized for the
    # driver's tail capture); the full per-query record lands in
    # BENCH_LOCAL_latest.json — read that, freshly overwritten per run.
    with open(os.path.join(REPO, "BENCH_LOCAL_latest.json")) as f:
        return json.load(f)


def main() -> None:
    sf_dirs = sys.argv[1:] or DEFAULT_SFS
    records = {}
    for sf_dir in sf_dirs:
        tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        records[tag] = run_bench(sf_dir)
        with open(os.path.join(REPO, f"SCALING_raw_{tag}.json"), "w") as f:
            json.dump(records[tag], f, indent=1)
        print(f"<!-- {tag}: total {records[tag]['value']} s -->", file=sys.stderr)

    tags = list(records)
    queries = records[tags[-1]]["queries"]
    lines = [
        f"# SCALING ({date.today().isoformat()})",
        "",
        "`bench.py` (median-of-3 per query, fresh subprocess per <= 9",
        "queries, `local[32]`) at each scale factor. A 10x data step",
        "growing time well under 10x means fixed per-job overhead still",
        "dominates (headroom); ratios near/above 10x would flag a",
        "super-linear plan.",
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
