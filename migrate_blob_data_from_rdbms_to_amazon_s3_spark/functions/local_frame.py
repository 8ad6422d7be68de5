"""Driver-local rows → DataFrame through ONE Arrow batch.

``SparkSession.createDataFrame(list_of_rows)`` ships the rows as a
pickled Python RDD parallelized into ``defaultParallelism`` slices, and
EVERY consumer of the frame pays a Python-worker round trip per slice
to deserialize them (guide §4: each JVM↔Python crossing has fixed
cost). Measured on local[32]: a 1-row meta table written with
``coalesce(1)`` costs ~5 s — 32 sequential worker round trips inside
the single coalesced task — vs ~0.2 s through one Arrow batch. On a
cluster the same slices become 32 scheduled tasks each paying the same
round trip, so this is not a local-only artifact.

``arrow_local_df`` converts once on the driver (pandas → Arrow, the
path ``spark.sql.execution.arrow.pyspark.enabled`` vectorizes) and
yields a single-partition scan. Use it for every SMALL driver-local
table on a query/bench path (meta rows, centroid tables, config
sweeps); bounded by the same driver-memory discipline as any collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _top_level_names(schema: str) -> list[str]:
    """Field names of a DDL schema string, splitting only at top-level
    commas (so ``array<double>`` / ``map<string,int>`` stay intact)."""
    names, depth, cur = [], 0, []
    for ch in schema:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            names.append("".join(cur))
            cur = []
            continue
        cur.append(ch)
    names.append("".join(cur))
    return [n.strip().split()[0].strip("`") for n in names if n.strip()]


def arrow_local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Build a DataFrame from driver-local ``rows`` (tuples or dicts)
    under DDL string ``schema`` via one Arrow batch. Empty input keeps
    the typed-empty ``createDataFrame([], schema)`` path (nothing to
    ship, and Arrow needs at least the pandas dtypes)."""
    import pandas as pd

    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    names = _top_level_names(schema)
    if isinstance(rows[0], dict):
        data = [[r[n] for n in names] for r in rows]
    else:
        data = [list(r) for r in rows]
    pdf = pd.DataFrame(data, columns=names, dtype=object)
    return spark.createDataFrame(pdf, schema)
