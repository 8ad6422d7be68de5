"""Property tests for the incremental-migration merge-on-read view.

keep_latest's contract — for every key, exactly the row with the
lexicographically greatest (cursor, run_id) survives, and tombstone
visibility follows the LATEST row only — checked against a plain-Python
reference on hypothesis-generated CDC histories (duplicate cursors
across runs, re-emitted keys, interleaved tombstones)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.incremental_migration import (
    keep_latest,
)

# a CDC history: rows of (key, cursor, run_id, is_deleted). Several runs,
# small key space so collisions/re-emits are common.
history = st.lists(
    st.tuples(
        st.integers(0, 6),          # key
        st.integers(0, 20),         # cursor
        st.integers(0, 4),          # run_id
        st.booleans(),              # is_deleted
    ),
    min_size=1,
    max_size=60,
).filter(
    # the operator's input is pointer ROWS: within one run a key appears
    # at most once (each run dir is written by one pass)
    lambda rows: len({(k, r) for k, _, r, _ in rows}) == len(rows)
)


def _reference(rows):
    """Plain-Python keep-latest: max (cursor, run_id) per key."""
    best = {}
    for k, c, r, d in rows:
        if k not in best or (c, r) > (best[k][0], best[k][1]):
            best[k] = (c, r, d)
    return {k: v for k, v in best.items()}


@settings(max_examples=25, deadline=None)
@given(rows=history)
def test_keep_latest_matches_reference(spark, rows):
    df = spark.createDataFrame(
        [(f"k{k}", f"d{k}-{c}-{r}", c, r, d) for k, c, r, d in rows],
        "order_id string, description string, cursor long, run_id int, "
        "is_deleted boolean",
    )
    got = {
        r["order_id"]: (r["cursor"], r["run_id"], r["is_deleted"])
        for r in keep_latest(df).collect()
    }
    want = {f"k{k}": v for k, v in _reference(rows).items()}
    assert got == want
    # and the tombstone-visibility rule (read_current's filter): a key is
    # visible iff its LATEST row is not a tombstone
    visible = {
        r["order_id"]
        for r in keep_latest(df)
        .filter(~F.coalesce(F.col("is_deleted"), F.lit(False)))
        .collect()
    }
    assert visible == {k for k, (_, _, d) in want.items() if not d}
