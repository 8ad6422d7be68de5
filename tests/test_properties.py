"""Property-based tests (hypothesis) for the reference's quirky parameter
semantics — the §5 behavioral contract on arbitrary adversarial inputs:

- limit accepted only in (0, 5) exclusive, else default 5; non-numeric ->
  default (order.js:70-77)
- offset floored at 0, clamped to the row count; non-numeric -> 0
  (order.js:79-84, 263-266)
- trim keeps output <= 30 chars with a visible marker (order.js:409-414)
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.pagination import (
    clamp_page_params,
)

anything = st.one_of(
    st.integers(min_value=-(10**9), max_value=10**9),
    st.text(max_size=12),
    st.none(),
)


@given(limit=anything, offset=anything, total=st.integers(0, 10**6))
@settings(max_examples=300, deadline=None)
def test_clamp_matches_reference_semantics(limit, offset, total):
    lim, off = clamp_page_params(limit, offset, total)

    # reference model, transcribed from order.js
    try:
        want_lim = int(limit)
    except (TypeError, ValueError):
        want_lim = 5
    if not (0 < want_lim < 5):
        want_lim = 5
    try:
        want_off = int(offset)
    except (TypeError, ValueError):
        want_off = 0
    want_off = min(max(want_off, 0), total)

    assert (lim, off) == (want_lim, want_off)
    assert 0 < lim <= 5
    assert 0 <= off <= total


@settings(max_examples=5, deadline=None)
@given(descs=st.lists(st.text(min_size=0, max_size=80), min_size=1, max_size=40))
def test_trim_bounds_hold_for_arbitrary_text(spark, descs):
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.functions.scalars import (
        trim_description,
    )

    df = spark.createDataFrame([(d,) for d in descs], "description string")
    rows = df.select(
        "description", trim_description("description").alias("t")
    ).collect()
    for r in rows:
        assert len(r.t) <= 30
        if len(r.description) > 30:
            assert r.t.endswith("(TRIM)") and r.t[:-6] == r.description[:24]
        else:
            assert r.t == r.description


# --- pigeonhole blocking completeness (fuzzy_name_pairs) ---------------------
def _segments(s: str, k: int = 4):
    """Pure-Python mirror of plans/text._name_segments_spark: segment i is
    s[floor(i*len/k) : floor((i+1)*len/k)] (the Spark/DuckDB expressions
    use the same truncating division on 1-based substring args)."""
    n = len(s)
    return [
        (i, s[(i * n) // k : ((i + 1) * n) // k]) for i in range(k)
    ]


@given(
    s=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=4, max_size=40),
    data=st.data(),
)
@settings(max_examples=300, deadline=None)
def test_pigeonhole_blocking_catches_all_substitution_pairs(s, data):
    """Recall guarantee of the 4-segment block: ANY string within <= 3
    substitutions of s shares at least one aligned segment, so the
    (seg_idx, seg_val) join generates every qualifying candidate pair."""
    n_edits = data.draw(st.integers(0, 3))
    positions = data.draw(
        st.lists(st.integers(0, len(s) - 1), min_size=n_edits, max_size=n_edits, unique=True)
    )
    t = list(s)
    for p in positions:
        t[p] = data.draw(st.characters(min_codepoint=32, max_codepoint=126))
    t = "".join(t)
    shared = set(_segments(s)) & set(_segments(t))
    assert shared, (s, t)
