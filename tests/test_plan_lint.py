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
"""

import io
import re
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as E

_QUERIES = sorted(E.queries())


def _formatted_plan(spark, sf_dir, name):
    df = E.queries()[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


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
    plan = _formatted_plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    for spec in _window_partition_specs(plan):
        assert spec.strip(), f"{name}: Window with empty partition spec"
