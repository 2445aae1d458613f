"""Structural plan audit over EVERY registry entry — the properties that
decide whether a plan survives 100 TB, asserted mechanically:

1. no CartesianProduct (a non-broadcast cross join is an all-pairs shuffle;
   the labeled brute-force recall baseline and scalar-subquery idioms plan
   as BroadcastNestedLoopJoin, which is allowed — one side is tiny by
   construction);
2. no BatchEvalPython (row-at-a-time Python UDF in the plan; Arrow-batched
   paths show ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas and are
   allowed).

Plans are BUILT, not executed (executedPlan on the AdaptiveSparkPlan wrapper
is driver-side planning only), so this sweeps all entries in seconds.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _entries():
    import __spark_entry__ as e

    return sorted(e.queries().items())


@pytest.mark.parametrize("name,fn", _entries(), ids=[n for n, _ in _entries()])
def test_no_cartesian_no_python_rows(spark, name, fn):
    if name.startswith("stream_"):
        pytest.skip("streaming plans are validated in test_streaming")
    df = fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: non-broadcast cross join\n{plan}"
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF\n{plan}"
