"""As-of join semantics: tie visibility, duplicate-time tiebreaks, NULL fill,
and the linear (no range-join) physical plan."""

from __future__ import annotations

from datetime import datetime

from mta_rtf_dbt_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T10:00:00")),  # before any right row -> nulls
            (2, 10, _ts("2024-01-02T00:00:00")),  # exactly at r1 -> r1 visible
            (3, 10, _ts("2024-01-05T00:00:00")),  # after r1, r2a, r2b -> max tiebreak of dup time
            (4, 20, _ts("2024-01-04T00:00:00")),  # other key
        ],
        "event_id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-02T00:00:00"), 1.0),   # r1
            (201, 10, _ts("2024-01-03T00:00:00"), 2.0),   # r2a (dup time, lower id)
            (202, 10, _ts("2024-01-03T00:00:00"), 3.0),   # r2b (dup time, higher id wins)
            (300, 20, _ts("2024-01-01T00:00:00"), 9.0),
        ],
        "rid long, k long, rts timestamp, payload double",
    )
    out = {
        r.event_id: (r.rid, r.payload)
        for r in asof_join(
            left, right, on="k", left_time="ts", right_time="rts",
            right_cols=["rid", "payload"], tiebreak="rid",
        ).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (100, 1.0)
    assert out[3] == (202, 3.0)
    assert out[4] == (300, 9.0)


def test_asof_plan_is_linear(spark):
    """The plan must be union + one window sort — never a join node (the
    range-join formulation explodes at scale)."""
    left = spark.range(10).selectExpr("id AS k", "timestamp('2024-01-01') AS ts", "id AS event_id")
    right = spark.range(10).selectExpr(
        "id AS k", "timestamp('2023-12-31') AS rts", "id AS rid"
    )
    out = asof_join(left, right, "k", "ts", "rts", ["rid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan
