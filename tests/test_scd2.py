"""SCD Type-2 snapshot semantics (SURVEY §2.1 S6): batch reconstruction,
incremental apply, and their equivalence (sequential applies == one-shot)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mta_rtf_dbt_spark.operators.scd2 import scd2_apply_batch, scd2_from_events


def _ts(h):
    return dt.datetime(2024, 1, 1, h)


def _events(spark, rows):
    return spark.createDataFrame(
        [(k, i, _ts(h), v) for i, (k, h, v) in enumerate(rows)],
        "user_id long, event_id long, ts timestamp, value double",
    )


def test_scd2_from_events_versions(spark):
    # key 1: a -> a (dup, no version) -> b; key 2: single value
    e = _events(spark, [(1, 1, 1.0), (1, 2, 1.0), (1, 3, 2.0), (2, 1, 9.0)])
    hist = scd2_from_events(e, ["user_id"], ["ts", "event_id"], "value")
    rows = {(r.user_id, r.value): (r.valid_from, r.valid_to, r.is_current) for r in hist.collect()}
    assert rows == {
        (1, 1.0): (_ts(1), _ts(3), False),
        (1, 2.0): (_ts(3), None, True),
        (2, 9.0): (_ts(1), None, True),
    }


def test_scd2_apply_batch_branches(spark):
    e = _events(spark, [(1, 1, 1.0), (2, 1, 9.0)])
    hist = scd2_from_events(e, ["user_id"], ["ts", "event_id"], "value")
    # batch: key 1 changes, key 2 unchanged (no spurious version), key 3 new;
    # key 1 has two changes in-batch -> only the latest lands
    batch = _events(spark, [(1, 4, 5.0), (1, 5, 6.0), (2, 4, 9.0), (3, 4, 7.0)])
    out = scd2_apply_batch(hist, batch, ["user_id"], "ts", "value")
    rows = {(r.user_id, r.value): (r.valid_from, r.valid_to, r.is_current) for r in out.collect()}
    assert rows == {
        (1, 1.0): (_ts(1), _ts(5), False),
        (1, 6.0): (_ts(5), None, True),
        (2, 9.0): (_ts(1), None, True),
        (3, 7.0): (_ts(4), None, True),
    }


def test_scd2_incremental_matches_reconstruction(spark):
    """Applying day-batches sequentially == one-shot scd2_from_events, modulo
    in-batch intermediate versions (apply_batch keeps only each batch's latest
    change, like a dbt snapshot run sees only the source's end state)."""
    all_rows = [
        (1, 1, 1.0), (1, 2, 2.0), (2, 2, 5.0),   # batch A (key 1 ends at 2.0)
        (1, 4, 2.0), (2, 5, 6.0),                 # batch B (key 1 unchanged)
        (1, 7, 3.0), (3, 8, 9.0),                 # batch C
    ]
    batches = [all_rows[0:3], all_rows[3:5], all_rows[5:7]]
    # snapshot-visible stream: per batch, only each key's latest row
    def latest_per_key(b):
        latest = {}
        for k, h, v in b:
            latest[k] = (k, h, v)
        return list(latest.values())

    visible = [r for b in batches for r in latest_per_key(b)]
    oneshot = scd2_from_events(
        _events(spark, visible), ["user_id"], ["ts", "event_id"], "value"
    ).select("user_id", "value", "valid_from", "valid_to", "is_current")

    hist = scd2_from_events(
        _events(spark, latest_per_key(batches[0])), ["user_id"], ["ts", "event_id"], "value"
    ).select("user_id", "value", "valid_from", "valid_to", "is_current")
    for b in batches[1:]:
        hist = scd2_apply_batch(hist, _events(spark, b), ["user_id"], "ts", "value")

    a = {tuple(r) for r in oneshot.collect()}
    b = {tuple(r) for r in hist.collect()}
    assert a == b


def test_scd2_apply_plan_broadcasts_batch(spark):
    e = _events(spark, [(1, 1, 1.0)])
    hist = scd2_from_events(e, ["user_id"], ["ts", "event_id"], "value")
    out = scd2_apply_batch(hist, _events(spark, [(1, 2, 2.0)]), ["user_id"], "ts", "value")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_scd2_invariants_random(spark):
    """Seeded random event stream: per key, exactly one current version,
    intervals chain head-to-tail (valid_to == next valid_from), and the
    first version starts at the key's earliest event."""
    import random

    rng = random.Random(42)
    rows = [(rng.randrange(8), i, float(rng.randrange(4))) for i in range(300)]
    df = spark.createDataFrame(
        [(k, i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), v) for k, i, v in rows],
        "user_id long, event_id long, ts timestamp, value double",
    )
    hist = scd2_from_events(df, ["user_id"], ["ts", "event_id"], "value").collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r.user_id, []).append(r)
    firsts = {}
    for k, i, v in rows:
        ts = dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i)
        firsts[k] = min(firsts.get(k, ts), ts)
    for k, versions in by_key.items():
        versions.sort(key=lambda r: r.valid_from)
        assert sum(1 for r in versions if r.is_current) == 1
        assert versions[0].valid_from == firsts[k]
        for a, b in zip(versions, versions[1:]):
            assert a.valid_to == b.valid_from  # contiguous, no gaps/overlaps
            assert a.value != b.value          # every version is a real change
        assert versions[-1].valid_to is None


def test_scd2_full_snapshot_hard_deletes(spark):
    """invalidate_hard_deletes: a current key absent from a full snapshot
    closes at snapshot_ts; present keys behave as in incremental mode."""
    from mta_rtf_dbt_spark.operators.scd2 import scd2_apply_batch as apply

    e = _events(spark, [(1, 1, 1.0), (2, 1, 9.0)])
    hist = scd2_from_events(e, ["user_id"], ["ts", "event_id"], "value")
    batch = _events(spark, [(1, 4, 5.0)])  # key 2 missing -> hard-deleted
    out = apply(
        hist, batch, ["user_id"], "ts", "value",
        full_snapshot=True, snapshot_ts=_ts(6),
    )
    rows = {(r.user_id, r.value): (r.valid_from, r.valid_to, r.is_current) for r in out.collect()}
    assert rows == {
        (1, 1.0): (_ts(1), _ts(4), False),
        (1, 5.0): (_ts(4), None, True),
        (2, 9.0): (_ts(1), _ts(6), False),  # closed, no successor
    }
    import pytest

    with pytest.raises(ValueError):
        apply(hist, batch, ["user_id"], "ts", "value", full_snapshot=True)
