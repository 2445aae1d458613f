"""Validators must catch planted violations (a green report over clean data
proves nothing by itself)."""

from __future__ import annotations


def test_validators_catch_planted_violations(spark):
    from mta_rtf_dbt_spark.operators.quality import (
        dq_report,
        expect_accepted_values,
        expect_fk,
        expect_not_null,
        expect_unique,
    )

    parent = spark.createDataFrame([(1,), (2,)], "id long")
    child = spark.createDataFrame(
        [(1, "a"), (1, "a"), (3, None), (2, "zz")],
        "pid long, status string",
    )
    checks = {
        "dup": expect_unique(child, ["pid", "status"]),
        "null": expect_not_null(child, ["status"]),
        "fk": expect_fk(child, "pid", parent, "id"),
        "domain": expect_accepted_values(child, "status", ["a", "b"]),
    }
    got = {r.check_name: r.n_violations for r in dq_report(checks).collect()}
    assert got == {
        "dup": 1,  # (1,'a') twice -> one violating key
        "null": 1,  # (3, None)
        "fk": 1,  # pid=3 has no parent
        "domain": 2,  # None and 'zz'
    }


def test_mta_dq_rules_fire_on_planted_violations(spark):
    """Each schema-test rule must actually detect its violation class —
    feed deliberately corrupted frames and assert nonzero counts."""
    import pyspark.sql.functions as F

    from mta_rtf_dbt_spark.plans.mta_driver import FIX_DIR, _models, _src, mta_dq_frame

    m = _models(spark)
    src = _src(spark)
    fts, trips, delays = m["fact_trips_stops"], m["fact_trips"], m["fact_delays"]
    tu = src["trip_updates"]
    stu = src["trip_updates__trip_update__stop_time_update"]

    # healthy inputs: every rule is zero
    clean = {r.rule: r.n_violations for r in mta_dq_frame(fts, trips, delays, tu, stu).collect()}
    assert set(clean.values()) == {0} and len(clean) == 6

    bad_fts = fts.unionAll(fts.limit(1)).withColumn(  # duplicate one grain row
        "trip_uid",
        F.when(F.monotonically_increasing_id() == 0, F.lit(None)).otherwise(
            F.col("trip_uid")
        ),
    )
    bad_trips = trips.withColumn(
        "first_stop_sequence", F.col("last_stop_sequence") + 1
    ).unionAll(trips.limit(1)).unionAll(trips.limit(1))  # dup trip_uid + bad order
    bad_delays = delays.withColumn("feed", F.lit("alerts"))
    bad_stu = stu.withColumn("_dlt_parent_id", F.concat(F.col("_dlt_parent_id"), F.lit("_x")))
    got = {
        r.rule: r.n_violations
        for r in mta_dq_frame(bad_fts, bad_trips, bad_delays, tu, bad_stu).collect()
    }
    assert got["grain_fts_unique"] >= 1
    assert got["fts_trip_uid_not_null"] >= 1
    assert got["grain_trips_unique"] >= 1
    assert got["trips_seq_ordered"] >= 1
    assert got["delays_feed_contract"] >= 1
    assert got["stu_parent_fk"] >= 1
