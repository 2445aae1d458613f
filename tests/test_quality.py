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
