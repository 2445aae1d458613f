"""Scale-operator tests: bucketed joins must be exchange-free, salted
aggregation/join must match their unsalted equivalents exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    return str(tmp_path_factory.mktemp("warehouse"))


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_exchange_free(spark, tmp_path_factory):
    from mta_rtf_dbt_spark.operators.scale import write_bucketed
    from mta_rtf_dbt_spark.sources.registry import load

    orders = load(spark, SF, "orders")
    lineitem = load(spark, SF, "lineitem")
    write_bucketed(orders.select("o_orderkey", "o_orderstatus"), "b_orders", ["o_orderkey"], 8)
    write_bucketed(
        lineitem.select("l_orderkey", "l_extendedprice"), "b_lineitem", ["l_orderkey"], 8
    )
    try:
        # bucketed scans only kick in with AQE's initial plan; disable
        # auto-broadcast so the join strategy under test is the shuffle path
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = _physical_plan(joined)
        assert "Exchange" not in plan, plan
        # and it still returns the right rows
        expected = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_agg_matches_plain(spark):
    from mta_rtf_dbt_spark.operators.scale import salted_agg
    from mta_rtf_dbt_spark.sources.registry import load

    e = load(spark, SF, "events")
    salted = salted_agg(
        e,
        ["event_type"],
        {
            "n": ("event_id", "count"),
            "vmax": ("value", "max"),
            "vmin": ("value", "min"),
        },
        salt_buckets=8,
    )
    plain = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),  # 'count' is COUNT(*) (r4 ADVICE)
        F.max("value").alias("vmax"),
        F.min("value").alias("vmin"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_agg_rejects_non_algebraic(spark):
    from mta_rtf_dbt_spark.operators.scale import salted_agg
    from mta_rtf_dbt_spark.sources.registry import load

    with pytest.raises(ValueError):
        salted_agg(
            load(spark, SF, "events"),
            ["event_type"],
            {"bad": ("value", "avg")},
        )


def test_replicated_skew_join_matches_plain(spark):
    from mta_rtf_dbt_spark.operators.scale import replicated_skew_join
    from mta_rtf_dbt_spark.sources.registry import load

    lineitem = load(spark, SF, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = load(spark, SF, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    salted = replicated_skew_join(lineitem, orders, "l_orderkey", salt_buckets=4)
    plain = lineitem.join(orders, "l_orderkey")
    assert salted.count() == plain.count()
    s = salted.groupBy("l_orderkey").count()
    p = plain.groupBy("l_orderkey").count()
    assert sorted(map(tuple, s.collect())) == sorted(map(tuple, p.collect()))


def test_skew_report_flags_planted_hot_key(spark):
    from mta_rtf_dbt_spark.operators.scale import skew_report

    # 1000 rows on key 7, one row each on 50 cold keys
    rows = [(7,)] * 1000 + [(k,) for k in range(100, 150)]
    df = spark.createDataFrame(rows, "k long")
    rep = {r.k: (r.cnt, r.share_ppm, r.salt_factor) for r in skew_report(df, "k").collect()}
    total = 1050
    target = max(total // 32, 1)
    assert rep[7][0] == 1000
    assert rep[7][1] == 1000 * 1_000_000 // total
    assert rep[7][2] == (1000 + target - 1) // target  # needs many reducers
    cold = [v for k, v in rep.items() if k != 7]
    assert all(sf == 1 for _, _, sf in cold)  # cold keys: no salting needed
