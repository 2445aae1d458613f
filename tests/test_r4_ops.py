"""Planted-case tests for the round-4 operators: edit-distance blocking
dedup, hopping windows, and the salted skew techniques (SURVEY.md §5.4
discipline — each operator proves it finds exactly its plants)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_edit_distance_finds_planted_near_dups(spark):
    from mta_rtf_dbt_spark.operators.dedup import edit_distance_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumped over the lazy dog"),   # 2 edits in-prefix
        (3, "the quick brown cat naps under the warm sun"),    # same block, far
        (4, "zzz quick brown fox jumps over the lazy dog"),    # edit INSIDE block
        (5, "completely unrelated text about something else"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.doc_a, r.doc_b): r.edit_dist for r in edit_distance_pairs(docs).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    # doc 4 differs from doc 1 only in the first 3 chars — but that edit is
    # inside the 4-char block key, so blocking (by design) hides the pair
    assert (1, 4) not in pairs
    assert (1, 3) not in pairs  # same block, distance above threshold
    assert all(d <= 5 for d in pairs.values())


def test_hopping_windows_each_event_in_two_windows(spark):
    t0 = dt.datetime(2024, 1, 1, 10, 7, 30)
    rows = [(i, t0 + dt.timedelta(minutes=3 * i), f"u{i % 2}") for i in range(8)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id string")
    win = (
        df.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # 10-min windows hopping every 5: each event lands in exactly 10/5 = 2
    total = win.agg(F.sum("n")).first()[0]
    assert total == 2 * len(rows)
    for r in win.select("win.start", "win.end").collect():
        assert (r.end - r.start) == dt.timedelta(minutes=10)
        assert r.start.minute % 5 == 0 and r.start.second == 0  # epoch-aligned


def test_salted_agg_equals_plain_agg_under_skew(spark):
    from mta_rtf_dbt_spark.operators.scale import salted_agg

    # 90% of rows share one hot key
    rows = [(i, "hot" if i % 10 else f"cold{i}", i * 7 % 100) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, k string, v long")
    salted = salted_agg(
        df, ["k"], {"n": ("v", "count"), "s": ("v", "sum"), "mx": ("v", "max")}
    )
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx")
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_spread_skips_rdd_probe_on_shuffled_plans(spark):
    """Regression for the AQE .rdd hazard (SCALE.md r4): spread() must NOT
    touch .rdd on plans containing exchanges — it returns the frame
    unchanged (identity), since post-shuffle parallelism is already
    spark.sql.shuffle.partitions."""
    from mta_rtf_dbt_spark.sources.registry import spread

    shuffled = spark.range(1000).groupBy((F.col("id") % 10).alias("k")).count()
    assert spread(shuffled) is shuffled
    cached = spark.range(100).persist()
    try:
        cached.count()
        assert spread(cached) is cached
    finally:
        cached.unpersist()


def test_salted_agg_two_stage_plan(spark):
    """The salted aggregation must be exactly two exchanges: keys+salt then
    keys — no third shuffle, no broadcast."""
    from mta_rtf_dbt_spark.operators.scale import salted_agg

    df = spark.range(1000).select((F.col("id") % 7).alias("k"), F.col("id").alias("v"))
    plan = (
        salted_agg(df, ["k"], {"s": ("v", "sum")})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 2
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_replicated_skew_join_equals_plain_join(spark):
    from mta_rtf_dbt_spark.operators.scale import replicated_skew_join

    fact = spark.createDataFrame(
        [(i, 1 if i % 5 else (i % 3) + 2) for i in range(1000)], "row_id long, k long"
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(1, 6)], "k long, attr string")
    salted = replicated_skew_join(fact, dim, "k").select("row_id", "k", "attr")
    plain = fact.join(dim, "k").select("row_id", "k", "attr")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
