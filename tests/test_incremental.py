"""Incremental aggregate maintenance: state merge == full recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from mta_rtf_dbt_spark.operators.incremental import (
    agg_state,
    finalize_agg,
    merge_agg_states,
)


def _df(spark):
    rows = [(i, ["a", "b", "c"][i % 3], (i * 7) % 13) for i in range(60)]
    return spark.createDataFrame(rows, "id long, k string, v long")


def test_merge_matches_recompute(spark):
    df = _df(spark)
    full = finalize_agg(agg_state(df, ["k"], "v"), ["k"])
    # fold in 3 uneven slices
    state = agg_state(df.filter("id < 10"), ["k"], "v")
    state = merge_agg_states(state, agg_state(df.filter("id >= 10 and id < 13"), ["k"], "v"), ["k"])
    state = merge_agg_states(state, agg_state(df.filter("id >= 13"), ["k"], "v"), ["k"])
    inc = finalize_agg(state, ["k"])
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, inc.collect()))


def test_merge_new_key_in_batch(spark):
    df = _df(spark)
    state = agg_state(df, ["k"], "v")
    batch = spark.createDataFrame([(99, "z", 5)], "id long, k string, v long")
    out = finalize_agg(merge_agg_states(state, agg_state(batch, ["k"], "v"), ["k"]), ["k"])
    r = {row.k: (row.n, row.sum_v, row.min_v, row.max_v) for row in out.collect()}
    assert r["z"] == (1, 5, 5, 5)
    assert set(r) == {"a", "b", "c", "z"}


def test_null_values_do_not_poison_state(spark):
    batch = spark.createDataFrame(
        [(1, "a", None), (2, "a", 4)], "id long, k string, v long"
    )
    out = finalize_agg(agg_state(batch, ["k"], "v"), ["k"]).collect()[0]
    assert (out.n, out.sum_v, out.min_v, out.max_v, out.avg_v) == (1, 4, 4, 4, 4.0)


def test_hll_state_merge_matches_full(spark):
    """Sketches are the mergeable state for non-algebraic aggregates: HLL
    partial sketches unioned across arbitrary slices estimate the same
    cardinality as the one-pass sketch. (Not byte-identical — the
    DataSketches union gadget may re-target the HLL representation — but
    both estimates stay within the lgK=12 error bound of truth.)"""
    from pyspark.sql import functions as F

    df = spark.range(0, 5000).select((F.col("id") % 700).alias("v"))
    full = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v", F.lit(12))).alias("est")
    ).collect()[0].est
    parts = [
        df.filter(F.col("id") % 3 == i).agg(
            F.hll_sketch_agg("v", F.lit(12)).alias("sk")
        )
        for i in range(3)
    ]
    u = parts[0].unionByName(parts[1]).unionByName(parts[2])
    merged = u.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(True))).alias("est")
    ).collect()[0].est
    assert abs(full - 700) / 700 < 0.05
    assert abs(merged - 700) / 700 < 0.05
