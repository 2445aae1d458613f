"""Approximate/mergeable aggregates — the sketch toolkit a 100 TB pipeline
actually runs on.

At scale, exact distinct counts and exact percentiles force full shuffles of
the grouping keys; sketches give bounded-error answers from one map-side
pass plus a tiny merge, and — critically — sketches are **mergeable**, so
per-partition / per-day sketches roll up without touching raw data again
(the materialize-and-partition guidance in the reference's
docs/metrics_guide.md:385 composes with this: store a sketch column per
partition, merge on read).

- ``approx_distinct_by_group``  — HLL++ via ``approx_count_distinct``
- ``hll_partial_then_merge``    — Apache DataSketches HLL: per-shard
  ``hll_sketch_agg`` then ``hll_union_agg`` (the rollup pattern, Spark 4)
- ``approx_quantiles_by_group`` — GK/KLL-style ``percentile_approx``
- ``heavy_hitters_exact``       — support-s frequent items; exact form is
  oracle-checkable, and IS the verify step a count-min candidate pass feeds

Driver gate: approximate values are engine-specific → the approx entry is
rows-only; the error-bound guarantees are asserted in tests/test_sketches.py
against exact baselines. heavy_hitters is exact and fully oracle-checked.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mta_rtf_dbt_spark.session import pin_session
from mta_rtf_dbt_spark.sources.registry import load

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def q(name: str, sql: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            pin_session(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if sql is not None:
            ORACLE[name] = sql
        return wrapped

    return deco


def approx_distinct_by_group(
    df: DataFrame, keys: list[str], col: str, rsd: float = 0.02
) -> DataFrame:
    """HLL++ distinct estimate per group. rsd = target relative std dev;
    memory per group is O(1/rsd²) regardless of cardinality."""
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(col, rsd).alias("approx_distinct"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_partial_then_merge(
    df: DataFrame, shard_col: str, keys: list[str], col: str, lg_k: int = 12
) -> DataFrame:
    """The rollup pattern: build one DataSketches HLL per (shard, group),
    then merge shards per group with hll_union_agg — byte-identical result
    path to sketching each group directly, but the partial layer is what a
    daily-partitioned 100 TB table would persist."""
    partials = df.groupBy(shard_col, *keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("sk")
    )
    return partials.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sk"), F.lit(True))).alias(
            "merged_estimate"
        )
    )


def approx_quantiles_by_group(
    df: DataFrame, keys: list[str], col: str, probs: list[float], accuracy: int = 10000
) -> DataFrame:
    """percentile_approx: rank error <= n/accuracy per group, single pass,
    mergeable partials (vs the exact sort-based percentile's full shuffle)."""
    return df.groupBy(*keys).agg(
        F.percentile_approx(F.col(col), probs, accuracy).alias("approx_quantiles")
    )


def heavy_hitters_exact(
    df: DataFrame, keys: list[str], item_col: str, support: float = 0.01
) -> DataFrame:
    """Items appearing in > support fraction of rows, per the whole frame.
    One hash agg + a scalar-broadcast threshold — the exact verify pass that
    a count-min/SpaceSaving candidate stage feeds at scale (candidates
    shrink the second pass; exactness comes from this one)."""
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    counts = df.groupBy(*keys, item_col).agg(F.count(F.lit(1)).alias("item_count"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("item_count") > F.col("__total") * support)
        .select(
            *keys,
            item_col,
            "item_count",
            F.round(F.col("item_count") / F.col("__total"), 6).alias("support_frac"),
        )
    )


@q("a_approx_sketches")  # rows-only: estimator internals are engine-specific
def a_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type sketch panel: HLL++ distinct users, datasketches-HLL
    merged-shard distinct, p50/p95 value estimates. Error bounds are
    test-asserted vs exact baselines (test_sketches.py)."""
    e = load(spark, sf_dir, "events")
    base = approx_distinct_by_group(e, ["event_type"], "user_id", rsd=0.02)
    merged = hll_partial_then_merge(
        e.withColumn("__shard", (F.col("event_id") % 8).cast("int")),
        "__shard",
        ["event_type"],
        "user_id",
    )
    quant = approx_quantiles_by_group(e, ["event_type"], "value", [0.5, 0.95])
    return (
        base.join(merged, "event_type")
        .join(quant, "event_type")
        .select(
            "event_type",
            "n_rows",
            "approx_distinct",
            F.round("merged_estimate", 3).alias("merged_estimate"),
            F.round(F.col("approx_quantiles")[0], 6).alias("p50_approx"),
            F.round(F.col("approx_quantiles")[1], 6).alias("p95_approx"),
        )
    )


@q(
    "a_heavy_hitters",
    """
    WITH tot AS (SELECT COUNT(*) AS t FROM events)
    SELECT e.event_type, e.user_id, COUNT(*) AS item_count,
           ROUND(COUNT(*) * 1.0 / MAX(tot.t), 6) AS support_frac
    FROM events e, tot
    GROUP BY e.event_type, e.user_id
    HAVING COUNT(*) > MAX(tot.t) * 0.0005
    """,
)
def a_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters over (event_type, user_id) at 0.05% support —
    fully oracle-checked; the scale path puts a sketch candidate pass in
    front of this exact verify."""
    return heavy_hitters_exact(
        load(spark, sf_dir, "events"), ["event_type"], "user_id", support=0.0005
    )
