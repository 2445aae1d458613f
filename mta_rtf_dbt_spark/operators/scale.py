"""Scale-posture operators: bucketed co-located joins and skew salting.

These are the two knobs the 100 TB deployment turns that small-scale tests
never force (SURVEY.md §7.7c):

- **Bucketing**: the J1 fact-fact join (trip_updates ⋈ stop_time_updates on
  tu_id; fact_trips_stops.sql:120) shuffles both sides every run. Writing both
  facts bucketed on the join key makes the join exchange-free forever after —
  the classic write-once/join-many trade.
- **Salting**: `route_id`-grained aggregations are skewed (a few subway routes
  dominate; SURVEY.md §4 "Skew handling"). AQE's skew-join handles joins, but
  a hot *aggregation* key still funnels one partition; two-stage salted
  aggregation spreads it.

Both are pure composition of public DataFrame ops — no physical-plan hooks —
so Catalyst/AQE still owns strategy selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Aggregates that decompose into (partial, final) over the same column — the
# property two-stage salting needs.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 64,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) on the join key.

    Two tables bucketed on the same key with the same bucket count join
    without any Exchange (verified in tests/test_scale_ops.py by asserting
    the joined plan is shuffle-free). ``num_buckets`` sizes for the target
    deployment: ~2-4x executor count so each bucket fits executor memory.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-stage aggregation that spreads a hot grouping key.

    ``aggs`` maps output column -> (input column, fn) with fn in
    sum/count/min/max. Stage 1 groups by (keys + salt) — hot keys split into
    ``salt_buckets`` partial groups computed on different cores; stage 2
    groups by keys alone over the tiny partial result.

    The salt must be deterministic per row but spread within a key:
    ``pmod(hash(salt_source), n)``; ``salt_source`` defaults to all non-key
    columns. (Plain ``groupBy`` already does map-side partial aggregation —
    salting matters when the *merge* of one key's partials is itself the
    bottleneck, i.e. extreme cardinality skew into few reducers.)
    """
    for fn_name in {a[1] for a in aggs.values()}:
        if fn_name not in _ALGEBRAIC:
            raise ValueError(f"{fn_name} is not algebraic-decomposable")
    src_cols = [salt_source] if salt_source else [c for c in df.columns if c not in keys]
    salt = F.pmod(F.hash(*[F.col(c) for c in src_cols]), F.lit(salt_buckets))
    stage1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[
            _ALGEBRAIC[fn][0](col).alias(f"__p_{out}")
            for out, (col, fn) in aggs.items()
        ]
    )
    return stage1.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[fn][1](f"__p_{out}").alias(out)
            for out, (_col, fn) in aggs.items()
        ]
    )


def replicated_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi join for when the dim is too big to broadcast but the
    fact's key distribution is hot: the fact side gets a deterministic salt,
    the dim side is exploded ``salt_buckets`` times, and the join key becomes
    (key, salt) — hot keys land on ``salt_buckets`` reducers instead of one.

    Cost: dim scan amplified by ``salt_buckets`` — use only when AQE skew
    handling isn't available (e.g. a non-AQE deployment) or for the extreme
    single-key case.
    """
    fact_cols = [c for c in fact.columns]
    salt = F.pmod(F.hash(*[F.col(c) for c in fact_cols]), F.lit(salt_buckets))
    f_salted = fact.withColumn("__salt", salt)
    d_rep = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = f_salted.join(d_rep, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def table_stats(spark: SparkSession, table: str, columns: list[str] | None = None) -> None:
    """Collect CBO statistics (row counts + column NDV/min/max) so Catalyst's
    cost-based join reordering has real cardinalities — the 100 TB equivalent
    of the reference relying on BigQuery's automatic stats."""
    cols = f" FOR COLUMNS {', '.join(columns)}" if columns else ""
    spark.sql(f"ANALYZE TABLE {table} COMPUTE STATISTICS{cols}")
