"""Source registry — the Spark analogue of dbt's ``source()`` +
``mta_sources.yml`` declaration layer (S1; reference mta_sources.yml:3-178).

Two families of sources:

- **Generic testdata** (TPC-H-ish; TESTDATA.md): parquet files under an
  ``sf_dir``; loaded lazily and registered as temp views so Spark SQL and the
  DataFrame API share one catalog namespace, mirroring how every dbt model
  resolved ``source('mta', t)`` to a warehouse relation.
- **MTA-shaped fixtures** (FIXTURES.md): generated deterministically by
  :mod:`mta_rtf_dbt_spark.sources.fixtures`, same registry mechanics.

Scale posture: a registered source is just ``spark.read.parquet(path)`` — on a
cluster the same registry points at partitioned directories and Catalyst gets
partition pruning + predicate pushdown for free; nothing here materializes.
"""

from __future__ import annotations

import os
import re
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimension tables a planner should always be willing to broadcast.
BROADCAST_DIMS = {"region", "nation", "supplier", "part", "customer"}


@lru_cache(maxsize=256)
def _nanos_timestamp_cols(path: str) -> tuple[str, ...]:
    """Parquet TIMESTAMP(NANOS) columns — Spark can't map them to
    TimestampType natively (PARQUET_TYPE_ILLEGAL), so the loader reads them as
    long nanos and converts. Footer-only driver-side peek, cached."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return tuple(f.name for f in schema if str(f.type) == "timestamp[ns]")
    except Exception:
        return ()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one source table (no action triggered — stays a lazy scan).

    TIMESTAMP(NANOS) columns (e.g. ``events.ts``) are read as long nanos via
    ``spark.sql.legacy.parquet.nanosAsLong`` and truncated to micros with
    exact integer division (``div`` — nanos exceed 2^53, float math would
    corrupt them), matching DuckDB's nanos->micros truncation.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    ns_cols = _nanos_timestamp_cols(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    # Belt-and-braces vs spark.sql.parquet.inferTimestampNTZ.enabled drift:
    # zoneless parquet timestamps must surface as TimestampType (session tz is
    # pinned UTC so the cast is value-preserving); unix_micros()/withWatermark()
    # reject TIMESTAMP_NTZ outright.
    from pyspark.sql.types import TimestampNTZType

    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition when the scan produced fewer partitions than
    cores. Parquet can't split below row-group granularity, so a small/
    single-row-group file pins every downstream narrow transform to one task
    — fatal for CPU-heavy per-row operators (shingling, hashing, vector
    math). At 100 TB inputs arrive with thousands of row groups and this is a
    no-op; the repartition only fires when parallelism is actually missing.

    The ``.rdd`` partition probe is only safe on shuffle-free plans: under
    AQE, ``df.rdd`` on a plan containing exchanges MATERIALIZES the upstream
    query stages — measured r4 at ~5 s of hidden execution per curation-entry
    build. A plan that already shuffles (or reads a cache) has >=
    ``spark.sql.shuffle.partitions`` partitions anyway, so the probe is both
    dangerous and pointless there: detect exchanges via ``executedPlan``
    (building the AdaptiveSparkPlan wrapper is driver-side planning only —
    EnsureRequirements has inserted the Exchange nodes by then, unlike
    ``sparkPlan`` which prints BEFORE they exist; no jobs run until an
    action) and return the frame unchanged.

    Width is sized by the optimizer's byte estimate (r6): repartitioning a
    500 KB scan to 32 partitions makes EVERY downstream stage of every
    consumer 32-64 tasks wide, and at bench scale task scheduling then
    dominates wall-clock (measured: the curation funnel spent ~0.9 s of
    3.3 s purely on task dispatch). Target = clamp(bytes/1 MB, 8, cores):
    kilobyte inputs get 8-way parallelism (plenty for their row counts),
    anything over ~32 MB gets full width, and at 100 TB the estimate
    saturates the cap so the policy is exactly the old one. The stats call
    is on the LOGICAL plan — driver-side estimation, no jobs."""
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
        # Shuffle exchanges only: r4 ADVICE — the bare substring 'Exchange'
        # also matches BroadcastExchange, denying the parallelism rescue to a
        # single-partition scan that merely broadcasts a dim. \bExchange\b
        # matches the shuffle node ('Exchange hashpartitioning...') but not
        # 'BroadcastExchange' (no word boundary inside the token).
        if re.search(r"\bExchange\b", plan) or "InMemoryTableScan" in plan:
            return df
    except Exception:
        pass  # fall through to the probe on any introspection failure
    cores = df.sparkSession.sparkContext.defaultParallelism
    target = min_partitions
    if target is None:
        target = cores
        try:
            nbytes = int(
                str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
            )
            target = max(8, min(cores, nbytes // (1 << 20)))
        except Exception:
            pass  # estimation unavailable — keep the full-width default
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


_SCOPED_PERSISTS: dict[str, DataFrame] = {}


def scoped_persist(df: DataFrame, scope: str, eager: bool = False) -> DataFrame:
    """Persist ``df``, releasing whatever an earlier invocation persisted
    under the same scope key.

    Operators that persist an intermediate (signature tables, shingle
    relations feeding both sides of a self-join) get called repeatedly in one
    session by the bench harness and the driver gate; a bare ``.persist()``
    per call pins executor storage without bound and measurably degrades
    later runs. One live cache per (operator, intermediate) is the intent —
    this makes that lifecycle explicit.

    ``eager=True`` materializes the cache immediately (one count). Use it
    when the persisted relation feeds MULTIPLE sibling stages of one
    downstream action: Spark schedules independent stages of a job
    concurrently, and every stage that reaches a not-yet-materialized
    InMemoryRelation computes the underlying subtree itself — the cache
    dedupes storage, not concurrent work. Serializing the materialization
    is exactly the staging write a production pipeline does between passes
    (measured: the one-action curation entry dropped ~40% at sf0.1)."""
    old = _SCOPED_PERSISTS.pop(scope, None)
    if old is not None:
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass
    df = df.persist()
    _SCOPED_PERSISTS[scope] = df
    if eager:
        df.count()
    return df


def register_all(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, tables: list[str] | None = None
) -> dict[str, DataFrame]:
    """Register every source as a temp view (dbt ``source()`` equivalent)."""
    out: dict[str, DataFrame] = {}
    for name in tables or TESTDATA_TABLES:
        df = load(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
